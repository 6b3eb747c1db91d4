// Native host runtime for the TPU raytracer.
//
// The reference implements its entire host pipeline in native (Rust) code;
// the TPU build keeps the device compute in XLA/Pallas and implements the
// host-side runtime pieces natively here:
//   * OBJ mesh parsing (counterpart of the tobj usage in ref scene/scene.rs)
//   * Woop unit-triangle transform precompute (scene/device.py geometry build)
//   * Morton-order spatial clustering (acceleration-structure build)
//   * PNG encoding via zlib (counterpart of ref output/file.rs)
//
// Exposed as a plain C ABI consumed through ctypes (utils/native.py).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// Woop transforms: A = inv([e1 e2 ñ]) (columns), b = -A v1, ñ = e1×e2.
// Outputs w4 as (n, 4, 3) row-major [A^T rows | b], nsq = |ñ|², ok flags.
// ---------------------------------------------------------------------------
int rt_woop_transforms(const double* v1, const double* v2, const double* v3,
                       int64_t n, float* w4, float* nsq, uint8_t* ok) {
  for (int64_t i = 0; i < n; ++i) {
    const double* a = v1 + 3 * i;
    const double* b = v2 + 3 * i;
    const double* c = v3 + 3 * i;
    double e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    double e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    double ng[3] = {e1[1] * e2[2] - e1[2] * e2[1], e1[2] * e2[0] - e1[0] * e2[2],
                    e1[0] * e2[1] - e1[1] * e2[0]};
    double n2 = ng[0] * ng[0] + ng[1] * ng[1] + ng[2] * ng[2];
    nsq[i] = static_cast<float>(n2);
    if (!(n2 > 0.0) || !std::isfinite(n2)) {
      ok[i] = 0;
      continue;
    }
    // M columns = e1, e2, ng ; det(M) = ñ·ñ = n2
    double M[3][3] = {{e1[0], e2[0], ng[0]}, {e1[1], e2[1], ng[1]}, {e1[2], e2[2], ng[2]}};
    double inv[3][3];
    double d = n2;
    inv[0][0] = (M[1][1] * M[2][2] - M[1][2] * M[2][1]) / d;
    inv[0][1] = (M[0][2] * M[2][1] - M[0][1] * M[2][2]) / d;
    inv[0][2] = (M[0][1] * M[1][2] - M[0][2] * M[1][1]) / d;
    inv[1][0] = (M[1][2] * M[2][0] - M[1][0] * M[2][2]) / d;
    inv[1][1] = (M[0][0] * M[2][2] - M[0][2] * M[2][0]) / d;
    inv[1][2] = (M[0][2] * M[1][0] - M[0][0] * M[1][2]) / d;
    inv[2][0] = (M[1][0] * M[2][1] - M[1][1] * M[2][0]) / d;
    inv[2][1] = (M[0][1] * M[2][0] - M[0][0] * M[2][1]) / d;
    inv[2][2] = (M[0][0] * M[1][1] - M[0][1] * M[1][0]) / d;
    float* out = w4 + 12 * i;
    // rows 0..2 = A^T (i.e. out[r*3+c] = inv[c][r]); row 3 = b = -A v1
    for (int r = 0; r < 3; ++r)
      for (int cidx = 0; cidx < 3; ++cidx)
        out[r * 3 + cidx] = static_cast<float>(inv[cidx][r]);
    for (int cidx = 0; cidx < 3; ++cidx)
      out[9 + cidx] = static_cast<float>(-(inv[cidx][0] * a[0] + inv[cidx][1] * a[1] +
                                           inv[cidx][2] * a[2]));
    ok[i] = 1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// OBJ parser (subset used by the reference: v / vn / f / usemtl / mtllib).
// Faces are fan-triangulated. Negative indices resolved. Two-phase API: the
// first call sizes everything, the second fills caller buffers.
// ---------------------------------------------------------------------------
struct ObjData {
  std::vector<float> positions;   // 3*nv
  std::vector<float> normals;     // 3*nn
  std::vector<int32_t> tri_pos;   // 3*nt indices into positions
  std::vector<int32_t> tri_nrm;   // 3*nt indices into normals (-1 if none)
  std::vector<int32_t> tri_mat;   // nt material ids (-1 if none)
  std::vector<std::string> mat_names;
  std::string mtllib;
};

static ObjData* g_obj = nullptr;

static void parse_face_vertex(const char* tok, int64_t nv, int64_t nn, int32_t* vi,
                              int32_t* ni) {
  // formats: v, v/vt, v//vn, v/vt/vn
  long v = strtol(tok, nullptr, 10);
  *vi = static_cast<int32_t>(v > 0 ? v - 1 : nv + v);
  *ni = -1;
  const char* s1 = strchr(tok, '/');
  if (!s1) return;
  const char* s2 = strchr(s1 + 1, '/');
  if (!s2) return;
  if (*(s2 + 1) == '\0') return;
  long nrm = strtol(s2 + 1, nullptr, 10);
  *ni = static_cast<int32_t>(nrm > 0 ? nrm - 1 : nn + nrm);
}

int rt_obj_open(const char* path, int64_t* nv, int64_t* nn, int64_t* nt,
                int64_t* nmat, int64_t* mtllib_len) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  delete g_obj;
  g_obj = new ObjData();
  std::unordered_map<std::string, int32_t> mat_ids;
  int32_t cur_mat = -1;
  char line[4096];
  std::vector<const char*> toks;
  while (fgets(line, sizeof(line), f)) {
    char* p = line;
    while (*p == ' ' || *p == '\t') ++p;
    if (*p == '#' || *p == '\0' || *p == '\n' || *p == '\r') continue;
    if (p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      float x = 0, y = 0, z = 0;
      sscanf(p + 2, "%f %f %f", &x, &y, &z);
      g_obj->positions.insert(g_obj->positions.end(), {x, y, z});
    } else if (p[0] == 'v' && p[1] == 'n' && (p[2] == ' ' || p[2] == '\t')) {
      float x = 0, y = 0, z = 0;
      sscanf(p + 3, "%f %f %f", &x, &y, &z);
      g_obj->normals.insert(g_obj->normals.end(), {x, y, z});
    } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      toks.clear();
      for (char* q = strtok(p + 2, " \t\r\n"); q; q = strtok(nullptr, " \t\r\n"))
        toks.push_back(q);
      int64_t cnv = static_cast<int64_t>(g_obj->positions.size() / 3);
      int64_t cnn = static_cast<int64_t>(g_obj->normals.size() / 3);
      if (toks.size() < 3) continue;
      int32_t v0, n0;
      parse_face_vertex(toks[0], cnv, cnn, &v0, &n0);
      for (size_t k = 1; k + 1 < toks.size(); ++k) {
        int32_t va, na, vb, nb;
        parse_face_vertex(toks[k], cnv, cnn, &va, &na);
        parse_face_vertex(toks[k + 1], cnv, cnn, &vb, &nb);
        g_obj->tri_pos.insert(g_obj->tri_pos.end(), {v0, va, vb});
        g_obj->tri_nrm.insert(g_obj->tri_nrm.end(), {n0, na, nb});
        g_obj->tri_mat.push_back(cur_mat);
      }
    } else if (!strncmp(p, "usemtl", 6)) {
      char name[1024] = {0};
      sscanf(p + 6, " %1023[^\r\n]", name);
      std::string nm(name);
      while (!nm.empty() && (nm.back() == ' ' || nm.back() == '\t')) nm.pop_back();
      auto it = mat_ids.find(nm);
      if (it == mat_ids.end()) {
        cur_mat = static_cast<int32_t>(g_obj->mat_names.size());
        mat_ids[nm] = cur_mat;
        g_obj->mat_names.push_back(nm);
      } else {
        cur_mat = it->second;
      }
    } else if (!strncmp(p, "mtllib", 6)) {
      char name[1024] = {0};
      sscanf(p + 6, " %1023[^\r\n]", name);
      g_obj->mtllib = name;
    }
  }
  fclose(f);
  *nv = static_cast<int64_t>(g_obj->positions.size() / 3);
  *nn = static_cast<int64_t>(g_obj->normals.size() / 3);
  *nt = static_cast<int64_t>(g_obj->tri_mat.size());
  *nmat = static_cast<int64_t>(g_obj->mat_names.size());
  *mtllib_len = static_cast<int64_t>(g_obj->mtllib.size());
  return 0;
}

int rt_obj_fill(float* positions, float* normals, int32_t* tri_pos, int32_t* tri_nrm,
                int32_t* tri_mat, char* mtllib) {
  if (!g_obj) return -1;
  memcpy(positions, g_obj->positions.data(), g_obj->positions.size() * sizeof(float));
  memcpy(normals, g_obj->normals.data(), g_obj->normals.size() * sizeof(float));
  memcpy(tri_pos, g_obj->tri_pos.data(), g_obj->tri_pos.size() * sizeof(int32_t));
  memcpy(tri_nrm, g_obj->tri_nrm.data(), g_obj->tri_nrm.size() * sizeof(int32_t));
  memcpy(tri_mat, g_obj->tri_mat.data(), g_obj->tri_mat.size() * sizeof(int32_t));
  memcpy(mtllib, g_obj->mtllib.data(), g_obj->mtllib.size());
  return 0;
}

int rt_obj_mat_name(int64_t idx, char* out, int64_t cap) {
  if (!g_obj || idx < 0 || idx >= static_cast<int64_t>(g_obj->mat_names.size()))
    return -1;
  const std::string& s = g_obj->mat_names[static_cast<size_t>(idx)];
  int64_t n = std::min<int64_t>(cap - 1, static_cast<int64_t>(s.size()));
  memcpy(out, s.data(), static_cast<size_t>(n));
  out[n] = '\0';
  return static_cast<int>(n);
}

void rt_obj_close() {
  delete g_obj;
  g_obj = nullptr;
}

// ---------------------------------------------------------------------------
// Morton-order clustering: sorts triangle centroids along a Z-order curve and
// returns the permutation + per-cluster AABBs for fixed-size clusters. This
// is the host-side build step for tile-level cluster culling on the device.
// ---------------------------------------------------------------------------
static inline uint64_t expand_bits(uint64_t v) {
  v &= 0x1fffff;
  v = (v | (v << 32)) & 0x1f00000000ffffULL;
  v = (v | (v << 16)) & 0x1f0000ff0000ffULL;
  v = (v | (v << 8)) & 0x100f00f00f00f00fULL;
  v = (v | (v << 4)) & 0x10c30c30c30c30c3ULL;
  v = (v | (v << 2)) & 0x1249249249249249ULL;
  return v;
}

int rt_morton_order(const float* centroids, int64_t n, int32_t* order) {
  if (n <= 0) return 0;
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = 0; i < n; ++i)
    for (int c = 0; c < 3; ++c) {
      lo[c] = std::min(lo[c], centroids[3 * i + c]);
      hi[c] = std::max(hi[c], centroids[3 * i + c]);
    }
  std::vector<std::pair<uint64_t, int32_t>> keys(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    uint64_t code = 0;
    for (int c = 0; c < 3; ++c) {
      float range = hi[c] - lo[c];
      float t = range > 0 ? (centroids[3 * i + c] - lo[c]) / range : 0.0f;
      uint64_t q = static_cast<uint64_t>(t * 2097151.0f);
      code |= expand_bits(q) << c;
    }
    keys[static_cast<size_t>(i)] = {code, static_cast<int32_t>(i)};
  }
  std::sort(keys.begin(), keys.end());
  for (int64_t i = 0; i < n; ++i) order[i] = keys[static_cast<size_t>(i)].second;
  return 0;
}

// Per-cluster AABBs over already-ordered triangles (n tris, cluster_size per
// cluster, 3 vertices each). aabbs: (n_clusters, 6) = min xyz | max xyz.
int rt_cluster_aabbs(const float* verts /* n*9 */, int64_t n, int64_t cluster_size,
                     float* aabbs) {
  int64_t nc = (n + cluster_size - 1) / cluster_size;
  for (int64_t c = 0; c < nc; ++c) {
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    int64_t e = std::min(n, (c + 1) * cluster_size);
    for (int64_t i = c * cluster_size; i < e; ++i)
      for (int v = 0; v < 3; ++v)
        for (int k = 0; k < 3; ++k) {
          float val = verts[9 * i + 3 * v + k];
          lo[k] = std::min(lo[k], val);
          hi[k] = std::max(hi[k], val);
        }
    for (int k = 0; k < 3; ++k) {
      aabbs[6 * c + k] = lo[k];
      aabbs[6 * c + 3 + k] = hi[k];
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// PNG encode (8-bit RGB, filter 0) via zlib.
// Two-phase: encode into an internal buffer, then copy out.
// ---------------------------------------------------------------------------
static std::vector<uint8_t> g_png;

static void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(static_cast<uint8_t>(x >> 24));
  v.push_back(static_cast<uint8_t>(x >> 16));
  v.push_back(static_cast<uint8_t>(x >> 8));
  v.push_back(static_cast<uint8_t>(x));
}

static void put_chunk(std::vector<uint8_t>& v, const char* tag, const uint8_t* data,
                      size_t len) {
  put_be32(v, static_cast<uint32_t>(len));
  size_t start = v.size();
  v.insert(v.end(), tag, tag + 4);
  v.insert(v.end(), data, data + len);
  uLong crc = crc32(0L, v.data() + start, static_cast<uInt>(4 + len));
  put_be32(v, static_cast<uint32_t>(crc));
}

int64_t rt_png_encode(const uint8_t* rgb, int64_t width, int64_t height) {
  std::vector<uint8_t> raw(static_cast<size_t>(height * (1 + width * 3)));
  for (int64_t y = 0; y < height; ++y) {
    uint8_t* row = raw.data() + y * (1 + width * 3);
    row[0] = 0;
    memcpy(row + 1, rgb + y * width * 3, static_cast<size_t>(width * 3));
  }
  uLongf comp_cap = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(), static_cast<uLong>(raw.size()), 6) !=
      Z_OK)
    return -1;
  comp.resize(comp_cap);

  g_png.clear();
  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  g_png.insert(g_png.end(), magic, magic + 8);
  uint8_t ihdr[13];
  ihdr[0] = static_cast<uint8_t>(width >> 24);
  ihdr[1] = static_cast<uint8_t>(width >> 16);
  ihdr[2] = static_cast<uint8_t>(width >> 8);
  ihdr[3] = static_cast<uint8_t>(width);
  ihdr[4] = static_cast<uint8_t>(height >> 24);
  ihdr[5] = static_cast<uint8_t>(height >> 16);
  ihdr[6] = static_cast<uint8_t>(height >> 8);
  ihdr[7] = static_cast<uint8_t>(height);
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // RGB
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  put_chunk(g_png, "IHDR", ihdr, 13);
  put_chunk(g_png, "IDAT", comp.data(), comp.size());
  put_chunk(g_png, "IEND", nullptr, 0);
  return static_cast<int64_t>(g_png.size());
}

int rt_png_copy(uint8_t* out) {
  memcpy(out, g_png.data(), g_png.size());
  g_png.clear();
  g_png.shrink_to_fit();
  return 0;
}

}  // extern "C"
