"""Ablation breakdown of the fused lighting kernel: which piece costs what.

Builds a local, flag-gated copy of _light_shade_kernel and times it with
spheres / triangles / shading / transcendentals disabled one at a time."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords, tile_major_order
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import cast_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized, F32_EPSILON
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops import pallas_kernels as PK
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0 = 1920, 1080
TB = int(os.environ.get("TB", 512))
RT = int(os.environ.get("RT", 256))
cfg = RenderConfig(width=W0, height=H0, reflections=True, refractions=True,
                   scene_backface_culling=True, use_pallas=True, triangle_block=TB)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
print(f"nb={ds.triangle_blocks} B={ds.tri_block} sb={ds.sb_sizes} RT={RT}")

px, py = np.meshgrid(np.arange(W0), np.arange(H0))
order = tile_major_order(W0, H0)
px, py = px.reshape(-1)[order], py.reshape(-1)[order]
coords = pixel_scene_coords(cfg, px, py)
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 131072
sl = slice(4*R, 5*R)
o, d = jnp.asarray(coords[sl]), normalized(jnp.asarray(dirs[sl]))
hit = cast_rays(ds, o, d, use_pallas=True)
jax.block_until_ready(hit.point)


def kernel(lights_ref, sph_ref, woop_ref, nsq_ref, valid_ref, httr_ref,
           tnorm_ref, ior_ref, op_ref, met_ref, colr_ref, absn_ref,
           aabb_ref, saabb_ref, pt_ref, nrm_ref, view_ref, col_ref,
           shin_ref, valid_r_ref, direct_out, spec_out,
           *, n_lights, nb, eps_dist, block_has_trans, sb_sizes,
           do_sph, do_tri, do_shade, do_trans, do_cull):
    ptx, pty, ptz = pt_ref[0], pt_ref[1], pt_ref[2]
    nx, ny, nz = nrm_ref[0], nrm_ref[1], nrm_ref[2]
    vwx, vwy, vwz = view_ref[0], view_ref[1], view_ref[2]
    mcr, mcg, mcb = col_ref[0], col_ref[1], col_ref[2]
    shin = shin_ref[0]
    valid = valid_r_ref[0] != 0.0
    RT_ = ptx.shape[0]
    has_spec = shin > 0.0
    spec_exp = jnp.maximum(shin * 512.0, 1.0)
    zf = jnp.zeros((RT_,), jnp.float32)

    def light_body(l, acc):
        dr, dg, db, spr, spg, spb = acc
        lpx, lpy, lpz = lights_ref[l, 0], lights_ref[l, 1], lights_ref[l, 2]
        lcr, lcg, lcb = lights_ref[l, 3], lights_ref[l, 4], lights_ref[l, 5]
        lint = lights_ref[l, 6]
        ltpx, ltpy, ltpz = lpx - ptx, lpy - pty, lpz - ptz
        lt2 = ltpx * ltpx + ltpy * ltpy + ltpz * ltpz
        inv_lt = 1.0 / jnp.sqrt(lt2)
        ldx, ldy, ldz = ltpx * inv_lt, ltpy * inv_lt, ltpz * inv_lt
        sox, soy, soz = ptx + ldx * eps_dist, pty + ldy * eps_dist, ptz + ldz * eps_dist
        dex, dey, dez = lpx - sox, lpy - soy, lpz - soz
        light_distance = jnp.sqrt(lt2) + F32_EPSILON
        cos_in = (ltpx * nx + ltpy * ny + ltpz * nz) / light_distance
        angle_pos = cos_in > 0.0
        occl_lane = valid & angle_pos
        maxd = jnp.where(occl_lane, jnp.sqrt(dex * dex + dey * dey + dez * dez), 0.0)

        dec, opq, fr, fg, fb = zf, zf, zf, zf, zf
        if do_sph:
            dec, opq, fr, fg, fb = PK._sphere_occl_comp(
                sph_ref[:], sox, soy, soz, ldx, ldy, ldz, maxd, False)
        if do_tri:
            dec, opq, fr, fg, fb = PK._tri_occl_comp(
                woop_ref, nsq_ref, valid_ref, httr_ref, tnorm_ref, ior_ref,
                op_ref, met_ref, colr_ref, absn_ref, aabb_ref, saabb_ref,
                sox, soy, soz, ldx, ldy, ldz, maxd, dec, opq, fr, fg, fb,
                nb=nb, backface_culling=False, use_aabb=do_cull,
                block_has_trans=block_has_trans, sb_sizes=sb_sizes)

        if do_shade:
            combined_opacity = jnp.clip(1.0 - dec, 0.0, 1.0)
            can_reach = (opq < 1.0) & valid
            if do_trans:
                att = 0.95 * (F32_EPSILON + light_distance + light_distance * light_distance)
                att_sig = (jnp.tanh(att) + 1.0) / 2.0
            else:
                att_sig = light_distance
            ci = jnp.where(angle_pos, cos_in * lint * jnp.clip(att_sig, 0.0, 1.0), 0.0)
            ccr = jnp.where(angle_pos, mcr * lcr, 0.0)
            ccg = jnp.where(angle_pos, mcg * lcg, 0.0)
            ccb = jnp.where(angle_pos, mcb * lcb, 0.0)
            lcsr = jnp.where(can_reach, ccr / (1.0 - fr), ccr)
            lcsg = jnp.where(can_reach, ccg / (1.0 - fg), ccg)
            lcsb = jnp.where(can_reach, ccb / (1.0 - fb), ccb)
            dot_ln = nx * ldx + ny * ldy + nz * ldz
            diffuse = jnp.maximum(dot_ln, 0.0)
            srx = ldx - 2.0 * dot_ln * nx
            sry = ldy - 2.0 * dot_ln * ny
            srz = ldz - 2.0 * dot_ln * nz
            inv_sr = 1.0 / jnp.sqrt(srx * srx + sry * sry + srz * srz)
            spec_dot = jnp.maximum(srx * inv_sr * vwx + sry * inv_sr * vwy + srz * inv_sr * vwz, 0.0)
            if do_trans:
                spec_f = jnp.where(has_spec, spec_dot ** spec_exp, 0.0)
            else:
                spec_f = jnp.where(has_spec, spec_dot, 0.0)
            op_sel = jnp.where(can_reach, combined_opacity, 1.0)
            lf = diffuse * ci * op_sel
            sf = ci * op_sel * spec_f
            m = (diffuse > 0.0) & can_reach & valid
            dr = dr + jnp.where(m, mcr * lcsr * lf, 0.0)
            dg = dg + jnp.where(m, mcg * lcsg * lf, 0.0)
            db = db + jnp.where(m, mcb * lcsb * lf, 0.0)
            ms = m & has_spec
            spr = spr + jnp.where(ms, lcr * sf, 0.0)
            spg = spg + jnp.where(ms, lcg * sf, 0.0)
            spb = spb + jnp.where(ms, lcb * sf, 0.0)
        else:
            dr = dr + dec + fr
            dg = dg + opq + fg
            db = db + fb
        return dr, dg, db, spr, spg, spb

    dr, dg, db, spr, spg, spb = jax.lax.fori_loop(
        0, n_lights, light_body, (zf, zf, zf, zf, zf, zf))
    direct_out[:] = jnp.stack([dr, dg, db])
    spec_out[:] = jnp.stack([spr, spg, spb])


@functools.partial(jax.jit, static_argnames=("flags", "n_lights_s"))
def run(args_, flags, n_lights_s):
    (light_pack, sph_pack, woop, nsq, tvalid, httr, tnorm, ior, op, met, colr,
     absn, aabb, saabb, point, normal, view, color, shin, valid) = args_
    Rr = point.shape[0]
    nb, _, B = woop.shape

    def full(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.VMEM)
    def smem(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.SMEM)
    def rayt(s):
        return pl.BlockSpec(s, lambda i: (0, i), memory_space=pltpu.VMEM)

    fd = dict(flags)
    direct, spec = pl.pallas_call(
        functools.partial(kernel, n_lights=n_lights_s, nb=nb,
                          eps_dist=float(cfg.camera.epsilon_distance),
                          block_has_trans=ds.block_has_trans, sb_sizes=ds.sb_sizes,
                          **fd),
        grid=(Rr // RT,),
        in_specs=[smem((light_pack.shape[0], 8)), full((16, 128)),
                  full((nb, 12, B)), full((nb, 1, B)), full((nb, 1, B)),
                  full((nb, 1, B)), full((nb, 3, B)), full((nb, 1, B)),
                  full((nb, 1, B)), full((nb, 1, B)), full((nb, 1, B)),
                  full((nb, 3, B)), smem(aabb.shape), smem(saabb.shape),
                  rayt((3, RT)), rayt((3, RT)), rayt((3, RT)), rayt((3, RT)),
                  rayt((1, RT)), rayt((1, RT))],
        out_specs=[rayt((3, RT)), rayt((3, RT))],
        out_shape=[jax.ShapeDtypeStruct((3, Rr), jnp.float32),
                   jax.ShapeDtypeStruct((3, Rr), jnp.float32)],
    )(light_pack, sph_pack, woop, nsq[:, None], tvalid[:, None], httr[:, None],
      tnorm, ior[:, None], op[:, None], met[:, None], colr[:, None], absn,
      aabb, saabb, point.T, normal.T, view.T, color.T, shin[None, :], valid[None, :])
    return direct, spec


args = (ds.light_pack, ds.sph_pack, ds.tri_woop, ds.tri_nsq, ds.tri_valid_f,
        ds.tri_httr_f, ds.tri_normal3, ds.tri_ior, ds.tri_op, ds.tri_met,
        ds.tri_colr, ds.tri_absn, ds.tri_aabb, ds.tri_saabb,
        hit.point, hit.normal, d, hit.color, hit.shininess,
        hit.valid.astype(jnp.float32))


def timeit(name, flags, n_lights=None, reps=10):
    fl = tuple(sorted(flags.items()))
    out = run(args, fl, n_lights or ds.n_lights)
    jax.block_until_ready(out)
    _ = float(np.asarray(out[0]).sum())
    t0 = time.monotonic()
    for _i in range(reps):
        out = run(args, fl, n_lights or ds.n_lights)
    jax.block_until_ready(out)
    print(f"{name}: {(time.monotonic()-t0)/reps*1e3:.2f} ms")


BASE = dict(do_sph=True, do_tri=True, do_shade=True, do_trans=True, do_cull=True)
timeit("full", BASE)
timeit("no spheres", {**BASE, "do_sph": False})
timeit("no triangles", {**BASE, "do_tri": False})
timeit("no shading", {**BASE, "do_shade": False})
timeit("no transcendentals", {**BASE, "do_trans": False})
timeit("no cull", {**BASE, "do_cull": False})
timeit("1 light", BASE, n_lights=1)
timeit("empty (tri+sph+shade off)", {**BASE, "do_sph": False, "do_tri": False, "do_shade": False})
