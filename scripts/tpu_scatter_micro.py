"""Micro-benchmark: dynamic stream compaction of (N, 16) f32 rows on TPU.

The pool staging compaction (ops/trace.py::_pool_append) is the biggest
non-kernel device op: the drop-slot row scatter costs ~11 ns/row (PERF.md
"Pool staging machinery"), 2.37 ms at the prologue's 2R=262144 candidate
rows.  This script measures every plausible reformulation on the real
chip so the next stage_mode is chosen on data:

  scatter   drop-slot row scatter (current production)
  gatherix  row gather with ALREADY-KNOWN source indices (lower bound for
            any gather-based scheme; the inverse-map construction is extra)
  mm_local  batched per-256-block one-hot matmul compaction ONLY (level 1;
            leaves inter-block gaps) -- MXU lower bound
  mm_dus    level 1 + level-2 merge via fori_loop of dynamic_update_slice
            (one (256,16) DUS per block at its global offset; ordered, so
            later blocks overwrite earlier junk tails) -- full compaction
  arith_gather  block-arithmetic inverse map (compare-sum block id + one-hot
            offset lookup, no searchsorted) + row gather -- full compaction

All full-compaction variants are verified against the scatter reference on
the accepted prefix before timing.  Timings are best-of-K wall with a value
fetch (relay-safe), one program per variant, all variants in one session.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("MICRO_N", 262144))
BS = int(os.environ.get("MICRO_BS", 256))
DENSITY = float(os.environ.get("MICRO_DENSITY", 0.3))
REPS = int(os.environ.get("MICRO_REPS", 30))
COLS = 16
NB = N // BS


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((N, COLS)).astype(np.float32)
    # spatially-clumped mask like real spawn masks (runs of glass/diffuse)
    base = rng.random(N // 64) < DENSITY
    m = np.repeat(base, 64)
    m &= rng.random(N) < 0.85  # ragged edges
    return jnp.asarray(x), jnp.asarray(m)


# ---- variants ----

def v_scatter(x, m):
    cum = jnp.cumsum(m.astype(jnp.int32))
    pos = jnp.where(m, cum - 1, N)  # N = drop slot
    out = jnp.zeros((N + 1, COLS), jnp.float32).at[pos].set(x)[:N]
    return out, cum[-1]


def v_gatherix(x, m):
    # lower bound: indices handed in precomputed (host) -- measures the raw
    # row-gather cost alone
    cum = np.cumsum(np.asarray(m))
    src = np.flatnonzero(np.asarray(m))
    src_full = np.zeros(N, np.int32)
    src_full[: src.size] = src
    idx = jnp.asarray(src_full)

    def run(x, idx):
        return jnp.take(x, idx, axis=0), idx[0]

    return run, idx, int(cum[-1])


def _local_compact(x, m):
    """(NB, BS, COLS) per-block one-hot matmul compaction + block counts."""
    xb = x.reshape(NB, BS, COLS)
    mb = m.reshape(NB, BS)
    lpos = jnp.cumsum(mb.astype(jnp.int32), axis=1) - 1  # (NB, BS)
    n_b = jnp.sum(mb.astype(jnp.int32), axis=1)  # (NB,)
    dst = jnp.arange(BS, dtype=jnp.int32)
    # onehot[b, j, i] = 1 iff accepted row i of block b lands at local j
    oh = ((lpos[:, None, :] == dst[None, :, None]) & mb[:, None, :]).astype(
        jnp.float32
    )
    local = jax.lax.dot_general(
        oh, xb, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    )
    return local, n_b


def v_mm_local(x, m):
    local, n_b = _local_compact(x, m)
    return local, jnp.sum(n_b)


def v_mm_dus(x, m):
    local, n_b = _local_compact(x, m)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_b)[:-1]]
    )

    def body(b, out):
        return jax.lax.dynamic_update_slice_in_dim(out, local[b], offs[b], 0)

    out = jax.lax.fori_loop(0, NB, body, jnp.zeros((N, COLS), jnp.float32))
    return out, offs[-1] + n_b[-1]


def v_arith_gather(x, m):
    local, n_b = _local_compact(x, m)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_b)[:-1]]
    )
    k = jnp.arange(N, dtype=jnp.int32)
    # block(k) = #{b : end[b] <= k} with end = exclusive block end; exact
    # even through empty blocks (their end ties the previous block's, and
    # the counted block is always nonempty for k < n_push)
    end = offs + n_b
    blk = jnp.sum((end[None, :] <= k[:, None]).astype(jnp.int32), axis=1)
    blk = jnp.clip(blk, 0, NB - 1)
    # small-table lookup via one-hot matmul: offs_at_k = OH @ offs
    ohb = (blk[:, None] == jnp.arange(NB, dtype=jnp.int32)[None, :]).astype(
        jnp.float32
    )
    offs_f = offs.astype(jnp.float32)
    off_at = jnp.dot(
        ohb, offs_f, precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.int32)
    src = blk * BS + (k - off_at)
    src = jnp.clip(src, 0, N - 1)
    out = jnp.take(local.reshape(N, COLS), src, axis=0)
    return out, jnp.sum(n_b)


def time_fn(fn, args, reps=REPS):
    jit = jax.jit(fn)
    out = jit(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(out[1]))  # value fetch: relay-safe completion
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic()
        out = jit(*args)
        jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    return best * 1e3, out


def main():
    x, m = make_inputs()
    n_acc = int(np.asarray(m).sum())
    print(
        f"N={N} BS={BS} NB={NB} density={n_acc / N:.3f} platform="
        f"{jax.devices()[0].platform}"
    )

    ms_sc, ref = time_fn(v_scatter, (x, m))
    ref_np = np.asarray(ref[0])[:n_acc]
    print(f"scatter      {ms_sc:8.3f} ms   ({ms_sc / N * 1e6:.2f} ns/row)")

    run, idx, _ = v_gatherix(x, m)
    ms_g, outg = time_fn(run, (x, idx))
    np.testing.assert_array_equal(np.asarray(outg[0])[:n_acc], ref_np)
    print(f"gatherix     {ms_g:8.3f} ms   ({ms_g / N * 1e6:.2f} ns/row)")

    ms_l, outl = time_fn(v_mm_local, (x, m))
    print(f"mm_local     {ms_l:8.3f} ms   (level-1 only)")
    # verify level-1 block contents
    loc = np.asarray(outl[0])
    mb = np.asarray(m).reshape(NB, BS)
    xb = np.asarray(x).reshape(NB, BS, COLS)
    for b in (0, 1, NB // 2, NB - 1):
        want = xb[b][mb[b]]
        np.testing.assert_array_equal(loc[b][: want.shape[0]], want)

    ms_d, outd = time_fn(v_mm_dus, (x, m))
    np.testing.assert_array_equal(np.asarray(outd[0])[:n_acc], ref_np)
    print(f"mm_dus       {ms_d:8.3f} ms   ({ms_d / N * 1e6:.2f} ns/row)")

    ms_a, outa = time_fn(v_arith_gather, (x, m))
    np.testing.assert_array_equal(np.asarray(outa[0])[:n_acc], ref_np)
    print(f"arith_gather {ms_a:8.3f} ms   ({ms_a / N * 1e6:.2f} ns/row)")


if __name__ == "__main__":
    main()
