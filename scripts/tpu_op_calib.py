"""Calibrate per-vector-op cost inside a Pallas kernel at the light-kernel
shape regime (round 3): grid of 512 instances, per-instance math on
(C, RT) / (1, RT) tiles. If K chained fmas scale at ~cycles/op, the
light kernel's ~60 us/instance must come from specific structures, not
generic op cost. Sweeps shape variants in ONE session:

  chain5   — K fmas on (5, RT) from (5,1) x (1,RT) broadcasts
  chain8   — K fmas on (8, RT)
  chain64  — K fmas on (64, RT) (the pair-tile regime)
  mixed    — K/4 rounds of {fma, where, slice-broadcast, sum-axis0} on (5, RT)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RT = int(os.environ.get("RT", 256))
R = 131072
GRID = R // RT


def make(kind, K, C):
    def kernel(x_ref, c_ref, o_ref):
        x = x_ref[:]  # (1, RT)
        cs = c_ref[:]  # (C, 1)
        acc = cs * x  # (C, RT)
        if kind == "mixed":
            for k in range(K // 4):
                acc = acc * cs + x
                acc = jnp.where(acc > 0.5, acc, acc * 0.3)
                acc = acc + cs[(k % C)][None, :]
                s = jnp.sum(acc, axis=0)  # (RT,)
                acc = acc + s[None, :]
        else:
            for _ in range(K):
                acc = acc * cs + x
        o_ref[:] = jnp.sum(acc, axis=0, keepdims=True)

    return pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((1, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RT), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
    )


x = jnp.asarray(np.random.rand(1, R).astype(np.float32))
for kind, C in [("chain", 5), ("chain", 8), ("chain", 64), ("mixed", 5)]:
    label = f"{kind}{C}"
    last = None
    for K in (16, 64, 256):
        cs = jnp.asarray(np.random.rand(C, 1).astype(np.float32))
        f = jax.jit(make(kind, K, C))
        out = f(x, cs)
        jax.block_until_ready(out)
        np.asarray(out)[0, 0]
        ts = []
        for _ in range(6):
            t0 = time.monotonic()
            out = f(x, cs)
            jax.block_until_ready(out)
            ts.append((time.monotonic() - t0) * 1e3)
        ms = min(ts)
        us = ms * 1e3 / GRID
        slope = "" if last is None else f"  slope {(us - last[1]) / (K - last[0]) * 1e3:7.1f} ns/op"
        print(f"{label:8s} K={K:4d}: {ms:8.2f} ms ({us:6.2f} us/instance){slope}",
              flush=True)
        last = (K, us)
