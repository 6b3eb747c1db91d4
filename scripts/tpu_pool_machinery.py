"""Isolate the per-iteration cost of the ray-pool loop machinery (no eval):
service-slice, Morton-free append (cumsum+staging scatter+dyn update), and
the per-iteration accum scatter-add. Each variant runs ITERS iterations
inside one jitted fori_loop; the delta between variants is the true
per-iteration machinery cost, free of dispatch overhead.

Usage: python scripts/tpu_pool_machinery.py [R] [ratio]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

R = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
ratio = int(sys.argv[2]) if len(sys.argv) > 2 else 32
W = max((R // ratio) // 256 * 256, 256)
Q = 2 * R + 2 * W
ITERS = 100

rng = np.random.default_rng(0)


def make_state():
    pool = dict(
        o=jnp.asarray(rng.normal(size=(Q, 3)).astype(np.float32)),
        d=jnp.asarray(rng.normal(size=(Q, 3)).astype(np.float32)),
        w=jnp.asarray(rng.normal(size=(Q, 3)).astype(np.float32)),
        ior=jnp.ones((Q,), jnp.float32),
        budget=jnp.ones((Q,), jnp.int32),
        from_refl=jnp.zeros((Q,), bool),
        pix=jnp.asarray(rng.integers(0, R, Q).astype(np.int32)),
    )
    return dict(pool=pool, count=jnp.int32(R), accum=jnp.zeros((R, 3), jnp.float32))


def body(s, *, do_slice=True, do_scatter=True, do_append=True):
    pool, count = s["pool"], s["count"]
    start = jnp.maximum(count - W, 0)
    sel_active = start + jnp.arange(W, dtype=jnp.int32) < count
    if do_slice:
        e = {k: jax.lax.dynamic_slice_in_dim(pool[k], start, W, 0) for k in pool}
    else:
        e = {k: pool[k][:W] for k in pool}
    contrib = e["w"] * 0.5  # stand-in for eval output
    s = dict(s)
    if do_scatter:
        s["accum"] = s["accum"].at[e["pix"]].add(
            jnp.where(sel_active[:, None], contrib, 0.0), mode="drop"
        )
    else:
        s["accum"] = s["accum"] + jnp.sum(contrib) * 1e-9
    count = jnp.minimum(start, Q - 2 * W)
    if do_append:
        m = jnp.concatenate([e["budget"] > 0, e["from_refl"]], axis=0)
        cand = {
            k: jnp.concatenate([e[k], e[k]], axis=0)
            for k in ("o", "d", "w", "ior", "budget", "from_refl", "pix")
        }
        n_cand = m.shape[0]
        pos_in = jnp.cumsum(m.astype(jnp.int32)) - 1
        n_push = pos_in[-1] + 1
        staging_pos = jnp.where(m, pos_in, n_cand)
        pool2 = dict(pool)
        for k in cand:
            out = jnp.zeros((n_cand + 1,) + cand[k].shape[1:], cand[k].dtype)
            staged = out.at[staging_pos].set(cand[k])[:n_cand]
            pool2[k] = jax.lax.dynamic_update_slice_in_dim(pool2[k], staged, count, 0)
        s["pool"] = pool2
        count = count + jnp.minimum(n_push, W)  # keep count bounded
    s["count"] = jnp.maximum(count, W)
    return s


def run(name, **kw):
    def prog(s):
        return jax.lax.fori_loop(0, ITERS, lambda i, st: body(st, **kw), s)

    f = jax.jit(prog)
    s = make_state()
    out = f(s)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(5):
        t0 = time.monotonic()
        jax.block_until_ready(f(s))
        best = min(best, time.monotonic() - t0)
    print(f"{name}: {best/ITERS*1e3:.3f} ms/iter ({best*1e3:.1f} ms total)", flush=True)
    return best


print(f"R={R} W={W} Q={Q} iters={ITERS}")
full = run("full machinery")
run("no accum scatter-add", do_scatter=False)
run("no append", do_append=False)
run("no dyn service slice", do_slice=False)
run("bare (none)", do_slice=False, do_scatter=False, do_append=False)
