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

def timeit(name, fn, *args, reps=8):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic(); out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name}: {best*1e3:.3f} ms", flush=True)

R, K, W = 32256, 24, 8064
rng = np.random.default_rng(0)
stack = jnp.asarray(rng.normal(size=(K, R, 3)).astype(np.float32))
sel = jnp.asarray(rng.permutation(R)[:W].astype(np.int32))
slot = jnp.asarray(rng.integers(0, K, W).astype(np.int32))
vals = jnp.ones((W, 3))
active = jnp.asarray(rng.random(R) < 0.3)

timeit("gather stack[slot,sel]", jax.jit(lambda st, sl, se: st[sl, se]), stack, slot, sel)
timeit("scatter stack.at[slot,sel].set", jax.jit(lambda st, sl, se, v: st.at[sl, se].set(v)), stack, slot, sel, vals)
timeit("cumsum 32k", jax.jit(lambda a: jnp.cumsum(a.astype(jnp.int32))), active)
timeit("argsort 32k", jax.jit(lambda a: jnp.argsort(~a)), active)
timeit("perm scatter iota", jax.jit(lambda a: jnp.zeros((R,), jnp.int32).at[jnp.cumsum(a.astype(jnp.int32))-1].set(jnp.arange(R, dtype=jnp.int32))), active)
onehot_w = jnp.ones((R,), bool); entryv = jnp.ones((R,3)); sp = jnp.asarray(rng.integers(0,K,R).astype(np.int32))
def push_onehot(st, sp_, m, v):
    slot_ = jnp.arange(K, dtype=jnp.int32)[:, None] == sp_[None, :]
    w_ = slot_ & m[None, :]
    return jnp.where(w_[..., None], v[None], st)
timeit("one-hot push (K,R,3)", jax.jit(push_onehot), stack, sp, onehot_w, entryv)
# take_along_axis pop
idx = jnp.maximum(sp-1,0)[None,:]
timeit("pop take_along_axis", jax.jit(lambda st, ix: jnp.take_along_axis(st, ix[..., None], axis=0)[0]), stack, idx)
