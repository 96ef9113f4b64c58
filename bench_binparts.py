"""Microbench individual binning/pack/reduce primitives (dev tool)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from bloomscene_tpu.ops.tiles import cumsum_f32_exact, cummax_1d, cumsum_lanes

P = 221184
N = 100_000
CAP = 640
T = 1024
rng = np.random.default_rng(0)
x100 = jnp.asarray(rng.integers(0, 12, N).astype(np.float32))
x221 = jnp.asarray(rng.uniform(0, 1, P).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
tab9 = jnp.asarray(rng.uniform(0, 1, (9, N)).astype(np.float32))
tab16 = jnp.asarray(rng.uniform(0, 1, (16, P + CAP)).astype(np.float32))
starts = jnp.asarray(np.sort(rng.integers(0, P, T)).astype(np.int32))
grad = jnp.asarray(rng.uniform(0, 1, (CAP, 16, T)).astype(np.float32))
lanes10 = jnp.asarray(rng.uniform(0, 1, (10, P)).astype(np.float32))
src10 = jnp.asarray(rng.uniform(0, 1, (10, CAP * T + 128)).astype(np.float32))
srcidx = jnp.asarray(rng.integers(0, CAP * T, P).astype(np.int32))
planes6 = jnp.asarray(rng.uniform(0, 1, (6, 256, T)).astype(np.float32))
pos = jnp.asarray(rng.permutation(T).astype(np.int32))


def timeit(f, args, name, iters=30):
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms")


timeit(jax.jit(cumsum_f32_exact), (x100,), "cumsum_f32_exact 100K")
timeit(jax.jit(lambda x: jnp.cumsum(x)), (x100,), "jnp.cumsum 100K")
timeit(jax.jit(cummax_1d), (x221,), "cummax_1d 221K")
timeit(jax.jit(lambda x: lax.cummax(x)), (x221,), "lax.cummax 221K")
timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=1)), (tab9, idx),
       "take [9,100K] by 221K lanes")
timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=1)), (src10, srcidx),
       "take [10,655K] by 221K lanes")
timeit(jax.jit(cumsum_lanes), (lanes10,), "cumsum_lanes [10,221K]")
timeit(jax.jit(lambda t, s: jax.vmap(
    lambda ss: lax.dynamic_slice(t, (0, ss), (16, CAP)))(s)),
    (tab16, starts), "vmapped dyn-slice 1024x[16,640]")
timeit(jax.jit(lambda g: jnp.transpose(g[:, :10, :], (1, 0, 2)).reshape(
    10, CAP * T)), (grad,), "grad transpose [640,16,1024]->[10,.]")
timeit(jax.jit(lambda sl, p: jnp.transpose(sl, (2, 1, 0))),
       (jnp.zeros((T, 16, CAP), jnp.float32), pos),
       "pack transpose [1024,16,640]->[640,16,1024]")
timeit(jax.jit(lambda pl, p: pl[:, :, p]), (planes6, pos),
       "planes perm-gather [6,256,1024]")
timeit(jax.jit(lambda pl: jnp.transpose(pl.reshape(6, 16, 16, 32, 32),
                                        (0, 3, 1, 4, 2)).reshape(
    6, 512, 512)), (planes6,), "planes->image transpose")
# gather along axis 0 instead of lanes (rows)
timeit(jax.jit(lambda t, i: t.T[i]), (tab9, idx), "row-gather [100K,9] by 221K")
