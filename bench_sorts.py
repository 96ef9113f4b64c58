"""Microbench: lax.sort / scatter / histogram costs at binning sizes (dev tool)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

P = 221184   # pair capacity
N = 100_000  # splats
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 1 << 28, P).astype(np.int32))
pay = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
pay2 = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
fkey = jnp.asarray(rng.uniform(0, 10, N).astype(np.float32))
ipay = [jnp.asarray(rng.integers(0, N, N).astype(np.int32)) for _ in range(4)]
tiles = jnp.asarray(rng.integers(0, 1024, P).astype(np.int32))


def timeit(f, args, name, iters=30):
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms")


@jax.jit
def sort1(k):
    return lax.sort((k,), num_keys=1, is_stable=False)

@jax.jit
def sort2(k, p):
    return lax.sort((k, p), num_keys=1, is_stable=False)

@jax.jit
def sort3(k, p, q):
    return lax.sort((k, p, q), num_keys=1, is_stable=False)

@jax.jit
def sortN4(k, a, b, c):
    return lax.sort((k, a, b, c), num_keys=1, is_stable=True)

@jax.jit
def scat(p):
    return jnp.zeros((P,), jnp.int32).at[p].set(
        jnp.arange(P, dtype=jnp.int32), mode='drop', unique_indices=True)

@jax.jit
def hist_matmul(t):
    # per-128-block one-hot histogram via comparisons, summed on MXU path
    B = P // 128
    tb = t.reshape(B, 128)
    oh = (tb[:, :, None] == jnp.arange(1024, dtype=jnp.int32)[None, None, :])
    return jnp.sum(oh.astype(jnp.float32), axis=1)   # [B, 1024]

@jax.jit
def hist_matmul2(t):
    # one-hot [P, 1024] contracted against block-id one-hot via dot_general:
    # counts[b, tile] = sum_p [block(p)==b][t(p)==tile]
    B = P // 128
    oh = (t[:, None] == jnp.arange(1024, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16)                                  # [P, 1024]
    blk = (jnp.arange(P, dtype=jnp.int32)[:, None] // 128
           == jnp.arange(B, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    return jax.lax.dot_general(blk, oh, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

@jax.jit
def rank_in_block(t):
    # within-128-block rank among equal tiles: [B,128,128] comparisons
    B = P // 128
    tb = t.reshape(B, 128)
    eq = (tb[:, :, None] == tb[:, None, :])
    lower = jnp.tril(jnp.ones((128, 128), bool), -1)[None]
    return jnp.sum((eq & lower).astype(jnp.int32), axis=2)

timeit(sort1, (keys,), "sort 221K x1 i32")
timeit(sort2, (keys, pay), "sort 221K x2 i32")
timeit(sort3, (keys, pay, pay2), "sort 221K x3 i32")
timeit(sortN4, (fkey, ipay[0], ipay[1], ipay[2]), "stable sort 100K f32 + 3 pay")
perm = jax.block_until_ready(sort2(keys, jnp.arange(P, dtype=jnp.int32)))[1]
timeit(scat, (perm,), "scatter-set 221K unique")
timeit(hist_matmul, (tiles,), "blockwise histogram compare [B,128,1024]")
timeit(hist_matmul2, (tiles,), "histogram via bf16 matmul")
timeit(rank_in_block, (tiles,), "rank-in-block [B,128,128]")
