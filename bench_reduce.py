"""Microbench: segment-sum / gather-pack alternatives (dev tool)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

P = 221184      # pair emission capacity
PC = 196608     # packed (tile-sorted) capacity
N = 100_000
CAP = 640
T = 1024
rng = np.random.default_rng(0)
seg = jnp.asarray(rng.integers(0, N, CAP * T).astype(np.int32))
segPC = jnp.asarray(rng.integers(0, N, PC).astype(np.int32))
upd = jnp.asarray(rng.uniform(0, 1, (CAP * T, 10)).astype(np.float32))
updPC = jnp.asarray(rng.uniform(0, 1, (PC, 10)).astype(np.float32))
updPC_T = jnp.asarray(np.asarray(updPC).T.copy())
grad = jnp.asarray(rng.uniform(0, 1, (CAP, 16, T)).astype(np.float32))
src16 = jnp.asarray(rng.uniform(0, 1, (16, PC + CAP)).astype(np.float32))
idx2d = jnp.asarray(rng.integers(0, PC, (CAP, T)).astype(np.int32))
segs = jnp.asarray(np.sort(rng.integers(0, N, PC)).astype(np.int32))


def timeit(f, args, name, iters=30):
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name:52s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms")


@jax.jit
def seg_full(g, s):
    # reduce straight from the kernel buffer [cap,16,T] -> [cap*T,10]
    u = jnp.transpose(g[:, :10, :], (0, 2, 1)).reshape(CAP * T, 10)
    return jax.ops.segment_sum(u, s, N)

@jax.jit
def seg_pc(u, s):
    return jax.ops.segment_sum(u, s, N)

@jax.jit
def seg_pc_sorted(u, s):
    return jax.ops.segment_sum(u, s, N, indices_are_sorted=True)

@jax.jit
def seg_pc_T(uT, s):
    # scatter along lanes? segment on transposed [10, PC] via one-hot matmul
    # chunked: PC x N matmul infeasible; instead scatter-add rows
    return jnp.zeros((10, N), jnp.float32).at[:, s].add(uT)

@jax.jit
def gather_pack(src, idx):
    # one lax.gather: out[slot, w, tile] = src[w, idx[slot, tile]]
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(1,),
        start_index_map=(1,))
    return lax.gather(src, idx[..., None], dn, slice_sizes=(16, 1))

@jax.jit
def gather_pack_perchan(src, idx):
    outs = [jnp.take(src[w], idx) for w in range(10)]
    return outs

timeit(seg_full, (grad, seg), "segment_sum [cap*T,10] -> [N,10]")
timeit(seg_pc, (updPC, segPC), "segment_sum [PC,10] -> [N,10] unsorted")
timeit(seg_pc_sorted, (updPC, segs), "segment_sum [PC,10] -> [N,10] sorted flag")
timeit(seg_pc_T, (updPC_T, segPC), "scatter-add lanes [10,PC] -> [10,N]")
timeit(gather_pack, (src16, idx2d), "ONE lax.gather pack [16,PC]->[cap,16,T]")
timeit(gather_pack_perchan, (src16, idx2d), "per-chan take x10 [cap,T]")
