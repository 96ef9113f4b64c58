"""Microbench: alternative formulations of the two pair-sized gathers
and the src_of_p chain that dominate the post-pairs-kernel step (dev
tool; see BENCH_BREAKDOWN_r04.json trace_top_ops).

Run on the TPU. Each variant runs 8 dependent iterations per dispatch.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

N = 100_640          # attr table width (100000 splats + tile_cap pad)
PC = 196_608         # packed capacity
P = 221_184          # pair capacity
SLAB = 655_488       # 640*1024 + 128 pad
T = 1024

rng = np.random.default_rng(0)
attr = jnp.asarray(rng.normal(size=(10, N)).astype(np.float32))
gauss_s = jnp.asarray(rng.integers(0, N, PC).astype(np.int32))
src_lane = jnp.asarray(rng.integers(0, SLAB, P).astype(np.int32))
slabg = jnp.asarray(rng.normal(size=(10, SLAB)).astype(np.float32))

# src_of_p chain inputs
t_start = jnp.asarray(np.sort(rng.integers(0, PC, T)).astype(np.int32))
pos = jnp.asarray(rng.permutation(T).astype(np.int32))
tile_full = jnp.asarray(np.sort(rng.integers(0, T, P)).astype(np.int32))


def run8(f, *args):
    @jax.jit
    def go(args):
        def body(_, carry):
            args, acc = carry
            o = f(*args)
            s = sum(jnp.sum(x.astype(jnp.float32) * 1e-12) for x in o)
            args = tuple(a + (1e-20 * s).astype(a.dtype) for a in args)
            return args, acc + s
        return lax.fori_loop(0, 8, body, (args, jnp.float32(0)))
    o = go(args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(6):
        o = go(args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / 6 / 8 * 1e3


def attr_take_axis1(attr, gauss_s):
    return (jnp.take(attr, gauss_s, axis=1),)           # [10, PC]

def attr_take_rows(attr, gauss_s):
    at = attr.T                                          # [N, 10]
    return (jnp.take(at, gauss_s, axis=0),)              # [PC, 10]

def attr_take_1d(attr, gauss_s):
    return tuple(jnp.take(attr[i], gauss_s) for i in range(10))

def attr_take_1d_pairbitcast(attr, gauss_s):
    # pack 2 f32 rows -> 1 f64? not on TPU; instead gather 5x [2,N]->..
    a2 = attr.reshape(5, 2, -1)
    return tuple(jnp.take(a2[i], gauss_s, axis=1) for i in range(5))

def grad_take_axis1(slabg, src_lane):
    return (jnp.take(slabg, src_lane, axis=1),)          # [10, P]

def grad_take_rows(slabg, src_lane):
    return (jnp.take(slabg.T, src_lane, axis=0),)        # [P, 10]

def grad_take_1d(slabg, src_lane):
    return tuple(jnp.take(slabg[i], src_lane) for i in range(10))

def src_chain_take(t_start, pos, tile_full):
    pfull = jnp.arange(P, dtype=jnp.int32)
    live_p = (pfull < PC) & (tile_full < T)
    tcl = jnp.minimum(tile_full, T - 1)
    tp = jnp.take(jnp.stack([t_start, pos]), tcl, axis=1)
    slotp = pfull - tp[0]
    okp = live_p & (slotp >= 0) & (slotp < 640)
    return (jnp.where(okp, slotp * T + tp[1], 640 * T),)

def src_chain_cummax(t_start, pos, tile_full):
    # monotonic tile_full => t_start[tcl], pos[tcl] via scatter+cummax:
    # drop (t_start[t]*T + pos[t]) markers at slot t_start[t] (unique
    # for non-empty tiles; empty tiles' markers collide but with equal
    # t_start... need max combine) — use the rank trick: marker value
    # packs both fields; empty tiles produce no pairs so a plain set at
    # distinct out-of-range slots.
    pfull = jnp.arange(P, dtype=jnp.int32)
    tid = jnp.arange(T, dtype=jnp.int32)
    nonempty = jnp.concatenate([t_start[1:] > t_start[:-1],
                                jnp.array([True])])
    idx = jnp.where(nonempty, t_start, P + tid)
    val = (t_start.astype(jnp.float64) * (640 * T)
           + (pos + tid * 0).astype(jnp.float64))  # pack; f64 ok? no tpu
    # TPU: no f64 — pack into f32-safe range? t_start<2^18, pos<2^10 ->
    # t_start*1024+pos < 2^28 > 2^24. Use two cummaxes instead.
    m1 = jnp.zeros((P,), jnp.float32).at[idx].set(
        (t_start + 1).astype(jnp.float32), mode='drop',
        unique_indices=True)
    m2 = jnp.zeros((P,), jnp.float32).at[idx].set(
        (pos + 1).astype(jnp.float32), mode='drop', unique_indices=True)
    c1 = lax.cummax(m1) ; c2 = lax.cummax(m2)
    ts_p = c1.astype(jnp.int32) - 1
    pos_p = c2.astype(jnp.int32) - 1
    live_p = (pfull < PC) & (tile_full < T)
    slotp = pfull - ts_p
    okp = live_p & (slotp >= 0) & (slotp < 640) & (pos_p >= 0)
    return (jnp.where(okp, slotp * T + pos_p, 640 * T),)


if __name__ == '__main__':
    for name, f, args in [
        ('attr take axis1 [10,PC]', attr_take_axis1, (attr, gauss_s)),
        ('attr take rows [PC,10]', attr_take_rows, (attr, gauss_s)),
        ('attr take 10x 1D', attr_take_1d, (attr, gauss_s)),
        ('attr take 5x [2,]', attr_take_1d_pairbitcast, (attr, gauss_s)),
        ('grad take axis1 [10,P]', grad_take_axis1, (slabg, src_lane)),
        ('grad take rows [P,10]', grad_take_rows, (slabg, src_lane)),
        ('grad take 10x 1D', grad_take_1d, (slabg, src_lane)),
        ('src chain take', src_chain_take, (t_start, pos, tile_full)),
        ('src chain cummax', src_chain_cummax, (t_start, pos, tile_full)),
    ]:
        try:
            dt = run8(f, *args)
            print(f"{name:28s} {dt:8.3f} ms")
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__} {str(e)[:120]}")
