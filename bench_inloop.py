"""In-context sub-op timings: each op runs 8x inside one jitted fori_loop
with a data dependency, so layout folding and dispatch overhead can't fake
the numbers (dev tool).
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

PC = 196608          # packed pair list length (bench scene)
CAP = 640
T = 1024
N = 100_000
W = 16               # DATA_W
rng = np.random.default_rng(0)


def run8(stepval, args, name, iters=6):
    @jax.jit
    def loop(a):
        def body(_, carry):
            a, acc = carry
            v = stepval(a)
            a = jax.tree.map(lambda p: p + (1e-20 * v).astype(p.dtype), a)
            return a, acc + v
        return lax.fori_loop(0, 8, body, (a, jnp.float32(0)))

    o = loop(args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = loop(args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters / 8 * 1e3
    print(f"{name:52s} {dt:8.3f} ms/step")
    return dt


def consume(*xs):
    tot = jnp.float32(0)
    for x in xs:
        tot = tot + jnp.sum(x.astype(jnp.float32)) * 1e-12
    return tot


baseT = jnp.asarray(rng.normal(size=(10, N)).astype(np.float32))
gs = jnp.asarray(rng.integers(0, N, (PC,)).astype(np.int32))
t_start = jnp.asarray(np.sort(rng.integers(0, PC, (T,))).astype(np.int32))
slot = jnp.arange(CAP, dtype=jnp.int32)

args = (baseT,)

# A: the current full pack (gather+gather+transpose)
def pack_now(a):
    (bT,) = a
    asT = jnp.concatenate([
        jnp.pad(jnp.take(bT, gs, axis=1), ((0, W - 10), (0, 0))),
        jnp.zeros((W, CAP), jnp.float32)], 1)
    pgrid = jnp.minimum(t_start, PC)[None, :] + slot[:, None]
    out = jnp.take(asT, pgrid.reshape(-1), axis=1).reshape(W, CAP, T)
    return consume(jnp.transpose(out, (1, 0, 2)))


# B: no transpose ([W, cap, T] layout kept)
def pack_notrans(a):
    (bT,) = a
    asT = jnp.concatenate([
        jnp.pad(jnp.take(bT, gs, axis=1), ((0, W - 10), (0, 0))),
        jnp.zeros((W, CAP), jnp.float32)], 1)
    pgrid = jnp.minimum(t_start, PC)[None, :] + slot[:, None]
    out = jnp.take(asT, pgrid.reshape(-1), axis=1).reshape(W, CAP, T)
    return consume(out)


# C: 10 live rows only, no pad to 16
def pack_10(a):
    (bT,) = a
    asT = jnp.concatenate([
        jnp.take(bT, gs, axis=1), jnp.zeros((10, CAP), jnp.float32)], 1)
    pgrid = jnp.minimum(t_start, PC)[None, :] + slot[:, None]
    out = jnp.take(asT, pgrid.reshape(-1), axis=1).reshape(10, CAP, T)
    return consume(out)


# D: first gather only (id -> sorted order)
def pack_first(a):
    (bT,) = a
    return consume(jnp.take(bT, gs, axis=1))


# E: expansion gather only (from a pre-sorted table)
asT_fixed = jnp.asarray(rng.normal(size=(W, PC + CAP)).astype(np.float32))


def pack_expand(a):
    (bT,) = a
    tab = asT_fixed + bT[0, 0] * 1e-20
    pgrid = jnp.minimum(t_start, PC)[None, :] + slot[:, None]
    return consume(jnp.take(tab, pgrid.reshape(-1), axis=1))


# F: transpose alone
big = jnp.asarray(rng.normal(size=(W, CAP, T)).astype(np.float32))


def trans_only(a):
    (bT,) = a
    x = big + bT[0, 0] * 1e-20
    return consume(jnp.transpose(x, (1, 0, 2)))


# G: sorts in-loop
keys = jnp.asarray(rng.integers(0, 2 ** 30, (PC,)).astype(np.int32))


def sort2(a):
    (bT,) = a
    k = keys + (bT[0, 0] * 1e-20).astype(jnp.int32)
    ks, ps = lax.sort((k, gs), num_keys=1, is_stable=False)
    return consume(ks, ps)


dk = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
p1 = jnp.asarray(rng.integers(0, 2 ** 30, (N,)).astype(np.int32))


def sort_presort(a):
    (bT,) = a
    k = dk + bT[0, 0] * 1e-20
    o = lax.sort((k, p1, p1, p1), num_keys=1, is_stable=True)
    return consume(*o)


def gather655(a):
    (bT,) = a
    tab = asT_fixed + bT[0, 0] * 1e-20
    idx = (jnp.minimum(t_start, PC)[None, :] + slot[:, None]).reshape(-1)
    return consume(jnp.take(tab, idx, axis=1))


if __name__ == '__main__':
    run8(pack_now, args, "pack A: full (2 gathers + transpose)")
    run8(pack_notrans, args, "pack B: no transpose [W,cap,T]")
    run8(pack_10, args, "pack C: 10 rows, no transpose")
    run8(pack_first, args, "pack D: first gather only [10, PC]")
    run8(pack_expand, args, "pack E: expansion gather only [16, cap*T]")
    run8(trans_only, args, "transpose [16,640,1024] -> (1,0,2)")
    run8(sort2, args, "sort 196K x 2 ops")
    run8(sort_presort, args, "sort 100K x 4 ops stable")


# ---- prototype ops for the scatter-slab redesign ----
CT = CAP * T
src_lane_np = rng.permutation(CT)[:PC].astype(np.int32)
src_lane_j = jnp.asarray(src_lane_np)
vals10 = jnp.asarray(rng.normal(size=(10, PC)).astype(np.float32))
rank_c_like = jnp.asarray(np.sort(rng.integers(0, N, (PC,))).astype(np.int32))
tab13 = jnp.asarray(rng.normal(size=(13, N)).astype(np.float32))
tab9 = tab13[:9]
tab16 = jnp.asarray(rng.normal(size=(16, N)).astype(np.float32))


def slab_scatter(a):
    (bT,) = a
    v = vals10 + bT[0, 0] * 1e-20
    out = jnp.zeros((10, CT), jnp.float32).at[:, src_lane_j].set(
        v, unique_indices=True, mode='drop')
    return consume(out)


def pg9(a):
    (bT,) = a
    t = tab9 + bT[0, 0] * 1e-20
    return consume(jnp.take(t, rank_c_like, axis=1))


def pg13(a):
    (bT,) = a
    t = tab13 + bT[0, 0] * 1e-20
    return consume(jnp.take(t, rank_c_like, axis=1))


def pg16(a):
    (bT,) = a
    t = tab16 + bT[0, 0] * 1e-20
    return consume(jnp.take(t, rank_c_like, axis=1))


def sort1(a):
    (bT,) = a
    k = keys + (bT[0, 0] * 1e-20).astype(jnp.int32)
    (ks,) = lax.sort((k,), num_keys=1, is_stable=False)
    return consume(ks)


def presort3(a):
    (bT,) = a
    k = dk + bT[0, 0] * 1e-20
    o = lax.sort((k, p1, p1), num_keys=1, is_stable=True)
    return consume(*o)


se_idx = jnp.asarray(rng.permutation(N).astype(np.int32))
sv = jnp.asarray(rng.integers(0, PC, (N,)).astype(np.int32))


def scat_se(a):
    (bT,) = a
    v = sv + (bT[0, 0] * 1e-20).astype(jnp.int32)
    a1 = jnp.zeros((N,), jnp.int32).at[se_idx].set(v, unique_indices=True)
    a2 = jnp.zeros((N,), jnp.int32).at[se_idx].set(v + 1,
                                                   unique_indices=True)
    return consume(a1, a2)


ei = jnp.asarray(rng.permutation(max(PC, CT))[:PC].astype(np.int32))
so = jnp.asarray(rng.integers(0, CT, (PC,)).astype(np.int32))


def scat_srclane(a):
    (bT,) = a
    v = so + (bT[0, 0] * 1e-20).astype(jnp.int32)
    return consume(jnp.zeros((PC,), jnp.int32).at[
        jnp.minimum(ei, PC - 1)].set(v, unique_indices=True))


# emission-order gather from a slab-sized table (the reduce's src gather)
slab_tab = jnp.asarray(rng.normal(size=(10, CT + 128)).astype(np.float32))


def reduce_gather(a):
    (bT,) = a
    t = slab_tab + bT[0, 0] * 1e-20
    return consume(jnp.take(t, src_lane_j, axis=1))


if 'proto' in sys.argv:
    run8(slab_scatter, args, "slab scatter [10, cap*T] by 196K idx")
    run8(pg9, args, "pg gather 9 rows x 196K")
    run8(pg13, args, "pg gather 13 rows x 196K")
    run8(pg16, args, "pg gather 16 rows x 196K")
    run8(sort1, args, "sort 196K x 1 op")
    run8(presort3, args, "presort 100K x 3 ops stable")
    run8(scat_se, args, "starts/ends scatters 2 x 100K")
    run8(scat_srclane, args, "src_lane scatter 196K")
    run8(reduce_gather, args, "reduce src gather [10, cap*T+128] 196K idx")
