"""On-device expand-kernel parity sweep (dev tool).

Compares expand_slab(force_pallas=True) vs the XLA gather path across
configs (incl. the cap=512/T=256 combo that miscompared before the
roll-shift and MXU-precision fixes). Run ALONE (one TPU process).
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

from bloomscene_tpu.ops.pallas.expand import expand_slab

rng = np.random.default_rng(0)
fails = 0
for (cap, T, PCp) in [(512, 256, 262144), (640, 1024, 196608),
                      (128, 256, 20000), (256, 64, 8192),
                      (1024, 1024, 524288), (512, 256, 1000)]:
    R = 10
    width = PCp + cap
    asT = rng.normal(size=(R, width)).astype(np.float32)
    # t_start: sorted, in [0, PCp] inclusive (searchsorted semantics),
    # including edge values 0 and PCp
    ts = np.sort(rng.integers(0, PCp + 1, (T,))).astype(np.int32)
    ts[0] = 0
    ts[-1] = PCp
    asT_j = jnp.asarray(asT)
    ts_j = jnp.asarray(ts)

    ref = jax.jit(lambda a, t: expand_slab(a, t, cap, T,
                                           force_pallas=False))(asT_j, ts_j)
    got = jax.jit(lambda a, t: expand_slab(a, t, cap, T,
                                           force_pallas=True))(asT_j, ts_j)
    md = float(jnp.max(jnp.abs(ref - got)))
    tag = "OK " if md == 0.0 else "FAIL"
    if md != 0.0:
        fails += 1
        bad = np.argwhere(np.asarray(ref != got))
        print(f"{tag} cap={cap} T={T} PCp={PCp} maxdiff={md:g} "
              f"nbad={bad.shape[0]} first={bad[:3].tolist()}")
    else:
        print(f"{tag} cap={cap} T={T} PCp={PCp} maxdiff=0")
sys.exit(1 if fails else 0)
