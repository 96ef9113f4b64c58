"""In-context A/B of gather formulations in ONE process (dev tool).

The relay TPU's throughput drifts run-to-run (shared pool), so
cross-process comparisons are unreliable; this script traces a FRESH
copy of the full fwd+bwd step per (ATTR_GATHER_MODE, GRAD_GATHER_MODE)
combo and times them back-to-back, interleaving a baseline re-measure so
drift is visible.
"""
import time
import sys
import jax
import jax.numpy as jnp
from jax import lax

import bench_breakdown as bb
from bloomscene_tpu.ops import tiles as tiles_lib


def make_run8():
    def body(_, carry):
        a, acc = carry
        l, g = jax.value_and_grad(bb.full_loss)(a)
        a = jax.tree.map(lambda p, gg: p - 1e-9 * gg, a, g)
        return a, acc + l

    def run8(a):
        return lax.fori_loop(0, 8, body, (a, jnp.float32(0)))
    return jax.jit(run8)


def measure(label):
    f = make_run8()
    t0 = time.time()
    o = jax.block_until_ready(f(bb.argsj))
    tc = time.time() - t0
    ts = []
    for _ in range(6):
        t0 = time.time()
        o = jax.block_until_ready(f(bb.argsj))
        ts.append(time.time() - t0)
    dt = min(ts) / 8 * 1e3
    print(f"{label:32s} {dt:8.3f} ms/step   (compile {tc:.0f}s)",
          flush=True)
    return dt


if __name__ == '__main__':
    combos = [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0),
              (0, 1), (0, 2), (0, 3), (0, 0)]
    if len(sys.argv) > 1:
        combos = [tuple(int(x) for x in c.split(','))
                  for c in sys.argv[1:]]
    for am, gm in combos:
        tiles_lib.ATTR_GATHER_MODE = am
        tiles_lib.GRAD_GATHER_MODE = gm
        measure(f"attr_mode={am} grad_mode={gm}")
