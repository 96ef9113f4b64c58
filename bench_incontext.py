"""In-context timer of the full fwd+bwd step in ONE process (dev tool).

The relay TPU's throughput drifts run-to-run (shared pool), so
cross-process comparisons are unreliable; this script compiles and times
FRESH copies of the full step back-to-back in one process so code-change
A/Bs are drift-visible. (Its original purpose — the gather-formulation
A/B — is decided and recorded in GATHER_AB_r05.json; the losing modes
were deleted from ops/tiles.py.)
"""
import time
import sys
import jax
import jax.numpy as jnp
from jax import lax

import bench_breakdown as bb


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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for i in range(reps):
        measure(f"full_step rep {i}")
