"""Capture a jax.profiler trace of the full fwd+bwd step; dump top ops (dev tool)."""
import glob, os, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from bench_breakdown import run8_full, argsj

o = jax.block_until_ready(run8_full(argsj))
os.system('rm -rf /tmp/jaxtrace')
with jax.profiler.trace('/tmp/jaxtrace'):
    o = jax.block_until_ready(run8_full(argsj))
    o = jax.block_until_ready(run8_full(argsj))

files = glob.glob('/tmp/jaxtrace/**/*.xplane.pb', recursive=True)
print("trace files:", files)
if not files:
    sys.exit(1)

from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
import json
# op profile via trace_viewer json is huge; use op_stats tools
for tool in ['op_profile', 'overview_page']:
    try:
        data, _ = rtd.xspace_to_tool_data(files, tool, {})
        with open(f'/tmp/jaxtrace/{tool}.json', 'w') as f:
            f.write(data if isinstance(data, str) else data.decode())
        print("wrote", tool)
    except Exception as e:
        print(tool, "failed:", e)
