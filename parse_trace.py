"""Parse an xplane.pb trace: aggregate TPU op durations (dev tool)."""
import glob, sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

files = sorted(glob.glob('/tmp/jaxtrace/**/*.xplane.pb', recursive=True))
xs = xplane_pb2.XSpace()
with open(files[-1], 'rb') as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if 'TPU' not in plane.name and 'tpu' not in plane.name:
        continue
    print(f"== plane: {plane.name}")
    ev_names = {k: v.name for k, v in plane.event_metadata.items()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for line in plane.lines:
        if 'XLA Ops' not in line.name and 'Steps' not in line.name \
                and line.name != 'XLA Modules' and 'Ops' not in line.name:
            continue
        print(f"  line: {line.name} events={len(line.events)}")
        if 'Ops' not in line.name:
            continue
        for ev in line.events:
            nm = ev_names.get(ev.metadata_id, '?')
            tot[nm] += ev.duration_ps / 1e9   # ms
            cnt[nm] += 1
    if tot:
        grand = sum(tot.values())
        print(f"  total op time: {grand:.3f} ms over {sum(cnt.values())} events")
        for nm, t in sorted(tot.items(), key=lambda kv: -kv[1])[:45]:
            print(f"   {t:9.3f} ms  x{cnt[nm]:5d}  {nm[:110]}")
