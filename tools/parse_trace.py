"""Parse a jax.profiler xplane trace into per-op device-time totals.

The speed-of-light witness (VERDICT r4 next #2): tools/tpu_profile_job.py
captures 5 production lite iterations; this script aggregates the device
plane's event durations per op and per line (queue), so bench.py's
op-count model can be reconciled against hardware-measured kernel time
and DMA overlap.

Usage: python tools/parse_trace.py /tmp/jax_trace_eqtl [n_iters]
"""
import glob
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main(logdir, n_iters=5):
    paths = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no .xplane.pb under", logdir)
        return 1
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as fh:
            xs.ParseFromString(fh.read())
        print(f"== {path}")
        for plane in xs.planes:
            if not plane.lines:
                continue
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            print(f"-- plane: {plane.name}")
            for line in plane.lines:
                per_op = defaultdict(int)
                t_lo, t_hi = None, 0
                for ev in line.events:
                    per_op[meta.get(ev.metadata_id, "?")] += ev.duration_ps
                    lo = ev.offset_ps
                    t_lo = lo if t_lo is None else min(t_lo, lo)
                    t_hi = max(t_hi, lo + ev.duration_ps)
                if not per_op:
                    continue
                busy_ms = sum(per_op.values()) / 1e9
                span_ms = (t_hi - (t_lo or 0)) / 1e9
                print(f"   line {line.name!r}: {len(line.events)} events, "
                      f"busy {busy_ms:.3f} ms over span {span_ms:.3f} ms "
                      f"(busy/iter {busy_ms / n_iters:.3f})")
                top = sorted(per_op.items(), key=lambda kv: -kv[1])[:12]
                for name, ps in top:
                    print(f"      {ps/1e9:9.3f} ms  {ps/1e9/n_iters:8.3f} "
                          f"ms/iter  {name[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_eqtl",
                  int(sys.argv[2]) if len(sys.argv) > 2 else 5))
