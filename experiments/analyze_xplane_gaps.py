"""Timeline gap analysis of an xplane trace: per TPU-core op line, compute
wall = span of events, busy = union of op intervals, gap = wall - busy,
and histogram the gaps by size. This is the measurement behind PERF.md
finding 11 (the scheduler micro-gap pool).

Usage: python experiments/analyze_xplane_gaps.py /tmp/xplane_up [--min-ms 0.01]
"""

from __future__ import annotations

import argparse
import glob
import os
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--min-ms", type=float, default=0.01)
    ap.add_argument("--top-gaps", type=int, default=15)
    args = ap.parse_args()
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert files, f"no xplane.pb under {args.logdir}"
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                evs = sorted(
                    (ev.offset_ps / 1e9, (ev.offset_ps + ev.duration_ps) / 1e9,
                     meta.get(ev.metadata_id, "?"))
                    for ev in line.events
                )
                if not evs:
                    continue
                wall = evs[-1][1] - evs[0][0]
                # union of busy intervals + collect gaps with neighbours
                busy = 0.0
                gaps = []  # (gap_ms, prev_op, next_op)
                cur_s, cur_e, cur_n = evs[0]
                for s, e, nme in evs[1:]:
                    if s > cur_e:
                        gaps.append((s - cur_e, cur_n, nme))
                        busy += cur_e - cur_s
                        cur_s, cur_e, cur_n = s, e, nme
                    else:
                        if e > cur_e:
                            cur_e, cur_n = e, nme
                busy += cur_e - cur_s
                gap_tot = wall - busy
                print(f"\n{plane.name} / {line.name}: wall {wall:.1f} ms, "
                      f"busy {busy:.1f} ms, gaps {gap_tot:.1f} ms "
                      f"({len(gaps)} gaps)")
                hist = defaultdict(lambda: [0, 0.0])
                for g, _, _ in gaps:
                    b = ("<0.05" if g < 0.05 else "<0.2" if g < 0.2
                         else "<1" if g < 1 else ">=1")
                    hist[b][0] += 1
                    hist[b][1] += g
                for b in ("<0.05", "<0.2", "<1", ">=1"):
                    n, s = hist[b]
                    print(f"  gap {b:>6} ms: {n:5d} gaps, {s:8.1f} ms total")
                print("  largest gaps (after -> before):")
                for g, pn, nn in sorted(gaps, reverse=True)[:args.top_gaps]:
                    print(f"   {g:7.2f} ms  after {pn[:60]}")
                    print(f"              before {nn[:60]}")


if __name__ == "__main__":
    main()
