"""Summarize a jax.profiler trace: device-op wall attribution (VERDICT r2 #2).

Parses the ``*.xplane.pb`` written by ``jax.profiler.start_trace`` (proto
bundled with the image's tensorflow: ``tensorflow.tsl.profiler.protobuf``)
and aggregates per-op durations on the device plane(s) into buckets:

  * ``pallas``     — the flash-attention custom calls (kernel time)
  * ``fusion``     — XLA-fused elementwise/reduce work (norms, embedder glue)
  * ``convolution/dot`` — non-attention matmuls (dense stack)
  * ``copy/transpose/dynamic`` — layout + slice traffic
  * everything else by raw name

Also reports the busy fraction of the covered span per line (device idle =
dispatch gaps / host stalls).

Usage: python tools/trace_summary.py <trace_dir> [--top 15]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys


def load_xspaces(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as fp:
            xs.ParseFromString(fp.read())
        spaces.append((p, xs))
    return spaces


def classify(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "pallas" in n or "tpu_custom_call" in n or "flash" in n:
        return "pallas-attention"
    if n.startswith("fusion") or ".fusion" in n or "loop_fusion" in n:
        return "xla-fusion"
    if "dot" in n or "conv" in n or "matmul" in n or "einsum" in n:
        return "matmul"
    if "copy" in n or "transpose" in n or "dynamic-slice" in n or "dynamic-update" in n or "reshape" in n:
        return "copy/layout"
    if "infeed" in n or "outfeed" in n or "send" in n or "recv" in n or "all-" in n:
        return "transfer/collective"
    return "other"


def summarize(trace_dir: str, top: int = 15):
    spaces = load_xspaces(trace_dir)
    for path, xs in spaces:
        for plane in xs.planes:
            pname = plane.name
            # device planes hold the XLA op lines; skip pure host/python planes
            if not ("TPU" in pname or "/device:" in pname or "GPU" in pname or "CPU" in pname):
                continue
            ev_names = {i: m.name for i, m in plane.event_metadata.items()}
            per_op = collections.Counter()
            per_class = collections.Counter()
            span_lo, span_hi = None, 0
            busy = 0
            for line in plane.lines:
                for ev in line.events:
                    dur = ev.duration_ps
                    name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                    per_op[name] += dur
                    per_class[classify(name)] += dur
                    busy += dur
                    t0 = ev.offset_ps
                    span_lo = t0 if span_lo is None else min(span_lo, t0)
                    span_hi = max(span_hi, t0 + dur)
            if not per_op:
                continue
            span = max(span_hi - (span_lo or 0), 1)
            print(f"\n== plane: {pname}  ({os.path.basename(path)})")
            # busy can exceed span when nested lines overlap (op + sub-op
            # traces); per-class shares are what matter
            print(f"   covered span {span/1e9:.3f} ms, summed op time {busy/1e9:.3f} ms")
            total = sum(per_class.values())
            for cls, d in per_class.most_common():
                print(f"   {cls:22s} {d/1e9:10.3f} ms  {100.0*d/total:5.1f}%")
            print(f"   -- top {top} ops --")
            for name, d in per_op.most_common(top):
                print(f"   {d/1e9:10.3f} ms  {name[:90]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()
    sys.exit(summarize(args.trace_dir, args.top))
