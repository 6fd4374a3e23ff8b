"""Aggregate a jax.profiler xplane trace into per-op device-time totals.

Parses the XSpace protobuf directly (the tensorboard_plugin_profile
converter in this image is version-skewed against TF), finds the TPU device
plane, and sums event durations grouped by op name — the round-3 trace
workflow (/tmp/agg_xe.py) rebuilt as a repo tool.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python tools/agg_trace.py /tmp/jtrace_r4 [--top 40] [--by-class]

(The env var is required: the bundled *_pb2 modules predate protobuf 4's
generated-code check; pure-python parsing side-steps it.)
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import os
import re
import sys


def load_xspaces(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        sys.exit(f"no *.xplane.pb under {trace_dir}")
    for p in paths:
        xs = xplane_pb2.XSpace()
        data = open(p, "rb").read()
        if p.endswith(".gz"):
            data = gzip.decompress(data)
        xs.ParseFromString(data)
        yield p, xs


CLASSES = [
    ("window-attn kernel", re.compile(r"fused_block|window_attn|wa_band|band_attn|_attn_kernel|block_step")),
    ("fused-MLP kernel", re.compile(r"mlp_kernel|fused_mlp|lnlin|ln_linear")),
    ("MSDA kernel", re.compile(r"msda|gather_matmul|deform")),
    ("matmul/conv", re.compile(r"dot|conv")),
    ("copy/layout", re.compile(r"copy|transpose|reshape|bitcast")),
    ("fusion (elementwise)", re.compile(r"fusion")),
    ("dynamic-update/gather", re.compile(r"dynamic|gather|scatter|select")),
    ("reduce/softmax", re.compile(r"reduce|softmax|exponential")),
]


def classify(name: str) -> str:
    low = name.lower()
    for label, rx in CLASSES:
        if rx.search(low):
            return label
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by-class", action="store_true")
    args = ap.parse_args()

    per_op: collections.Counter = collections.Counter()
    per_line: collections.Counter = collections.Counter()
    for path, xs in load_xspaces(args.trace_dir):
        for plane in xs.planes:
            # device planes: '/device:TPU:0 ...'; CPU runs put XLA op events
            # on the '/host:CPU' plane's client line (useful for smoke tests)
            if not ("TPU" in plane.name or plane.name.startswith("/device")
                    or plane.name == "/host:CPU"):
                continue
            meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
            for line in plane.lines:
                if line.name == "python":  # host python-thread spans, not ops
                    continue
                for ev in line.events:
                    name = meta.get(ev.metadata_id, f"id{ev.metadata_id}")
                    dur_ms = ev.duration_ps / 1e9
                    per_line[(plane.name, line.name)] += dur_ms
                    per_op[name] += dur_ms

    print("== line totals (ms) ==")
    for (plane, line), ms in per_line.most_common(12):
        print(f"{ms:10.2f}  {plane} :: {line}")

    if args.by_class:
        by_cls: collections.Counter = collections.Counter()
        for name, ms in per_op.items():
            by_cls[classify(name)] += ms
        print("\n== by class (ms, XLA-Ops lines) ==")
        for cls, ms in by_cls.most_common():
            print(f"{ms:10.2f}  {cls}")

    print(f"\n== top {args.top} ops (ms) ==")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms:10.2f}  {name[:120]}")


if __name__ == "__main__":
    main()
