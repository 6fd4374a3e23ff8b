"""Scalar logging without tensorboardX: append-only jsonl + optional TB.

The reference logs scalars through torch's SummaryWriter
(train_caption.py:65, caption_engine.py:133-141,352-363).  This writer keeps
the same call sites (``writer.scalar(tag, value, step)``) and writes a
greppable ``scalars.jsonl``; if tensorboardX happens to be installed it
mirrors to a real event file.
"""

from __future__ import annotations

import json
import os
import time


class ScalarWriter:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "scalars.jsonl")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(
                {"t": time.time(), "tag": tag, "value": float(value), "step": int(step)}
            ) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    # SummaryWriter-compat alias
    add_scalar = scalar

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
