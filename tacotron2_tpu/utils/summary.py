"""Training summaries: scalar metrics + profiler hooks.

Replaces the reference's TensorBoard summary functions
(code/tacotron/train.py:67-102, code/wavenet_vocoder/train.py:41-64) with a
host-side writer that always emits an append-only JSONL metrics stream (easy
to plot/join offline) and, when torch's TensorBoard writer is importable,
mirrors scalars into event files for live dashboards.

Also provides the `jax.profiler` trace hook the reference lacked entirely
(SURVEY §5 "Tracing/profiling: none"): `ProfilerHook` starts a device trace
at `start_step` and stops it at `end_step`, writing a TensorBoard-loadable
trace under `<log_dir>/profile/`.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class SummaryWriter:
    """Scalar metrics → metrics.jsonl (+ optional TensorBoard events)."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                       encoding="utf-8", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter as TBWriter
                self._tb = TBWriter(os.path.join(log_dir, "events"))
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: Dict[str, float],
                prefix: str = "") -> None:
        row = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            try:
                row[prefix + k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(row) + "\n")
        if self._tb is not None:
            for k, v in row.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, int(step))

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class ProfilerHook:
    """Start/stop a jax.profiler device trace over a step window."""

    def __init__(self, log_dir: str, start_step: Optional[int] = None,
                 end_step: Optional[int] = None):
        self.trace_dir = os.path.join(log_dir, "profile")
        self.start_step = start_step
        self.end_step = end_step if end_step is not None else (
            start_step + 5 if start_step is not None else None)
        self._active = False

    def step(self, step: int) -> None:
        if self.start_step is None:
            return
        import jax
        if not self._active and step >= self.start_step and step < self.end_step:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif self._active and step >= self.end_step:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
