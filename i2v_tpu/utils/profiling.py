"""Tracing / profiling subsystem (SURVEY.md §5).

The reference's observability is AverageMeter prints + per-step wall-clock
(reference.py:49-86, video_attacks.py:188,229, TPAMI_attack.py:255-256).
TPU-native equivalents:

  - :func:`trace`      — context manager around jax.profiler (TensorBoard
                         trace of device execution)
  - :class:`StepTimer` — steps/sec + clips/sec meter with periodic reports
                         (the BASELINE.json headline metrics)
  - :func:`annotate`   — named TraceAnnotation spans visible in the trace
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Tracks attack throughput: steps/sec/chip and clips/sec end-to-end.

    ``n_chips``: how many chips the timed computation actually spans — 1 for
    the single-device attack classes (the default), the device count for the
    mesh-sharded runners. Dividing by the GLOBAL device count when the work
    runs on one chip would understate the per-chip headline metric.

    Per-call clip counts can vary (trailing partial batches):
    ``with timer(clips=len(batch)):`` records the actual count; the bare
    ``with timer:`` form uses ``clips_per_call``. A call whose body raises is
    NOT counted — partial elapsed time from failed batches would otherwise
    skew the reported throughput.
    """

    def __init__(self, steps_per_call: int, clips_per_call: int,
                 report_every: int = 5, log=print, n_chips: int = 1):
        self.steps_per_call = steps_per_call
        self.clips_per_call = clips_per_call
        self.report_every = report_every
        self.log = log
        self.n_chips = max(1, n_chips)
        self.calls = 0
        self.clips = 0
        self.elapsed = 0.0
        self._t0: Optional[float] = None
        self._pending_clips: Optional[int] = None

    def __call__(self, clips: Optional[int] = None) -> "StepTimer":
        self._pending_clips = clips
        return self

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, exc_type, exc, tb):
        t0, self._t0 = self._t0, None
        clips, self._pending_clips = self._pending_clips, None
        if exc_type is not None:
            return  # a failed call contributes no throughput
        self.elapsed += time.time() - t0
        self.calls += 1
        self.clips += self.clips_per_call if clips is None else clips
        if self.report_every and self.calls % self.report_every == 0:
            self.log(f"[throughput] {self.steps_per_sec_per_chip:.2f} "
                     f"attack steps/s/chip, {self.clips_per_sec:.2f} adv clips/s")

    @property
    def steps_per_sec_per_chip(self) -> float:
        if not self.elapsed:
            return 0.0
        return self.calls * self.steps_per_call / self.elapsed / self.n_chips

    @property
    def clips_per_sec(self) -> float:
        if not self.elapsed:
            return 0.0
        return self.clips / self.elapsed

    def summary(self) -> dict:
        return {
            "attack_steps_per_sec_per_chip": self.steps_per_sec_per_chip,
            "adv_clips_per_sec": self.clips_per_sec,
            "n_chips": self.n_chips,
            "calls": self.calls,
            "elapsed_s": self.elapsed,
        }
