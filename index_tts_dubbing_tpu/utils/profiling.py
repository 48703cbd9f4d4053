"""Profiling & metrics utilities.

Replaces the reference's manual perf_counter spans + RTF prints
(infer.py:293,339-341,476-483,632-642) with:
- ``stage_timer``: accumulating wall-clock spans per stage;
- ``trace``: a jax.profiler trace context (view with TensorBoard/XProf);
- ``Metrics``: audio-seconds/s/chip, decode tokens/s, vocoder RTF counters —
  the BASELINE.md tracked metrics.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


@dataclass
class Metrics:
    decode_tokens: int = 0
    decode_seconds: float = 0.0
    vocoder_seconds: float = 0.0
    audio_seconds: float = 0.0
    wall_seconds: float = 0.0
    chips: int = 1

    @property
    def decode_tokens_per_s(self) -> float:
        return self.decode_tokens / max(self.decode_seconds, 1e-9)

    @property
    def vocoder_rtf(self) -> float:
        return self.vocoder_seconds / max(self.audio_seconds, 1e-9)

    @property
    def rtf(self) -> float:
        return self.wall_seconds / max(self.audio_seconds, 1e-9)

    @property
    def audio_seconds_per_s_per_chip(self) -> float:
        return self.audio_seconds / max(self.wall_seconds, 1e-9) / self.chips

    def as_dict(self) -> Dict[str, float]:
        return {
            "rtf": self.rtf,
            "decode_tokens_per_s": self.decode_tokens_per_s,
            "vocoder_rtf": self.vocoder_rtf,
            "audio_seconds_per_s_per_chip": self.audio_seconds_per_s_per_chip,
        }


class StageTimer:
    """Accumulates wall-clock per named stage."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = (self.totals.get(name, 0.0)
                                 + time.perf_counter() - t0)

    def report(self) -> str:
        return " ".join(f"{k}={v:.2f}s" for k, v in self.totals.items())


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
