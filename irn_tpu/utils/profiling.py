"""Profiler trace capture (the observability upgrade over the reference's
print-only telemetry, SURVEY 5).

Captures a short ``jax.profiler`` trace window inside a stage — steps
[start, stop) — so every stage can produce a TensorBoard-loadable trace
without drowning in data. Enabled by ``Config.profile_dir``."""

from __future__ import annotations

import os
from typing import Optional


class StageProfiler:
    def __init__(self, profile_dir: Optional[str], stage: str,
                 start: int = 2, stop: int = 5):
        self.dir = (
            os.path.join(profile_dir, stage) if profile_dir else None
        )
        self.start = start
        self.stop = stop
        self._count = 0
        self._active = False

    def tick(self) -> None:
        """Call once per step/image."""
        if self.dir is None:
            return
        import jax

        if self._count == self.start and not self._active:
            os.makedirs(self.dir, exist_ok=True)
            try:
                jax.profiler.start_trace(self.dir)
            except RuntimeError:
                # a previous stage's window was orphaned mid-trace by an
                # exception (its close() never ran): flush it so this
                # stage's capture can start instead of raising
                # "profiling is already in progress"
                jax.profiler.stop_trace()
                jax.profiler.start_trace(self.dir)
            self._active = True
        elif self._count == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
        self._count += 1

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
