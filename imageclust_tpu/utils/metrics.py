"""Stage timing + counters (SURVEY.md §5 tracing/observability).

The reference's only instrumentation is a wall-clock log line around the
whole run (internal/workflow/workflow.go:67, :106). Here every stage reports
duration and derived rates, and an optional ``jax.profiler`` trace captures
device timelines for TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field

log = logging.getLogger(__name__)

__all__ = ["RunMetrics", "StageTimer"]


@dataclass
class RunMetrics:
    stages: dict[str, float] = field(default_factory=dict)
    counters: dict[str, float] = field(default_factory=dict)

    def rate(self, counter: str, stage: str) -> float | None:
        if counter in self.counters and self.stages.get(stage):
            return self.counters[counter] / self.stages[stage]
        return None

    def to_dict(self) -> dict:
        out = {"stages_s": dict(self.stages), "counters": dict(self.counters)}
        embed_rate = self.rate("images", "embed")
        if embed_rate is not None:
            out["images_per_sec_embed"] = embed_rate
        return out


class StageTimer:
    def __init__(self, metrics: RunMetrics, profile_dir: str | None = None):
        self.metrics = metrics
        self.profile_dir = profile_dir

    @contextlib.contextmanager
    def stage(self, name: str):
        ctx = contextlib.nullcontext()
        if self.profile_dir:
            import jax

            ctx = jax.profiler.TraceAnnotation(name)
        start = time.perf_counter()
        with ctx:
            yield
        elapsed = time.perf_counter() - start
        self.metrics.stages[name] = self.metrics.stages.get(name, 0.0) + elapsed
        log.info("stage %-12s %.3fs", name, elapsed)

    @contextlib.contextmanager
    def profiled(self):
        """Wrap a whole run in a jax.profiler trace when profile_dir is set."""
        if not self.profile_dir:
            yield
            return
        import jax

        with jax.profiler.trace(self.profile_dir):
            yield
