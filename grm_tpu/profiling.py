"""Per-stage timing and profiling hooks.

The reference only measures total ``kover learn`` wall clock
(``bin/kover/kover:554-575`` -> ``running_time``). Rebuild adds (SURVEY.md
section 5): named stage timers with a report, throughput helpers
(k-mers/s/chip, genomes/s), and an optional ``jax.profiler`` trace context
for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict

__all__ = ["StageTimer", "jax_trace", "throughput"]


class StageTimer:
    """Collects named stage durations; nested stages are flattened by name."""

    def __init__(self):
        self.stages = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (time.time() - t0)

    @property
    def total(self):
        return sum(self.stages.values())

    def report(self):
        lines = ["Stage timings:"]
        for name, seconds in self.stages.items():
            lines.append("  %-32s %8.3fs" % (name, seconds))
        lines.append("  %-32s %8.3fs" % ("TOTAL", self.total))
        return "\n".join(lines)

    def as_dict(self):
        return dict(self.stages)


@contextlib.contextmanager
def jax_trace(log_dir):
    """Capture a jax.profiler trace (TensorBoard/Perfetto readable)."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput(n_kmers, n_genomes, seconds, n_chips=1):
    """Headline throughput numbers (BASELINE.md metric definitions)."""
    seconds = max(seconds, 1e-12)
    return {
        "kmers_per_s_per_chip": n_kmers / seconds / n_chips,
        "genomes_per_s": n_genomes / seconds,
        "seconds": seconds,
    }
