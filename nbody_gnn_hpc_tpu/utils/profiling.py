"""Tracing / profiling hooks (SURVEY §5: the reference has only wall-clock
timers; we add ``jax.profiler`` integration on top of stage timers)."""

import contextlib
import time
from typing import Dict, Optional


class StageTimer:
    """Named wall-clock stage timers (superset of the reference's ad-hoc
    ``time.time()`` spans, ``run_demo.py:33-41``)."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{'stage':<30} {'seconds':>10}  {'share':>6}"]
        for name, t in sorted(self.times.items(), key=lambda kv: -kv[1]):
            share = (t / total * 100) if total else 0.0
            lines.append(f"{name:<30} {t:>10.3f}  {share:>5.1f}%")
        lines.append(f"{'total':<30} {total:>10.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture a TPU/XLA profiler trace viewable in TensorBoard/Perfetto.
    No-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (``jax.profiler.TraceAnnotation``)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
