"""Per-phase wall-clock timers + optional XLA trace capture.

The reference's observability is wall-clock bookkeeping (SURVEY §5: per-eval
cost timing in objective.py:71-76, cumulative stop condition bo.py:125-157) and
paramz's call-level memoization. The TPU-native equivalents:

- ``PhaseTimer``: accumulating named-phase timers with device-sync-aware stops
  (a device->host read barrier — see CLAUDE.md's TPU timing hazard);
- ``trace``: context manager around ``jax.profiler`` for XLA/TPU traces viewable
  in TensorBoard/Perfetto, when deep profiling is needed.

Usage::

    pt = PhaseTimer()
    with pt("fit"):
        fitted, _ = fitter(model, key)
        pt.sync(fitted.kern.variance)   # barrier inside the phase
    with pt("acq"):
        x, fx = acq_argmax(key)
        pt.sync(fx)
    print(pt.report())
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase: str):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            self.totals[phase] += time.perf_counter() - t0
            self.counts[phase] += 1

    @staticmethod
    def sync(x):
        """Device->host barrier: forces the enqueued computation to finish
        before the phase closes (block_until_ready may return early on the
        tunnel backend). Slices ONE element ON DEVICE before the host read —
        np.asarray(x) would materialize the whole array through the tunnel
        (~10 s for a Gram-sized output, CLAUDE.md hazards) and attribute the
        transfer to the phase being timed."""
        import numpy as np

        try:
            np.asarray(x.ravel()[0:1])  # device-side slice, 1-element transfer
        except AttributeError:  # plain host values (floats, numpy scalars)
            np.asarray(x)
        return x

    def report(self) -> str:
        lines = []
        for phase, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[phase]
            lines.append(f"{phase:>16s}: {total:8.3f} s  ({n} calls, "
                         f"{total / max(n, 1) * 1e3:8.2f} ms/call)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace (TensorBoard/Perfetto) around a block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
