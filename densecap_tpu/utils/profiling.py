"""Stage timing + device profiling.

Replaces the reference's cutorch.synchronize-bracketed timeit
(LocalizationLayer.lua:219-230, utils.lua:57-64): a StageTimer for
host-side stage breakdowns (call block_until_ready inside a stage for
device-true numbers), and a thin wrapper over jax.profiler for XLA
traces (the TPU-native answer to per-op timing — the hand-tuned cudnn
algo table of net_utils.lua:33-49 has no equivalent here because XLA
autotunes).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    def __init__(self, enabled=True):
        self.enabled = enabled
        self.times = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self):
        parts = []
        for name in sorted(self.times):
            avg = self.times[name] / max(self.counts[name], 1)
            parts.append(f"{name}: {1000 * avg:.1f}ms")
        return "timing[" + ", ".join(parts) + "]"

    def reset(self):
        self.times.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(logdir="/tmp/densecap_trace"):
    """Capture an XLA profiler trace viewable in TensorBoard/xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
