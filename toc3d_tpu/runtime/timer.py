"""Hierarchical wall-clock timing harness reproducing the reference's
speed-test protocol.

Parity target: reference models/utils/gpu_timer.py (GPUTimer:6,
GlobalGPUTimer:28, GLOBAL_TIMER:129): 'A/B' hierarchical event names,
device-synchronized spans, warmup of 200 samples, mean/min/max tree printed
every 50 samples (README.md:113-123 protocol).

TPU adaptation: torch.cuda.synchronize() becomes a host fetch of a tiny
array (jax.block_until_ready does not reliably block through the axon
tunnel — see bench.py), applied by the caller via sync_fn.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Callable, Dict, Optional


class GlobalTimer:
    def __init__(self, warmup: int = 200, log_interval: int = 50,
                 sync_fn: Optional[Callable] = None):
        self.warmup = warmup
        self.log_interval = log_interval
        self.sync_fn = sync_fn
        self.activate = False
        self.reset()

    def reset(self):
        self._starts: Dict[str, float] = {}
        self._samples = defaultdict(list)
        self._count = 0

    def set_activate(self, activate: bool):
        self.activate = activate

    def set_sync(self, sync_fn: Callable):
        self.sync_fn = sync_fn

    def _sync(self):
        if self.sync_fn is not None:
            self.sync_fn()

    def event_start(self, name: str):
        if not self.activate:
            return
        self._sync()
        self._starts[name] = time.perf_counter()

    def event_end(self, name: str):
        if not self.activate or name not in self._starts:
            return
        self._sync()
        dt = time.perf_counter() - self._starts.pop(name)
        if self._count >= self.warmup:
            self._samples[name].append(dt * 1000.0)

    @contextmanager
    def span(self, name: str):
        self.event_start(name)
        try:
            yield
        finally:
            self.event_end(name)

    def update_time_count(self):
        if self.activate:
            self._count += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._samples.items():
            if xs:
                out[name] = {"mean": sum(xs) / len(xs), "min": min(xs),
                             "max": max(xs), "n": len(xs)}
        return out

    def log(self, force: bool = False):
        if not self.activate:
            return
        if not force and (self._count < self.warmup
                          or (self._count - self.warmup)
                          % self.log_interval != 0):
            return
        s = self.summary()
        if not s:
            return
        print(f"=== timing after {self._count} samples "
              f"(warmup {self.warmup}) ===")
        # hierarchical 'A/B' tree print (gpu_timer.py:80-120)
        for name in sorted(s):
            depth = name.count("/")
            leaf = name.split("/")[-1]
            m = s[name]
            print(f"{'  ' * depth}{leaf}: mean {m['mean']:.2f} ms  "
                  f"min {m['min']:.2f}  max {m['max']:.2f}  (n={m['n']})")


GLOBAL_TIMER = GlobalTimer()
