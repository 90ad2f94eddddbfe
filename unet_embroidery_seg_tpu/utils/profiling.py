"""Profiling / observability helpers.

TPU-native replacement for the reference's minimal tracing (SURVEY.md §5:
`nvidia-smi` polled once per epoch, wall-clock timing, CUDA-synced inference
timing — /root/reference/train.py:33-45, predict.py:16-30):

  - ``device_memory_stats()``: per-device HBM usage straight from the PJRT
    client (no subprocess), printed in the per-epoch console table.
  - ``trace(logdir)``: context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace of the jitted steps (XLA op breakdown), used
    by ``train.py --profile``.
  - ``StepTimer``: steps/sec + images/sec/device counters with warmup skip.
"""

from __future__ import annotations

import contextlib
import time

import jax


def device_memory_stats() -> str:
    """Compact 'used/limit MB' HBM string for device 0 ('' if unsupported)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return ""
        used = stats.get("bytes_in_use", 0) / 2**20
        limit = stats.get("bytes_limit", 0) / 2**20
        if limit:
            return f"{used:.0f}/{limit:.0f}MB"
        return f"{used:.0f}MB"
    except Exception:
        return ""


@contextlib.contextmanager
def trace(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is falsy or unsupported."""
    if not logdir:
        yield
        return
    try:
        jax.profiler.start_trace(logdir)
    except Exception as e:  # relayed/virtual backends may not support tracing
        print(f"[WARN] profiler trace unavailable: {e}")
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
            print(f"[profile] trace written to {logdir}")
        except Exception as e:
            print(f"[WARN] profiler stop failed: {e}")


def safe_start_trace(logdir: str) -> bool:
    try:
        jax.profiler.start_trace(logdir)
        return True
    except Exception as e:
        print(f"[WARN] profiler trace unavailable: {e}")
        return False


def safe_stop_trace(logdir: str) -> None:
    try:
        jax.profiler.stop_trace()
        print(f"[profile] trace written to {logdir}")
    except Exception as e:
        print(f"[WARN] profiler stop failed: {e}")


class StepTimer:
    """Steps/sec + images/sec counter that skips the compile step."""

    def __init__(self, warmup_steps: int = 1):
        self.warmup_steps = warmup_steps
        self._seen = 0
        self._images = 0
        self._t0 = None

    def tick(self, n_images: int) -> None:
        self._seen += 1
        if self._seen <= self.warmup_steps:
            self._t0 = time.perf_counter()
            return
        self._images += n_images

    @property
    def images_per_sec(self) -> float:
        if self._t0 is None or self._images == 0:
            return 0.0
        return self._images / max(time.perf_counter() - self._t0, 1e-9)

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self._seen <= self.warmup_steps:
            return 0.0
        return (self._seen - self.warmup_steps) / max(
            time.perf_counter() - self._t0, 1e-9
        )
