"""Tracing / profiling / consistency utilities (SURVEY.md §5 aux subsystems).

Replaces the reference's torch profiler hooks (`misc.profiled_function`,
torch_utils/misc.py:100; record_function scopes inside networks) and the DDP
weight-hash consistency check (`check_ddp_consistency`, misc.py:183) with their
JAX-native equivalents."""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Optional

import jax
import numpy as np


def named_scope(name: str):
    """Profiler annotation scope (shows up in jax.profiler traces / XLA HLO names)."""
    return jax.named_scope(name)


def profiled_function(fn: Callable) -> Callable:
    """Wrap a function in a named profiler scope (misc.py:100 equivalent)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.named_scope(fn.__name__):
            return fn(*args, **kwargs)

    return wrapper


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Host-side step timing with device sync via scalar readback — the only
    reliable timing method on async/tunneled backends (see bench.py)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_fn: Optional[Callable] = None):
        t0 = time.perf_counter()
        yield
        if result_fn is not None:
            jax.block_until_ready(result_fn())
        self.times.append(time.perf_counter() - t0)

    @property
    def median_ms(self) -> float:
        return float(np.median(self.times) * 1000) if self.times else 0.0


def check_replica_consistency(tree) -> bool:
    """Verify a replicated pytree is bitwise identical across devices
    (check_ddp_consistency analog, misc.py:183-196). With NamedSharding
    replication XLA guarantees this; the check exists for debugging manual
    device_put flows."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = leaf.addressable_shards
        if len(shards) <= 1:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            if s.data.shape != ref.shape:
                continue  # actually sharded, not replicated
            if not np.array_equal(np.asarray(s.data), ref):
                return False
    return True


def debug_nans(enable: bool = True):
    """Global NaN checking (the reference's closest analog was nan-free constant
    caching, misc.py:22-46; JAX has a first-class switch)."""
    jax.config.update("jax_debug_nans", enable)
