"""Device mesh + sharding rules — ALL parallelism in the framework flows through here.

This replaces the reference's entire distributed stack (DDP over gloo for encoder
training apps/train_hybrid_encoder.py:45-50, NCCL for metrics calc_metrics.py:33-40,
rank-sharded InfiniteSampler torch_utils/misc.py:111, grad-sync gating misc.py:172):
one `jax.sharding.Mesh`, batch sharded over the 'data' axis, parameters replicated,
XLA inserting the all-reduces. Collectives ride ICI; a second 'slice' axis can be
added for multi-slice DCN scale-out without touching call sites.

The model (~30M params) needs no tensor/pipeline parallelism; throughput scaling is
pure DP, and within a chip the renderer's ray dimension is the parallel axis
(handled by XLA tiling / the Pallas ray-march kernel).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D data-parallel mesh by default. Multi-slice DCN scale-out: pass
    axis_names=('slice','data') with `shape=(n_slices, chips_per_slice)` — the
    OUTER axis should be the slower (DCN) interconnect so per-slice collectives
    ride ICI (scaling-book layout convention). Training steps shard the batch
    over ALL mesh axes (batch_sharding), so call sites are unchanged."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.array(devices)
    if len(axis_names) > 1:
        assert shape is not None and len(shape) == len(axis_names), (
            "multi-axis mesh needs an explicit shape per axis"
        )
        arr = arr.reshape(tuple(shape))
    return Mesh(arr, axis_names)


def dp_spec(mesh: Mesh, ndim: int) -> P:
    """PartitionSpec sharding dim 0 over EVERY mesh axis (pure DP on 1-D and
    multi-slice meshes alike)."""
    spec = [None] * ndim
    spec[0] = tuple(mesh.axis_names)
    return P(*spec)


def batch_sharding(mesh: Mesh, ndim: int, axis: Optional[str] = None) -> NamedSharding:
    """Shard dim 0, replicate the rest. Default: over all mesh axes (DP batch);
    pass a single axis name to shard over just that axis."""
    spec = [None] * ndim
    spec[0] = axis if axis is not None else tuple(mesh.axis_names)
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, tree, axis: Optional[str] = None):
    """Place a host pytree so dim 0 is split across the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim, axis)), tree
    )


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (parameters / optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_size(global_batch: int, mesh: Mesh, axis: Optional[str] = None) -> int:
    """Per-device batch under DP. Default: batch sharded over all mesh axes."""
    n = mesh.shape[axis] if axis is not None else mesh.devices.size
    assert global_batch % n == 0, f"batch {global_batch} not divisible by mesh axis {n}"
    return global_batch // n


def prefetch_to_device(loader, mesh: Mesh, size: int = 2,
                       axis: Optional[str] = None):
    """Wrap a host batch iterator so host->device transfer overlaps the
    running step: a daemon thread pulls batches and `shard_batch`-places them
    `size` deep ahead of the consumer (jax.device_put is thread-safe; the
    double-buffer replaces the reference DataLoader's pin_memory +
    non_blocking copy). Measured motivation: the flagship training LOOP ran
    5.06 imgs/s vs the 6.14 imgs/s device-bound step — the whole residual gap
    was the un-overlapped 4 MB compact-batch wire transfer per step (PERF.md
    round 4). Loader exceptions re-raise on the consumer thread."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))

    def worker():
        try:
            for batch in loader:
                q.put(shard_batch(mesh, batch, axis))
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if isinstance(item, BaseException):
            raise item
        yield item
