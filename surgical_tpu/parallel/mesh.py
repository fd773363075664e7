"""Device mesh and sharding helpers.

The reference's only multi-device hook is single-process
``torch.nn.DataParallel`` during LFB extraction (generate_evp_LFB.py:431).
Here data parallelism is first-class: a 1-D ``data`` mesh over all chips,
batch sharded on it, parameters replicated, gradients reduced by XLA
all-reduce over ICI (DCN transparently across hosts). Models at this scale
(MiT-B3 ≈ 45M params) need no parameter sharding, but the helpers accept an
arbitrary mesh so tp axes can be added later without touching call sites.

CPU testing: ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` gives an
8-device virtual mesh (tests/conftest.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch: Any, axis: str = DATA_AXIS) -> Any:
    """Place every array in `batch` with its leading dim sharded on `axis`."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def pad_batch(batch: Any, target: int) -> tuple[Any, np.ndarray]:
    """Pad every array's leading dim to `target`; returns (padded, validity mask).

    Used so the last LFB-extraction batch divides evenly across the mesh
    without a recompile (replaces the reference's ragged last DataLoader
    batch, generate_evp_LFB.py:441-499).
    """
    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    mask = np.zeros((target,), dtype=bool)
    mask[:n] = True
    if n == target:
        return batch, mask

    def _pad(x):
        pad_width = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width)

    return jax.tree.map(_pad, batch), mask


def data_parallel_specs(params: Any, axis: str = DATA_AXIS):
    """(in_shardings, out_shardings) helper for a pjit'd train step: params
    replicated, batch sharded on `axis`."""
    param_spec = jax.tree.map(lambda _: P(), params)
    return param_spec, P(axis)
