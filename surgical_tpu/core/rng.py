"""Counter-based RNG discipline.

The reference synchronizes augmentations across a clip (and across the
img/segmap/flow triple) by reseeding Python's global RNG with a shared
counter — ``random.seed(count // sequence_length)`` inside each transform's
``__call__`` (data_process.py:77,92,106-108). That is a cross-worker hazard
(SURVEY §5 "race detection"). Here the same *semantics* — identical geometry
for every frame of a clip and for all modalities of a frame — fall out of
pure key derivation: every consumer folds the same (epoch, clip) coordinates
into a root key, so the clip key is identical no matter which host/worker/
device computes it, and distinct across clips/epochs.
"""

from __future__ import annotations

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def epoch_key(key: jax.Array, epoch: int | jax.Array) -> jax.Array:
    return jax.random.fold_in(key, epoch)


def clip_key(key: jax.Array, clip_index: int | jax.Array) -> jax.Array:
    """Key shared by every frame of a clip and every modality of the triple —
    the functional replacement for ``random.seed(count // seq_len)``."""
    return jax.random.fold_in(key, clip_index)


def host_rng(key: jax.Array, *coords: int):
    """numpy Generator deterministically derived from a JAX key + integer
    coordinates — for HOST-side shuffles (epoch orderings, samplers) that
    must follow the same single-key discipline as the device side instead
    of ad-hoc ``np.random.default_rng(epoch)`` seeding."""
    import numpy as np

    data = np.asarray(jax.random.key_data(key)).ravel().astype(np.uint32)
    return np.random.default_rng(list(data) + [c & 0xFFFFFFFF for c in coords])


def named_key(key: jax.Array, name: str) -> jax.Array:
    """Stable per-purpose subkey (e.g. 'crop', 'flip', 'jitter')."""
    # Fold a stable hash of the name; zlib.crc32 is deterministic across runs.
    import zlib

    return jax.random.fold_in(key, zlib.crc32(name.encode()) & 0x7FFFFFFF)
