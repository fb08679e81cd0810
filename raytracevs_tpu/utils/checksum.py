"""Scene checksum for temporal-history reset decisions.

The reference FNV-1a-hashes the flattened scene each frame and resets the
denoiser history when it changes (DXRPipeline.cpp:2795-2880). We compute the
checksum on the host-side numpy staging buffers *before* device upload, so
it costs one fast blake2b pass and no device round-trip.
"""
from __future__ import annotations

import hashlib

import numpy as np


def scene_checksum(flat_scene) -> int:
    """Deterministic 64-bit checksum over every array in the pytree."""
    import jax

    h = hashlib.blake2b(digest_size=8)
    for leaf in jax.tree_util.tree_leaves(flat_scene):
        a = np.asarray(leaf)
        h.update(str(a.shape).encode())
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return int.from_bytes(h.digest(), "little")


def scene_data_checksum(scene) -> int:
    """Checksum of an evaluated SceneData — pure host side, no device pull."""
    import dataclasses

    h = hashlib.blake2b(digest_size=8)

    def feed(v):
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            for f in dataclasses.fields(v):
                feed(getattr(v, f.name))
        elif isinstance(v, (list, tuple)):
            h.update(b"[")
            for x in v:
                feed(x)
            h.update(b"]")
        elif isinstance(v, np.ndarray):
            h.update(v.astype(np.float64).tobytes())
        elif isinstance(v, (int, float, bool)):
            h.update(repr(float(v)).encode())
        else:
            h.update(repr(v).encode())

    feed(scene)
    return int.from_bytes(h.digest(), "little")
