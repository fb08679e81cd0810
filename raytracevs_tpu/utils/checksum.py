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


def scene_content_checksum(scene) -> int:
    """FNV-1a over object geometry — the reference's exact history-reset key.

    Mirrors DXRPipeline.cpp:2795-2860 field-for-field: sphere center+radius,
    plane position, box center, and mesh-instance transform position. The
    camera, lights, materials and render settings are deliberately NOT
    hashed — camera motion must carry denoiser history across frames via
    motion-vector reprojection, not reset it.
    """
    from ..scene.data import BoxData, MeshObjectData, PlaneData, SphereData

    checksum = 0x811C9DC5
    prime = 0x01000193
    mask = (1 << 64) - 1

    def mix(c, values):
        for w in np.asarray(values, np.float32).ravel().view(np.uint32):
            c = ((c ^ int(w)) * prime) & mask
        return c

    for obj in scene.objects:
        if isinstance(obj, SphereData):
            checksum = mix(checksum, obj.position[:3])
            checksum = mix(checksum, [obj.radius])
        elif isinstance(obj, PlaneData):
            checksum = mix(checksum, obj.position[:3])
        elif isinstance(obj, BoxData):
            checksum = mix(checksum, obj.center[:3])
    for obj in scene.objects:
        if isinstance(obj, MeshObjectData):
            checksum = mix(checksum, obj.transform.position[:3])
    return checksum


def scene_data_checksum(scene) -> int:
    """Checksum of a full evaluated SceneData — pure host side.

    Unlike scene_content_checksum (the temporal-history reset key), this
    covers everything and is used to decide whether a scene re-flatten /
    re-upload is needed at all.
    """
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
