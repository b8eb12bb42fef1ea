"""XXH32 of a single u32 value (reference parity: the custom XXH32_u32
addition in test/xxhash.h:359,1970-1973, used as the SLZ4 dictionary hash at
test/slz4.h:196-201).

Implemented from the public XXH32 specification for the 4-byte small-input
path; host (numpy) and device (jnp) twins. The CT-LZ4 match finder uses
exact substring ids instead of hashes, but the hash remains available for
hash-table style pipelines and is part of the component inventory.
"""

from __future__ import annotations

import numpy as np

P1 = 0x9E3779B1
P2 = 0x85EBCA77
P3 = 0xC2B2AE3D
P4 = 0x27D4EB2F
P5 = 0x165667B1
M = 0xFFFFFFFF


def _rotl(x, r):
    return ((x << r) | (x >> (32 - r))) & M


def xxh32_u32(value: int, seed: int = 0) -> int:
    """Scalar python reference."""
    h = (seed + P5 + 4) & M
    h = (h + value * P3) & M
    h = (_rotl(h, 17) * P4) & M
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h


def xxh32_u32_np(values: np.ndarray, seed: int = 0) -> np.ndarray:
    v = values.astype(np.uint32)
    with np.errstate(over="ignore"):
        h = np.uint32(seed + P5 + 4) + v * np.uint32(P3)
        h = ((h << np.uint32(17)) | (h >> np.uint32(15))) * np.uint32(P4)
        h ^= h >> np.uint32(15)
        h *= np.uint32(P2)
        h ^= h >> np.uint32(13)
        h *= np.uint32(P3)
        h ^= h >> np.uint32(16)
    return h


def xxh32_u32_jnp(values, seed: int = 0):
    import jax.numpy as jnp

    v = values.astype(jnp.uint32)
    h = jnp.uint32((seed + P5 + 4) & M) + v * jnp.uint32(P3)
    h = ((h << 17) | (h >> 15)) * jnp.uint32(P4)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(P2)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(P3)
    h = h ^ (h >> 16)
    return h
