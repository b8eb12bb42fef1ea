"""XXH32_u32 parity (vectors generated from the vendored reference C
implementation, test/xxhash.h:1970-1973) and hash twin equality."""

import numpy as np

from cpprcoder_tpu.core.hashing import xxh32_u32, xxh32_u32_jnp, xxh32_u32_np

# (seed, value) -> XXH32_u32 ground truth from the reference binary
VECTORS = [
    (0, 0, 148298089),
    (0, 1, 4089149075),
    (0, 0xDEADBEEF, 3836405457),
    (0, 0x811C9DC5, 2452658991),
    (0, 0xFFFFFFFF, 67608159),
    (0x811C9DC5, 0, 3147468807),
    (0x811C9DC5, 1, 1556904028),
    (0x811C9DC5, 0xDEADBEEF, 29120111),
    (0x811C9DC5, 0x811C9DC5, 2237972417),
    (0x811C9DC5, 0xFFFFFFFF, 787953009),
]


def test_scalar_matches_reference_vectors():
    for seed, value, expect in VECTORS:
        assert xxh32_u32(value, seed) == expect


def test_numpy_and_jnp_twins():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1 << 32, 1000, dtype=np.uint32)
    for seed in (0, 0x811C9DC5):
        h_np = xxh32_u32_np(vals, seed)
        h_jx = np.asarray(xxh32_u32_jnp(jnp.asarray(vals), seed))
        assert (h_np == h_jx).all()
        for i in range(0, 1000, 97):
            assert int(h_np[i]) == xxh32_u32(int(vals[i]), seed)
