"""CT-RLE0 zero-run-length stage tests (oracle + jax identity)."""

import numpy as np

from cpprcoder_tpu.ops import rle0_ops
from cpprcoder_tpu.reference import rle0_ref


def _cases():
    rng = np.random.default_rng(7)
    return [
        b"",
        b"\x00",
        b"\x00" * 100000,               # one long run (multi-digit)
        b"a",
        b"\xfe\xff\x00\x00\xff\xfe",     # escapes adjacent to runs
        bytes([0, 1, 0, 0, 2, 0] * 500),
        bytes(rng.integers(0, 256, 4097, dtype=np.uint8)),
        bytes(rng.integers(0, 3, 9000, dtype=np.uint8)),   # MTF-like skew
        bytes(rng.integers(253, 256, 777, dtype=np.uint8)),  # escape heavy
        bytes([0] * 7 + [5] + [0] * 2 + [255] + [0] * 1),
    ]


def test_rle0_oracle_roundtrip():
    for data in _cases():
        blob = rle0_ref.rle0_encode(data)
        assert rle0_ref.rle0_decode(blob) == data


def test_rle0_digit_spec():
    # run of L zeros codes L+1's low bits, LSB first, dropping the MSB
    blob = rle0_ref.rle0_encode(b"\x00" * 10)  # L=10, L+1=1011b -> digits 1,1,0
    assert blob[4:] == bytes([1, 1, 0])
    blob = rle0_ref.rle0_encode(b"\x00")       # L=1, digits: 0
    assert blob[4:] == bytes([0])


def test_rle0_jax_identity():
    for data in _cases():
        ref = rle0_ref.rle0_encode(data)
        jx = rle0_ops.rle0_encode_jax(data)
        assert jx == ref
        assert rle0_ops.rle0_decode_jax(jx) == data


def test_rle0_registry_roundtrip():
    import cpprcoder_tpu as ct

    data = bytes(np.random.default_rng(0).integers(0, 5, 3000, dtype=np.uint8))
    for backend in ("jax", "ref"):
        blob = ct.compress(data, codec="rle0", backend=backend)
        assert ct.decompress(blob, codec="rle0", backend=backend) == data
