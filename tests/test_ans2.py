"""CT-ANS2 adaptive rANS tests: oracle round-trip, jax container identity."""

import numpy as np

from cpprcoder_tpu.ops import ans2_ops
from cpprcoder_tpu.reference import ans2_ref
from tests.conftest import std_cases


def test_oracle_roundtrip():
    for data in std_cases():
        blob = ans2_ref.ans2_encode(data)
        assert ans2_ref.ans2_decode(blob) == data


def test_oracle_roundtrip_small_windows():
    rng = np.random.default_rng(21)
    data = bytes(rng.integers(0, 7, 10000, dtype=np.uint8))
    blob = ans2_ref.ans2_encode(data, lanes=4, refresh_log2=3)
    assert ans2_ref.ans2_decode(blob) == data


def test_jax_container_identity():
    for data in std_cases():
        ref = ans2_ref.ans2_encode(data)
        jx = ans2_ops.ans2_encode_jax(data)
        assert jx == ref
        assert ans2_ops.ans2_decode_jax(jx) == data


def test_adaptation_beats_static_rans(grammar):
    # on small text the adaptive model (no 512B header, local stats) must
    # beat the static CT-ANS1 container
    from cpprcoder_tpu.reference import rans_ref

    a = ans2_ref.ans2_encode(grammar)
    s = rans_ref.rans_encode(grammar)
    assert len(a) < len(s)


def test_registry_roundtrip():
    import cpprcoder_tpu as ct

    data = b"adaptive rans " * 999
    for backend in ("jax", "ref"):
        blob = ct.compress(data, codec="adaptive_rans", backend=backend)
        assert ct.decompress(blob, codec="adaptive_rans", backend=backend) == data
