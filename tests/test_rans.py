"""CT-ANS1 rANS: oracle round-trip + JAX container identity."""

import pytest

from cpprcoder_tpu.ops import rans_ops
from cpprcoder_tpu.reference import rans_ref
from conftest import std_cases


@pytest.mark.parametrize("lanes", [1, 8, 32])
def test_oracle_roundtrip(lanes):
    for data in std_cases():
        blob = rans_ref.rans_encode(data, lanes=lanes)
        assert rans_ref.rans_decode(blob) == data


@pytest.mark.parametrize("lanes", [1, 8])
def test_jax_container_identity(lanes):
    for data in [c for c in std_cases() if c][:6]:
        ref = rans_ref.rans_encode(data, lanes=lanes)
        jx = rans_ops.rans_encode_jax(data, lanes=lanes)
        assert jx == ref
        assert rans_ops.rans_decode_jax(jx) == data


def test_corpus_file(grammar):
    blob = rans_ops.rans_encode_jax(grammar)
    assert blob == rans_ref.rans_encode(grammar)
    assert rans_ops.rans_decode_jax(blob) == grammar
