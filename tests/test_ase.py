"""CT-ASE1 tests."""

import pytest

from cpprcoder_tpu.ops import ase_ops
from cpprcoder_tpu.reference import ase_ref
from conftest import std_cases


@pytest.mark.parametrize("lanes", [1, 8])
def test_oracle_roundtrip(lanes):
    for data in std_cases():
        blob = ase_ref.ase_encode(data, lanes=lanes)
        assert ase_ref.ase_decode(blob) == data


@pytest.mark.parametrize("lanes", [1, 8])
def test_jax_container_identity(lanes):
    for data in [c for c in std_cases() if c][:6]:
        ref = ase_ref.ase_encode(data, lanes=lanes)
        jx = ase_ops.ase_encode_jax(data, lanes=lanes)
        assert jx == ref
        assert ase_ops.ase_decode_jax(jx) == data


def test_corpus_file(grammar):
    blob = ase_ops.ase_encode_jax(grammar)
    assert blob == ase_ref.ase_encode(grammar)
    assert ase_ops.ase_decode_jax(blob) == grammar
