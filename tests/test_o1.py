"""CT-RC3 order-1 adaptive coder tests."""

import pytest

from cpprcoder_tpu.ops import o1_ops
from cpprcoder_tpu.reference import o1_ref
from conftest import std_cases


@pytest.mark.parametrize("lanes", [1, 8])
def test_oracle_roundtrip(lanes):
    for data in std_cases():
        blob = o1_ref.o1_encode(data, lanes=lanes)
        assert o1_ref.o1_decode(blob) == data


@pytest.mark.parametrize("lanes", [1, 8])
def test_jax_container_identity(lanes):
    for data in [c for c in std_cases() if c][:6]:
        ref = o1_ref.o1_encode(data, lanes=lanes)
        jx = o1_ops.o1_encode_jax(data, lanes=lanes)
        assert jx == ref
        assert o1_ops.o1_decode_jax(jx) == data


def test_beats_reference_by_wide_margin(grammar):
    blob = o1_ref.o1_encode(grammar)
    assert len(blob) / len(grammar) < 0.55  # ref adaptive: 0.6195
