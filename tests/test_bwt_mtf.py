"""CT-BWT1 / CT-MTF1 and Config-4 pipeline tests."""

import numpy as np
import pytest

from cpprcoder_tpu.ops import bwt_ops, mtf_ops
from cpprcoder_tpu.reference import bwt_ref, mtf_ref


def _cases():
    rng = np.random.default_rng(5)
    return [
        b"banana" * 600,
        bytes(rng.integers(0, 4, 9000, dtype=np.uint8)),
        b"\x00" * 5000,
        bytes(rng.integers(0, 256, 2100, dtype=np.uint8)),
    ]


def test_bwt_oracle_roundtrip():
    for data in _cases() + [b"", b"x"]:
        blob = bwt_ref.bwt_encode(data, block_log2=10)
        assert bwt_ref.bwt_decode(blob) == data


def test_bwt_jax_identity():
    for data in _cases():
        ref = bwt_ref.bwt_encode(data, block_log2=10)
        jx = bwt_ops.bwt_encode_jax(data, block_log2=10)
        assert jx == ref
        assert bwt_ops.bwt_decode_jax(jx) == data


@pytest.mark.parametrize("mtf1", [False, True])
def test_mtf_oracle_roundtrip(mtf1):
    for data in _cases() + [b"", b"z"]:
        blob = mtf_ref.mtf_encode(data, mtf1)
        assert mtf_ref.mtf_decode(blob) == data


@pytest.mark.parametrize("mtf1", [False, True])
def test_mtf_jax_identity(mtf1):
    for data in _cases()[:2]:
        ref = mtf_ref.mtf_encode(data, mtf1)
        jx = mtf_ops.mtf_encode_jax(data, mtf1)
        assert jx == ref
        assert mtf_ops.mtf_decode_jax(jx) == data


def test_bwt_tail_decomposition():
    # 5000 = 4096 + 512 + 256 + 136raw at block_log2=15 (no full blocks)
    from cpprcoder_tpu.reference.bwt_ref import block_layout

    assert block_layout(5000, 15) == ([4096, 512, 256], 136)
    assert block_layout(32768 * 2 + 300, 15) == ([32768, 32768, 256], 44)
    assert block_layout(100, 15) == ([], 100)
    rng = np.random.default_rng(11)
    data = (b"tobeornottobe" * 400)[:5000] + bytes(
        rng.integers(0, 256, 77, dtype=np.uint8))
    ref = bwt_ref.bwt_encode(data, block_log2=15)
    jx = bwt_ops.bwt_encode_jax(data, block_log2=15)
    assert jx == ref
    assert bwt_ops.bwt_decode_jax(jx) == data
    assert bwt_ref.bwt_decode(ref) == data


def test_pipeline_config4(grammar):
    from cpprcoder_tpu.codecs.pipeline import pipeline_decode, pipeline_encode

    blob = pipeline_encode(grammar, stages=["blocksort", "mtf1", "adaptive_range"])
    assert pipeline_decode(blob) == grammar


def test_mtf1_matches_reference_semantics():
    # spot-check MTF-1 exact behavior (blksort.h:740-753): rank>1 → slot 1,
    # rank 1 swaps only when prev != 0, prev starts at 1
    data = bytes([5, 5, 7, 7, 5, 7, 5, 5])
    enc = mtf_ref.mtf_encode_block(np.frombuffer(data, np.uint8), True)
    dec = mtf_ref.mtf_decode_block(enc, True)
    assert dec.tobytes() == data
