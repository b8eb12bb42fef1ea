"""CT-ANS1 v2 Pallas kernels (interpret mode on CPU): container identity
with the XLA backend and round-trips through both directions."""

import numpy as np
import pytest

from conftest import corpus_file

from cpprcoder_tpu.ops import rans_ops, rans_pallas
from cpprcoder_tpu.reference import rans_ref

rans_pallas._INTERPRET = True


def _case(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(97, 123, n // 2, dtype=np.uint8)
    b = rng.integers(0, 256, n - n // 2, dtype=np.uint8)
    return np.concatenate([a, b]).tobytes()


@pytest.mark.parametrize("n", [1500, 4096])
def test_pallas_encode_identity(n):
    data = _case(n)
    assert (rans_pallas.rans_encode_pallas(data, lanes=128)
            == rans_ops.rans_encode_jax(data, lanes=128))


@pytest.mark.parametrize("n", [1500, 4096])
def test_pallas_decode_roundtrip(n):
    data = _case(n, seed=1)
    blob = rans_ops.rans_encode_jax(data, lanes=128)
    assert rans_pallas.rans_decode_pallas(blob) == data


def test_pallas_padded_lanes_and_corpus():
    data = corpus_file("grammar.lsp")      # k < 128 -> padded grid
    blob = rans_pallas.rans_encode_pallas(data)
    assert blob == rans_ops.rans_encode_jax(data)
    assert blob == rans_ref.rans_encode(data)
    assert rans_pallas.rans_decode_pallas(blob) == data


def test_pallas_single_symbol_run():
    # f == 16384 for the single symbol: the renorm test must not u32-wrap
    data = b"\x42" * 2000
    blob = rans_pallas.rans_encode_pallas(data, lanes=64)
    assert blob == rans_ref.rans_encode(data, lanes=64)
    assert rans_pallas.rans_decode_pallas(blob) == data


def test_wide_word_counts_single_lane():
    # >65535 words in one lane forces the u32 per-lane-count path: the
    # wide bit (lane_desc bit 7) must be set and all backends must agree
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
    ref = rans_ref.rans_encode(data, lanes=1)
    assert ref[4] & 0x80, "wide bit expected for 200 KB random at lanes=1"
    jx = rans_ops.rans_encode_jax(data, lanes=1)
    assert jx == ref
    assert rans_ref.rans_decode(ref) == data
    assert rans_ops.rans_decode_jax(jx) == data


def test_pallas_skewed_symbols():
    rng = np.random.default_rng(2)
    probs = np.array([2.0 ** -min(i // 16 + 1, 14) for i in range(256)])
    probs /= probs.sum()
    data = rng.choice(256, 3000, p=probs).astype(np.uint8).tobytes()
    blob = rans_pallas.rans_encode_pallas(data, lanes=64)
    assert blob == rans_ops.rans_encode_jax(data, lanes=64)
    assert rans_pallas.rans_decode_pallas(blob) == data
