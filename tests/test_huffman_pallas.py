"""CT-HUF1 Pallas kernels (interpret mode on CPU): container identity with
the XLA backend and round-trips through both directions."""

import numpy as np
import pytest

from conftest import corpus_file

from cpprcoder_tpu.ops import huffman_ops, huffman_pallas

huffman_pallas._INTERPRET = True


def _case(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(97, 123, n // 2, dtype=np.uint8)
    b = rng.integers(0, 256, n - n // 2, dtype=np.uint8)
    return np.concatenate([a, b]).tobytes()


@pytest.mark.parametrize("n", [1500, 4096])
def test_pallas_encode_identity(n):
    data = _case(n)
    assert (huffman_pallas.huffman_encode_pallas(data, lanes=128)
            == huffman_ops.huffman_encode_jax(data, lanes=128))


@pytest.mark.parametrize("n", [1500, 4096])
def test_pallas_decode_roundtrip(n):
    data = _case(n, seed=1)
    blob = huffman_ops.huffman_encode_jax(data, lanes=128)
    assert huffman_pallas.huffman_decode_pallas(blob) == data


def test_pallas_padded_lanes_and_corpus():
    data = corpus_file("grammar.lsp")      # k < 128 -> padded grid
    blob = huffman_pallas.huffman_encode_pallas(data)
    assert blob == huffman_ops.huffman_encode_jax(data)
    assert huffman_pallas.huffman_decode_pallas(blob) == data


def test_pallas_skewed_symbols():
    # long codes (near max length) + single-symbol runs
    rng = np.random.default_rng(2)
    probs = np.array([2.0 ** -min(i // 16 + 1, 14) for i in range(256)])
    probs /= probs.sum()
    data = rng.choice(256, 3000, p=probs).astype(np.uint8).tobytes()
    blob = huffman_pallas.huffman_encode_pallas(data, lanes=64)
    assert blob == huffman_ops.huffman_encode_jax(data, lanes=64)
    assert huffman_pallas.huffman_decode_pallas(blob) == data
