"""CT-RCQ Pallas kernels (interpret mode on CPU): container identity with
the oracle/XLA backends and round-trips. The real-TPU compiled path is
exercised by bench/device.py and the driver bench."""

import numpy as np
import pytest

from conftest import corpus_file

from cpprcoder_tpu.ops import rcq_pallas
from cpprcoder_tpu.reference import rcq_ref

rcq_pallas._INTERPRET = True


def _case(n, seed=0):
    rng = np.random.default_rng(seed)
    # mixed entropy: text-ish low values + random tail
    a = rng.integers(97, 123, n // 2, dtype=np.uint8)
    b = rng.integers(0, 256, n - n // 2, dtype=np.uint8)
    return np.concatenate([a, b]).tobytes()


@pytest.mark.parametrize("n", [1500, 4096])
def test_pallas_encode_identity(n):
    data = _case(n)
    blob_p = rcq_pallas.rcq_encode_pallas(data, lanes=128)
    blob_r = rcq_ref.rcq_encode(data, lanes=128)
    assert blob_p == blob_r


@pytest.mark.parametrize("n", [1500, 4096])
def test_pallas_decode_roundtrip(n):
    data = _case(n, seed=1)
    blob = rcq_ref.rcq_encode(data, lanes=128)
    assert rcq_pallas.rcq_decode_pallas(blob) == data


def test_pallas_small_input_padded_lanes():
    # k < MIN_LANES runs on a 128-wide padded grid; container identical
    data = b"tiny tiny tiny tiny " * 12
    blob = rcq_pallas.rcq_encode_pallas(data)
    assert blob == rcq_ref.rcq_encode(data)
    assert rcq_pallas.rcq_decode_pallas(blob) == data


@pytest.mark.parametrize("lanes", [32, 64])
def test_pallas_padded_lane_identity(lanes):
    data = _case(3000, seed=2)
    blob_p = rcq_pallas.rcq_encode_pallas(data, lanes=lanes)
    assert blob_p == rcq_ref.rcq_encode(data, lanes=lanes)
    assert rcq_pallas.rcq_decode_pallas(blob_p) == data


def test_pallas_corpus_file():
    data = corpus_file("fields.c")
    blob_p = rcq_pallas.rcq_encode_pallas(data, lanes=128)
    assert blob_p == rcq_ref.rcq_encode(data, lanes=128)
    assert rcq_pallas.rcq_decode_pallas(blob_p) == data
