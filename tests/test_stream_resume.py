"""CT-SB resume/checkpoint and random-access decode tests."""

import pickle

import numpy as np

from cpprcoder_tpu.codecs.stream import (
    SuperblockEncoder,
    stream_decode,
    stream_decode_range,
    stream_encode,
)


def _data(n=100_000):
    rng = np.random.default_rng(17)
    return bytes(rng.integers(0, 48, n, dtype=np.uint8))


def test_incremental_matches_oneshot():
    data = _data()
    enc = SuperblockEncoder("rans", sb_log2=14)
    for i in range(0, len(data), 7001):  # misaligned chunks
        enc.feed(data[i:i + 7001])
    blob = enc.finish()
    assert blob == stream_encode(data, codec="rans", sb_log2=14)
    assert stream_decode(blob) == data


def test_checkpoint_resume_after_crash():
    data = _data()
    enc = SuperblockEncoder("adaptive_range", sb_log2=14)
    enc.feed(data[:40_000])
    ckpt = pickle.loads(pickle.dumps(enc.checkpoint()))  # survives a restart
    enc2 = SuperblockEncoder.resume(ckpt)
    enc2.feed(data[40_000:])
    blob = enc2.finish()
    assert blob == stream_encode(data, codec="adaptive_range", sb_log2=14)
    assert stream_decode(blob) == data


def test_checkpoint_rejects_garbage():
    import pytest

    with pytest.raises(ValueError):
        SuperblockEncoder.resume({"format": "nope"})


def test_decode_range():
    data = _data()
    blob = stream_encode(data, codec="rans", sb_log2=14)
    for start, stop in [(0, 100), (16_000, 16_500), (16_383, 32_800),
                        (99_000, 100_000), (5, 5)]:
        assert stream_decode_range(blob, start, stop) == data[start:stop]


def test_empty_stream():
    enc = SuperblockEncoder("rans")
    blob = enc.finish()
    assert stream_decode(blob) == b""
    assert stream_decode_range(blob, 0, 0) == b""
