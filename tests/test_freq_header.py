"""Packed frequency-table header tests (models/freq_header)."""

import numpy as np
import pytest

from cpprcoder_tpu.models.freq_header import (
    pack_freqs,
    packed_size,
    read_freqs,
    unpack_freqs,
)
from cpprcoder_tpu.models.static_table import normalize_freqs


def _tables():
    rng = np.random.default_rng(3)
    t = []
    # degenerate: one symbol holds the whole total (f = 65536)
    one = np.zeros(256, np.int64); one[65] = 1 << 16
    t.append(one)
    # two at the 2^15 boundary
    two = np.zeros(256, np.int64); two[0] = 1 << 15; two[255] = 1 << 15
    t.append(two)
    # uniform 256 each
    t.append(np.full(256, 256, np.int64))
    # realistic: normalized random counts
    for _ in range(5):
        counts = rng.integers(0, 5000, 256) * (rng.random(256) < 0.3)
        counts[0] += 1  # at least one present
        t.append(normalize_freqs(counts.astype(np.int64), 16).astype(np.int64))
    # boundary values around the escape class
    b = np.zeros(256, np.int64)
    b[:4] = [(1 << 14) - 1, 1 << 14, (1 << 14) + 1, 1]
    b[4] = (1 << 16) - int(b[:4].sum())
    t.append(b)
    return t


def test_pack_unpack_roundtrip():
    for f in _tables():
        blob = pack_freqs(f)
        assert packed_size(blob[:128]) == len(blob)
        g = unpack_freqs(blob, expected_total=int(f.sum()))
        assert (g == f).all()


def test_reader_consumption():
    from cpprcoder_tpu.core.bytesutil import ByteReader

    f = _tables()[3]
    blob = pack_freqs(f) + b"TAIL"
    r = ByteReader(blob)
    g = read_freqs(r, int(f.sum()))
    assert (g == f).all()
    assert bytes(r.rest().tobytes()) == b"TAIL"


def test_header_smaller_than_raw_u16():
    text = np.zeros(256, np.int64)
    text[97:123] = 2000  # ~26 letters
    text[32] = 13000
    f = normalize_freqs(text, 16).astype(np.int64)
    assert len(pack_freqs(f)) < 256  # vs 512 raw


def test_total_mismatch_raises():
    f = _tables()[2]
    with pytest.raises(ValueError):
        unpack_freqs(pack_freqs(f), expected_total=12345)
