"""Oracle (host) round-trip tests for CT-RC1/CT-RC2."""

import numpy as np
import pytest

from cpprcoder_tpu.reference import rc_ref
from conftest import std_cases


@pytest.mark.parametrize("lanes", [1, 2, 8, 32])
def test_static_roundtrip_cases(lanes):
    for data in std_cases():
        blob = rc_ref.static_encode(data, lanes=lanes)
        assert rc_ref.static_decode(blob) == data


@pytest.mark.parametrize("lanes", [1, 8, 32])
def test_adaptive_roundtrip_cases(lanes):
    for data in std_cases():
        blob = rc_ref.adaptive_encode(data, lanes=lanes)
        assert rc_ref.adaptive_decode(blob) == data


def test_static_roundtrip_corpus_small(grammar, xargs):
    for data in (grammar, xargs):
        blob = rc_ref.static_encode(data)
        assert rc_ref.static_decode(blob) == data


def test_adaptive_beats_reference_ratio(grammar):
    # reference adaptive ratio on grammar.lsp = 0.619457 (BASELINE.md)
    blob = rc_ref.adaptive_encode(grammar)
    assert len(blob) / len(grammar) <= 0.619457


def test_adaptive_n_lt_lanes():
    data = b"xy"
    blob = rc_ref.adaptive_encode(data, lanes=8)
    assert rc_ref.adaptive_decode(blob) == data


def test_normalize_freqs_exact_total():
    from cpprcoder_tpu.models.static_table import normalize_freqs
    rng = np.random.default_rng(0)
    for _ in range(20):
        counts = rng.integers(0, 1000, 256)
        counts[rng.integers(0, 256, 100)] = 0
        if counts.sum() == 0:
            counts[3] = 7
        f = normalize_freqs(counts, 16)
        assert f.sum() == 1 << 16
        assert np.all((f > 0) == (counts > 0) | ((f > 0) & (f <= 1)))
        present = counts > 0
        assert np.all(f[present] >= 1)
    # single symbol: capped below total
    f = normalize_freqs(np.eye(256, dtype=np.int64)[7] * 999, 16)
    assert f[7] == (1 << 16) - 1 and f[8] == 1
