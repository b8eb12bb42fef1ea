"""JAX range coder must produce byte-identical CT containers to the oracle."""

import numpy as np
import pytest

from cpprcoder_tpu.ops import range_ops
from cpprcoder_tpu.reference import rc_ref
from conftest import std_cases


CASES = [c for c in std_cases() if len(c) > 0]


@pytest.mark.parametrize("lanes", [1, 8])
def test_static_container_identity(lanes):
    for data in CASES[:6]:
        ref = rc_ref.static_encode(data, lanes=lanes)
        jx = range_ops.static_encode_jax(data, lanes=lanes)
        assert jx == ref
        assert range_ops.static_decode_jax(jx) == data


@pytest.mark.parametrize("lanes", [1, 8])
def test_adaptive_container_identity(lanes):
    for data in CASES[:6]:
        ref = rc_ref.adaptive_encode(data, lanes=lanes)
        jx = range_ops.adaptive_encode_jax(data, lanes=lanes)
        assert jx == ref
        assert range_ops.adaptive_decode_jax(jx) == data


def test_static_empty():
    blob = range_ops.static_encode_jax(b"")
    assert range_ops.static_decode_jax(blob) == b""


def test_corpus_file_roundtrip(grammar):
    blob = range_ops.static_encode_jax(grammar)
    assert range_ops.static_decode_jax(blob) == grammar
    assert blob == rc_ref.static_encode(grammar)
    blob2 = range_ops.adaptive_encode_jax(grammar)
    assert range_ops.adaptive_decode_jax(blob2) == grammar


def test_normalize_twins_match():
    import jax
    import jax.numpy as jnp

    from cpprcoder_tpu.models import table_jax
    from cpprcoder_tpu.models.static_table import normalize_freqs

    norm = jax.jit(table_jax.normalize_freqs_jnp, static_argnums=2)
    rng = np.random.default_rng(7)
    for _ in range(10):
        n = int(rng.integers(1, 1 << int(rng.integers(1, 26))))
        nsym = int(rng.integers(1, 257))
        syms = rng.choice(256, nsym, replace=False)
        w = rng.dirichlet(np.ones(nsym) * rng.uniform(0.01, 5))
        counts = np.zeros(256, np.int64)
        counts[syms] = np.round(w * n).astype(np.int64)
        counts[syms[0]] += max(0, n - counts.sum())
        if counts.sum() == 0:
            counts[syms[0]] = 1
        n_true = int(counts.sum())
        for bits in (14, 16):
            h = normalize_freqs(counts, bits)
            d = np.asarray(norm(jnp.asarray(counts, jnp.int32),
                                jnp.uint32(n_true), bits))
            assert (h == d).all()
