"""Sort-based materialize == searchsorted spec (ops/compaction.py)."""

import numpy as np
import jax.numpy as jnp

from cpprcoder_tpu.ops import compaction


def _random_events(rng, k, e):
    """Random-but-plausible event grids: emit flag, byte, carry, run."""
    emit = rng.random((k, e)) < 0.6
    first = rng.integers(0, 256, (k, e)).astype(np.uint32)
    carry = rng.integers(0, 2, (k, e)).astype(np.uint32)
    run = rng.integers(0, 5, (k, e)).astype(np.uint32)
    ev = (emit.astype(np.uint32) << 31) | (first << 23) | (carry << 22) | run
    ev[~emit] = 0
    # every lane needs at least one emitting event (the dropped dummy)
    ev[:, 0] = (1 << 31) | (first[:, 0] << 23)
    return jnp.asarray(ev)


def test_sort_path_matches_searchsorted_spec():
    rng = np.random.default_rng(42)
    for k, e in ((4, 16), (16, 33), (64, 65)):
        events = _random_events(rng, k, e)
        total = int(compaction.payload_layout(events)[4])
        out_cap = max(16, total + 7)
        a, sa = compaction.materialize(events, out_cap)
        b, sb = compaction._materialize_searchsorted(events, out_cap)
        assert (np.asarray(sa) == np.asarray(sb)).all()
        assert (np.asarray(a) == np.asarray(b)).all(), (k, e)


def test_fallback_above_capacity(monkeypatch):
    rng = np.random.default_rng(1)
    events = _random_events(rng, 4, 8)
    total = int(compaction.payload_layout(events)[4])
    # force the fallback by shrinking the bound
    a, _ = compaction.materialize(events, total + 2)
    b, _ = compaction._materialize_searchsorted(events, total + 2)
    assert (np.asarray(a) == np.asarray(b)).all()
