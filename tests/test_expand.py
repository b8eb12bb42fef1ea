"""Pallas in-VMEM expansion kernel (ops/expand_pallas.py) must be
byte-identical to the XLA merge expansion (compaction.materialize_rows_t)
for arbitrary event grids, including run-length bytes, dropped dummies,
may_drop continuation masks, and non-aligned E/K."""

import numpy as np
import pytest

from cpprcoder_tpu.ops import compaction, expand_pallas

expand_pallas._INTERPRET = True


def _rand_events(e, k, seed, p_emit=0.5, run_max=3):
    rng = np.random.default_rng(seed)
    emit = rng.random((e, k)) < p_emit
    first = rng.integers(0, 256, (e, k), dtype=np.uint32)
    carry = rng.integers(0, 2, (e, k), dtype=np.uint32)
    run = rng.integers(0, run_max + 1, (e, k), dtype=np.uint32)
    ev = (np.uint32(1) << 31) | (first << 23) | (carry << 22) | run
    return np.where(emit, ev, 0).astype(np.uint32)


def _l2_for(events):
    import jax.numpy as jnp

    _, sizes = compaction.materialize_rows_t(jnp.asarray(events), 8)
    # materialize_rows_t only needs l2 for the output width; sizes are
    # exact regardless, so probe with a tiny l2 then round up
    m = int(np.asarray(sizes).max())
    l2 = 8
    while l2 < m:
        l2 *= 2
    return l2


@pytest.mark.parametrize("e,k,seed", [
    (18, 8, 0), (34, 128, 1), (130, 200, 2), (257, 64, 3)])
def test_matches_xla_expansion(e, k, seed):
    import jax.numpy as jnp

    events = jnp.asarray(_rand_events(e, k, seed))
    l2 = _l2_for(events)
    ref_rows, ref_sizes = compaction.materialize_rows_t(events, l2)
    got_rows, got_sizes = expand_pallas.materialize_rows_pallas(events, l2)
    assert (np.asarray(ref_sizes) == np.asarray(got_sizes)).all()
    assert (np.asarray(ref_rows) == np.asarray(got_rows)).all()


def test_matches_with_may_drop_mask():
    import jax.numpy as jnp

    events = jnp.asarray(_rand_events(40, 16, 7))
    md = np.zeros(16, bool)
    md[::2] = True
    l2 = _l2_for(events)
    ref_rows, ref_sizes = compaction.materialize_rows_t(events, l2, md)
    got_rows, got_sizes = expand_pallas.materialize_rows_pallas(
        events, l2, md)
    assert (np.asarray(ref_sizes) == np.asarray(got_sizes)).all()
    assert (np.asarray(ref_rows) == np.asarray(got_rows)).all()


def test_empty_and_sparse_lanes():
    import jax.numpy as jnp

    ev = _rand_events(24, 12, 9, p_emit=0.15)
    ev[:, 3] = 0                     # lane with no events at all
    events = jnp.asarray(ev)
    l2 = _l2_for(events)
    ref_rows, ref_sizes = compaction.materialize_rows_t(events, l2)
    got_rows, got_sizes = expand_pallas.materialize_rows_pallas(events, l2)
    assert int(np.asarray(got_sizes)[3]) == 0
    assert (np.asarray(ref_sizes) == np.asarray(got_sizes)).all()
    assert (np.asarray(ref_rows) == np.asarray(got_rows)).all()
