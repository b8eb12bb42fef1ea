"""Distributed (mesh-sharded) codec tests on the 8-device virtual CPU mesh.

The key property: lane-sharding with psum'd model updates is bit-identical
to the single-device shared-model encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpprcoder_tpu.parallel.mesh import make_mesh
from cpprcoder_tpu.parallel.sharded import (
    sharded_adaptive_encode,
    sharded_histogram,
)


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_histogram():
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, 10007, dtype=np.uint8)
    h = sharded_histogram(x, mesh)
    assert (h == np.bincount(x, minlength=256)).all()


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1)])
def test_sharded_adaptive_matches_single_device(mesh_shape):
    from cpprcoder_tpu.ops import range_ops

    mesh = make_mesh(*mesh_shape)
    rng = np.random.default_rng(1)
    k_global = 16
    blocks = mesh.shape["data"]
    x = rng.integers(0, 200, blocks * 1000 - 37, dtype=np.uint8)
    (events, lane_sizes, shard_totals, offsets), (nb, steps, per_block) = \
        sharded_adaptive_encode(x, mesh, k_global=k_global, inc=24,
                                limit_log2=16)
    events = np.asarray(jax.device_get(events))
    lane_sizes = np.asarray(jax.device_get(lane_sizes))
    # single-device reference per block
    fn = range_ops._adaptive_encode_fn(steps, k_global, 24, 16)
    for b in range(nb):
        lo = b * per_block
        block = x[lo: lo + per_block]
        x2d = range_ops._pad2d(block, steps, k_global)
        ev1, ls1, tot1 = fn(jnp.asarray(x2d), jnp.uint32(len(block)))
        assert (np.asarray(jax.device_get(ev1)) == events[b]).all(), b
        assert (np.asarray(jax.device_get(ls1)) == lane_sizes[b]).all(), b
    assert int(np.asarray(jax.device_get(shard_totals)).sum()) == \
        int(lane_sizes.sum())
