"""Distributed CT-RCX (the flagship) on a virtual 8-device CPU mesh:
container bytes IDENTICAL to the single-device oracle — including a
partial tail block with its own stride and multiple superblocks per data
shard — and the mesh DECODE twin round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpprcoder_tpu.parallel.mesh import make_mesh
from cpprcoder_tpu.parallel.sharded_rcx import (
    sharded_rcx_decode,
    sharded_rcx_encode,
)
from cpprcoder_tpu.reference import rcx_ref
from cpprcoder_tpu.ops import compaction
from cpprcoder_tpu.utils.shapes import bucket


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=2, lane=2, devices=jax.devices()[:4])


K, INC, CB = 64, 16, 4


def _roundtrip(x, mesh, blocks):
    ((events, lane_sizes, shard_totals, offsets),
     (blocks, n_vec, stride_vec, steps)) = sharded_rcx_encode(
        x, mesh, blocks=blocks, k_global=K, inc=INC, cbits=CB)
    events = np.asarray(jax.device_get(events))
    totals = np.asarray(jax.device_get(shard_totals))
    offs = np.asarray(jax.device_get(offsets))
    assert (np.cumsum(totals) - totals == offs).all()

    from cpprcoder_tpu.ops.rcq_ops import _rows_fn

    per_block = -(-len(x) // blocks)
    rows_list = []
    l4 = bucket((2 * steps + 8) // 4 + 2)
    for b in range(blocks):
        xb = x[b * per_block: b * per_block + int(n_vec[b])]
        ev = jnp.asarray(events[b])
        total = int(compaction.payload_layout(ev)[4])
        payload, sizes = compaction.materialize(ev, bucket(total + 8))
        payload_np = np.asarray(payload)[:total]
        # container bytes == single-device oracle for the same block (the
        # sharded encoder uses the per-step requant schedule, wlog=0)
        blob = rcx_ref.rcx_encode(bytes(xb), lanes=K, inc=INC, cbits=CB,
                                  wlog=0)
        assert blob[-total:] == payload_np.tobytes(), f"block {b}"
        p_cap = bucket(max(total, 1))
        padded = np.zeros(p_cap, np.uint8)
        padded[:total] = payload_np
        rows_list.append(np.asarray(_rows_fn(K, l4, p_cap)(
            jnp.asarray(padded),
            jnp.asarray(np.asarray(sizes), jnp.int32))))

    out = sharded_rcx_decode(np.stack(rows_list), n_vec, stride_vec, mesh,
                             steps=steps, k_global=K, inc=INC, cbits=CB)
    pieces = []
    for b in range(blocks):
        st = int(stride_vec[b])
        pieces.append(out[b][:st].T.reshape(-1)[: int(n_vec[b])].tobytes())
    assert b"".join(pieces) == x.tobytes()


def test_sharded_rcx_identity_and_roundtrip(mesh):
    rng = np.random.default_rng(5)
    x = np.concatenate([
        rng.integers(97, 105, 1500, dtype=np.uint8),
        rng.integers(0, 256, 1100, dtype=np.uint8)])
    _roundtrip(x, mesh, blocks=2)


def test_sharded_rcx_multiblock_partial_tail(mesh):
    # 4 blocks on a data=2 mesh (2 per shard); odd n -> partial tail block
    # with a smaller stride than the others
    rng = np.random.default_rng(6)
    x = rng.integers(32, 127, 3001, dtype=np.uint8)
    _roundtrip(x, mesh, blocks=4)
