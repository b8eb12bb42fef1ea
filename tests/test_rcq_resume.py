"""Mid-stream resumable CT-RCQ encode: checkpoint/resume produces a
container BYTE-IDENTICAL to the one-shot encode (the reference's
Pending/re-drive semantics, cpprcoder.h:112-123, at chunk granularity)."""

import pickle

import numpy as np

from cpprcoder_tpu.codecs.resume import RCQResumableEncoder
from cpprcoder_tpu.ops import rcq_ops


def _roundtrip_resumable(data: bytes, lanes: int, chunk_steps: int,
                         split_at: int) -> bytes:
    enc = RCQResumableEncoder(len(data), lanes=lanes,
                              chunk_steps=chunk_steps)
    enc.feed(data[:split_at])
    ckpt = pickle.loads(pickle.dumps(enc.checkpoint()))   # kill + restore
    enc2 = RCQResumableEncoder.resume(ckpt)
    enc2.feed(data[split_at:])
    return enc2.finish()


def test_resume_byte_identical_mixed():
    rng = np.random.default_rng(3)
    data = (rng.integers(97, 123, 3000, dtype=np.uint8).tobytes()
            + rng.integers(0, 256, 2000, dtype=np.uint8).tobytes())
    one_shot = rcq_ops.rcq_encode_jax(data, lanes=8)
    for split in (1, 700, 2048, 4999):
        blob = _roundtrip_resumable(data, lanes=8, chunk_steps=16,
                                    split_at=split)
        assert blob == one_shot, split
    assert rcq_ops.rcq_decode_jax(one_shot) == data


def test_resume_low_entropy_lanes_emit_late():
    # all-zeros: lanes emit nothing for many chunks — exercises the
    # per-lane dummy-drop tracking across chunk boundaries
    data = b"\x00" * 4096
    one_shot = rcq_ops.rcq_encode_jax(data, lanes=8)
    blob = _roundtrip_resumable(data, lanes=8, chunk_steps=8, split_at=1000)
    assert blob == one_shot
    assert rcq_ops.rcq_decode_jax(blob) == data


def test_resume_multiple_checkpoints():
    rng = np.random.default_rng(9)
    data = rng.integers(0, 200, 2500, dtype=np.uint8).tobytes()
    one_shot = rcq_ops.rcq_encode_jax(data, lanes=8)
    enc = RCQResumableEncoder(len(data), lanes=8, chunk_steps=16)
    pos = 0
    for piece in (100, 900, 1300, 200):
        enc.feed(data[pos: pos + piece])
        pos += piece
        enc = RCQResumableEncoder.resume(
            pickle.loads(pickle.dumps(enc.checkpoint())))
    assert enc.finish() == one_shot
