"""Malformed-container handling: truncated or corrupted blobs raise the
typed CorruptContainerError instead of bare numpy/struct errors (reference
parity: explicit decode-side bounds checks, slz4.h:549-554,
cpprcoder.h:474-491)."""

import numpy as np
import pytest

from cpprcoder_tpu.core.bytesutil import CorruptContainerError
from cpprcoder_tpu.codecs import get_codec, list_codecs


def _sample_blobs():
    data = b"malformed container probe " * 40
    for name in ("rcq", "adaptive_range", "static_range", "rans",
                 "huffman", "slz4"):
        yield name, get_codec(name).encode(data), data


@pytest.mark.parametrize("cut", [0, 1, 3, 7])
def test_truncated_headers_raise_cleanly(cut):
    for name, blob, _ in _sample_blobs():
        trunc = blob[:cut]
        try:
            get_codec(name).decode(trunc)
        except CorruptContainerError:
            pass  # the required behavior
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"{name}: truncated-to-{cut} raised {type(e).__name__}"
                        f" instead of CorruptContainerError: {e}")
        else:
            # decoding nothing successfully is only fine for empty output
            pass


def test_truncated_payload_rcq():
    data = b"abcdef" * 500
    blob = get_codec("rcq").encode(data)
    with pytest.raises(CorruptContainerError):
        get_codec("rcq").decode(blob[: len(blob) // 2])


def test_absurd_lane_count():
    data = b"x" * 100
    blob = bytearray(get_codec("rcq").encode(data))
    blob[4] = 0x1F  # lane_desc log2(k)=31
    with pytest.raises(CorruptContainerError):
        get_codec("rcq").decode(bytes(blob))


def test_qbits_mismatch():
    data = b"x" * 100
    blob = bytearray(get_codec("rcq").encode(data))
    blob[7] = 9  # qbits field
    with pytest.raises(CorruptContainerError):
        get_codec("rcq").decode(bytes(blob))
