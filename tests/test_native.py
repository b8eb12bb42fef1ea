"""Native (C++/ctypes) codec must be byte-identical to the Python oracle."""

import numpy as np
import pytest

from cpprcoder_tpu import native
from cpprcoder_tpu.reference import rc_ref
from conftest import std_cases

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("lanes", [1, 8])
def test_native_static_identity(lanes):
    for data in [c for c in std_cases() if c][:6]:
        assert native.static_encode(data, lanes) == \
            rc_ref.static_encode(data, lanes=lanes)
        assert native.static_decode(
            native.static_encode(data, lanes)) == data


@pytest.mark.parametrize("lanes", [1, 8])
def test_native_adaptive_identity(lanes):
    for data in [c for c in std_cases() if c][:6]:
        blob = native.adaptive_encode(data, lanes, 24, 16)
        assert blob == rc_ref.adaptive_encode(data, lanes=lanes, inc=24,
                                              limit_log2=16)
        assert native.adaptive_decode(blob) == data


@pytest.mark.slow
def test_adaptive_stress_128mib():
    # reference parity: test_adaptive (test/main.cpp:1201-1237) round-trips
    # 128 MiB of incompressible random bytes
    rng = np.random.default_rng(7)
    big = rng.integers(0, 256, 128 << 20, dtype=np.uint8)
    blob = native.adaptive_encode(big, 1024, 4, 18)
    assert native.adaptive_decode(blob) == big.tobytes()
    assert len(blob) / len(big) < 1.01


def test_native_rcq_identity_and_roundtrip():
    from cpprcoder_tpu import native
    from cpprcoder_tpu.models.qmodel import rcq_params
    from cpprcoder_tpu.reference import rcq_ref

    if not native.available():
        import pytest

        pytest.skip("no g++/native lib")
    rng = np.random.default_rng(11)
    for data in (b"hello world " * 200,
                 rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),
                 b"\x00" * 3000):
        k, inc, cl = rcq_params(len(data))
        nat = native.rcq_encode(data, k, inc, cl)
        ref = rcq_ref.rcq_encode(data, lanes=k, inc=inc, climit_log2=cl)
        assert nat == ref
        assert native.rcq_decode(nat) == data


def test_native_rcx_identity_and_roundtrip():
    from cpprcoder_tpu import native
    from cpprcoder_tpu.models.cxmodel import rcx_params
    from cpprcoder_tpu.reference import rcx_ref

    if not native.available():
        import pytest

        pytest.skip("no g++/native lib")
    rng = np.random.default_rng(13)
    for data in (b"the quick brown fox " * 150,
                 rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),
                 b"\xff" * 3000):
        k, inc, cl, cb = rcx_params(len(data))
        nat = native.rcx_encode(data, k, inc, cl, cb)
        ref = rcx_ref.rcx_encode(data, lanes=k, inc=inc, climit_log2=cl,
                                 cbits=cb)
        assert nat == ref
        assert native.rcx_decode(nat) == data
    # cbits sweep incl. order-0 degenerate and full-byte context
    data = b"abracadabra alakazam " * 120
    for cb in (0, 3, 8):
        k, inc, cl, _ = rcx_params(len(data))
        nat = native.rcx_encode(data, k, inc, cl, cb)
        assert nat == rcx_ref.rcx_encode(data, lanes=k, inc=inc,
                                         climit_log2=cl, cbits=cb)
        assert native.rcx_decode(nat) == data


def test_native_slz4_identity_and_roundtrip():
    if not native.available():
        pytest.skip("no g++/native lib")
    from cpprcoder_tpu.reference import slz4_ref

    rng = np.random.default_rng(9)
    cases = [b"a" * 20, b"abcabcabcabc" * 50,
             rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),
             b"\x00" * 70000,
             rng.integers(0, 16, 9000, dtype=np.uint8).tobytes(),
             b"", b"x", b"xy" * 3]
    for data in cases:
        for sl in (12, 17):
            ref = slz4_ref.slz4_encode(data, seg_log2=sl)
            assert native.slz4_encode(data, seg_log2=sl) == ref
            assert native.slz4_decode(ref) == data


def test_native_slz4_rejects_corrupt():
    if not native.available():
        pytest.skip("no g++/native lib")
    from cpprcoder_tpu.core.bytesutil import CorruptContainerError
    from cpprcoder_tpu.reference import slz4_ref

    blob = bytearray(slz4_ref.slz4_encode(b"hello world " * 40, seg_log2=12))
    with pytest.raises(CorruptContainerError):
        native.slz4_decode(bytes(blob[: len(blob) // 2]))  # truncated
    bad = bytes(blob[:4]) + b"\x30" + bytes(blob[5:])      # seg_log2 > 24
    with pytest.raises(CorruptContainerError):
        native.slz4_decode(bad)
