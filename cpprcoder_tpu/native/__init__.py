"""ctypes bindings for the native host codec/verifier (native/ctrc.cpp).

Builds libctrc.so on demand with g++ (cached next to the source); all
functions return byte-identical CT containers to the Python oracle and the
JAX backends. Used for native-speed large-input verification (the 128 MiB
adaptive stress mirror of the reference's test_adaptive) and as a host-side
fallback codec where no accelerator is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_SRC_DIR, "libctrc.so")
_LIB = None


def _build() -> str:
    src = os.path.join(_SRC_DIR, "ctrc.cpp")
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(src)):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, src])
    return _SO


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def load():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        u8p = ctypes.POINTER(ctypes.c_uint8)
        for name, args in [
            ("ct_static_encode", [u8p, ctypes.c_int64, ctypes.c_uint32,
                                  u8p, ctypes.c_int64]),
            ("ct_static_decode", [u8p, ctypes.c_int64, u8p, ctypes.c_int64]),
            ("ct_adaptive_encode", [u8p, ctypes.c_int64, ctypes.c_uint32,
                                    ctypes.c_uint32, ctypes.c_uint32,
                                    u8p, ctypes.c_int64]),
            ("ct_adaptive_decode", [u8p, ctypes.c_int64, u8p, ctypes.c_int64]),
            ("ct_rcq_encode", [u8p, ctypes.c_int64, ctypes.c_uint32,
                               ctypes.c_uint32, ctypes.c_uint32,
                               u8p, ctypes.c_int64]),
            ("ct_rcq_decode", [u8p, ctypes.c_int64, u8p, ctypes.c_int64]),
            ("ct_rcx_encode", [u8p, ctypes.c_int64, ctypes.c_uint32,
                               ctypes.c_uint32, ctypes.c_uint32,
                               ctypes.c_uint32, ctypes.c_uint32,
                               u8p, ctypes.c_int64]),
            ("ct_rcx_decode", [u8p, ctypes.c_int64, u8p, ctypes.c_int64]),
            ("ct_slz4_encode", [u8p, ctypes.c_int64, ctypes.c_uint32,
                                ctypes.c_uint32, u8p, ctypes.c_int64]),
            ("ct_slz4_decode", [u8p, ctypes.c_int64, u8p, ctypes.c_int64]),
        ]:
            fn = getattr(lib, name)
            fn.argtypes = args
            fn.restype = ctypes.c_int64
        _LIB = lib
    return _LIB


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def static_encode(data, lanes: int) -> bytes:
    lib = load()
    x = np.frombuffer(bytes(data), np.uint8) if not isinstance(data, np.ndarray) else data
    cap = len(x) + (len(x) >> 3) + 16 * lanes + 4096
    out = np.empty(cap, np.uint8)
    sz = lib.ct_static_encode(_ptr(x), len(x), lanes, _ptr(out), cap)
    if sz < 0:
        raise RuntimeError("ct_static_encode failed")
    return out[:sz].tobytes()


def static_decode(blob) -> bytes:
    lib = load()
    b = np.frombuffer(bytes(blob), np.uint8)
    n = int.from_bytes(bytes(blob[:4]), "little")
    out = np.empty(max(n, 1), np.uint8)
    sz = lib.ct_static_decode(_ptr(b), len(b), _ptr(out), n)
    if sz < 0:
        raise RuntimeError("ct_static_decode failed")
    return out[:sz].tobytes()


def adaptive_encode(data, lanes: int, inc: int, limit_log2: int) -> bytes:
    lib = load()
    x = np.frombuffer(bytes(data), np.uint8) if not isinstance(data, np.ndarray) else data
    cap = len(x) + (len(x) >> 3) + 16 * lanes + 4096
    out = np.empty(cap, np.uint8)
    sz = lib.ct_adaptive_encode(_ptr(x), len(x), lanes, inc, limit_log2,
                                _ptr(out), cap)
    if sz < 0:
        raise RuntimeError("ct_adaptive_encode failed")
    return out[:sz].tobytes()


def adaptive_decode(blob) -> bytes:
    lib = load()
    b = np.frombuffer(bytes(blob), np.uint8)
    n = int.from_bytes(bytes(blob[:4]), "little")
    out = np.empty(max(n, 1), np.uint8)
    sz = lib.ct_adaptive_decode(_ptr(b), len(b), _ptr(out), n)
    if sz < 0:
        raise RuntimeError("ct_adaptive_decode failed")
    return out[:sz].tobytes()


def rcq_encode(data, lanes: int, inc: int, climit_log2: int) -> bytes:
    lib = load()
    x = np.frombuffer(bytes(data), np.uint8) \
        if not isinstance(data, np.ndarray) else data
    cap = 2 * len(x) + 16 * lanes + 4096
    out = np.empty(cap, np.uint8)
    sz = lib.ct_rcq_encode(_ptr(x), len(x), lanes, inc, climit_log2,
                           _ptr(out), cap)
    if sz < 0:
        raise RuntimeError("ct_rcq_encode failed")
    return out[:sz].tobytes()


def rcq_decode(blob) -> bytes:
    lib = load()
    b = np.frombuffer(bytes(blob), np.uint8)
    n = int.from_bytes(bytes(blob[:4]), "little")
    out = np.empty(max(n, 1), np.uint8)
    sz = lib.ct_rcq_decode(_ptr(b), len(b), _ptr(out), n)
    if sz < 0:
        raise RuntimeError("ct_rcq_decode failed")
    return out[:sz].tobytes()


def rcx_encode(data, lanes: int, inc: int, climit_log2: int,
               cbits: int, wlog: int | None = None) -> bytes:
    from cpprcoder_tpu.models.cxmodel import WLOG_DEFAULT

    if wlog is None:
        wlog = WLOG_DEFAULT
    lib = load()
    x = np.frombuffer(bytes(data), np.uint8) \
        if not isinstance(data, np.ndarray) else data
    cap = 2 * len(x) + 16 * lanes + 4096
    out = np.empty(cap, np.uint8)
    sz = lib.ct_rcx_encode(_ptr(x), len(x), lanes, inc, climit_log2, cbits,
                           wlog, _ptr(out), cap)
    if sz < 0:
        raise RuntimeError("ct_rcx_encode failed")
    return out[:sz].tobytes()


def rcx_decode(blob) -> bytes:
    lib = load()
    b = np.frombuffer(bytes(blob), np.uint8)
    n = int.from_bytes(bytes(blob[:4]), "little")
    out = np.empty(max(n, 1), np.uint8)
    sz = lib.ct_rcx_decode(_ptr(b), len(b), _ptr(out), n)
    if sz < 0:
        raise RuntimeError("ct_rcx_decode failed")
    return out[:sz].tobytes()


def slz4_encode(data, seg_log2: int = 17, lazy: bool = True) -> bytes:
    lib = load()
    x = np.frombuffer(bytes(data), np.uint8) \
        if not isinstance(data, np.ndarray) else data
    n = len(x)
    if n > 0xFFFFFFFF:
        raise ValueError(
            f"slz4 container rawSize is u32; input is {n} bytes")
    s = 1 << seg_log2
    n_segs = -(-n // s) if n else 0
    cap = n + n // 128 + 16 * max(n_segs, 1) + 4096
    out = np.empty(cap, np.uint8)
    sz = lib.ct_slz4_encode(_ptr(x), n, seg_log2, int(lazy), _ptr(out), cap)
    if sz < 0:
        raise RuntimeError("ct_slz4_encode failed")
    return out[:sz].tobytes()


def slz4_decode(blob) -> bytes:
    from cpprcoder_tpu.core.bytesutil import CorruptContainerError

    lib = load()
    b = np.frombuffer(bytes(blob), np.uint8)
    if len(b) < 4:
        raise CorruptContainerError("slz4 container shorter than header")
    n = int.from_bytes(bytes(blob[:4]), "little")
    out = np.empty(max(n, 1), np.uint8)
    sz = lib.ct_slz4_decode(_ptr(b), len(b), _ptr(out), n)
    if sz < 0:
        # typed like every other decode path (tests/test_malformed.py)
        raise CorruptContainerError("native slz4 decode rejected container")
    return out[:sz].tobytes()
