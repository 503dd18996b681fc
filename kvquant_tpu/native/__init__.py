"""Native (C++) host-side runtime: cache-format packing off-device.

Compiled from csrc/packing.cpp on first use (g++ -O3, cached next to the
package) and loaded with ctypes; a numpy fallback keeps everything working
without a toolchain. The C++ and JAX (ops/packing.py) implementations of
the layout are tested against each other (tests/test_native.py) — two
independent encodings of the same contract.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(
    os.path.dirname(__file__), "..", "..", "csrc", "packing.cpp"
)
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_packing.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src = os.path.abspath(_SRC)
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", _LIB_PATH, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        i64, i32 = ctypes.c_int64, ctypes.c_int32
        p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.kvq_pack_codes.argtypes = [p_i32, p_i32, i64, i64, i64, i32]
        lib.kvq_unpack_codes.argtypes = [p_i32, p_i32, i64, i64, i64, i32]
        lib.kvq_encode_outliers.argtypes = [p_f32, p_i32, p_f32, i64]
        lib.kvq_decode_outliers.argtypes = [p_f32, p_f32, p_i32, i64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def pack_codes(codes: np.ndarray, bits: int) -> np.ndarray:
    """codes (..., T, D) int32 -> planes (..., bits, T//32, D) int32,
    identical layout to ops.packing.pack_codes (host-side, no JAX)."""
    codes = np.ascontiguousarray(codes, np.int32)
    *lead, T, D = codes.shape
    assert T % 128 == 0
    n_lead = int(np.prod(lead)) if lead else 1
    out = np.zeros((n_lead, bits, T // 32, D), np.int32)
    lib = _load()
    if lib is not None:
        lib.kvq_pack_codes(codes.reshape(n_lead, T, D), out,
                           n_lead, T, D, bits)
    else:  # numpy fallback
        c = codes.reshape(n_lead, T // 128, 32, 4, D).astype(np.uint32)
        weights = (np.uint32(1) << np.arange(32, dtype=np.uint32))
        for b in range(bits):
            bitvals = (c >> b) & 1
            words = (bitvals * weights[None, None, :, None, None]).sum(
                axis=2, dtype=np.uint32
            )
            out[:, b] = words.reshape(n_lead, T // 32, D).astype(np.int32)
    return out.reshape(*lead, bits, T // 32, D)


def unpack_codes(planes: np.ndarray, bits: int) -> np.ndarray:
    planes = np.ascontiguousarray(planes, np.int32)
    *lead, b_dim, TW, D = planes.shape
    assert b_dim == bits
    n_lead = int(np.prod(lead)) if lead else 1
    T = TW * 32
    out = np.zeros((n_lead, T, D), np.int32)
    lib = _load()
    if lib is not None:
        lib.kvq_unpack_codes(planes.reshape(n_lead, bits, TW, D), out,
                             n_lead, T, D, bits)
    else:
        w = planes.reshape(n_lead, bits, T // 128, 1, 4, D).astype(np.uint32)
        shifts = np.arange(32, dtype=np.uint32).reshape(1, 1, 1, 32, 1, 1)
        bitvals = (w >> shifts) & 1
        weights = (np.uint32(1) << np.arange(bits, dtype=np.uint32)).reshape(
            1, bits, 1, 1, 1, 1
        )
        codes = (bitvals * weights).sum(axis=1, dtype=np.uint32)
        out = codes.reshape(n_lead, T, D).astype(np.int32)
    return out.reshape(*lead, T, D)


def encode_outliers(vals: np.ndarray, idx: np.ndarray) -> np.ndarray:
    vals = np.ascontiguousarray(vals, np.float32)
    idx = np.ascontiguousarray(idx, np.int32)
    out = np.empty(vals.shape, np.float32)
    lib = _load()
    if lib is not None:
        lib.kvq_encode_outliers(vals.reshape(-1), idx.reshape(-1),
                                out.reshape(-1), vals.size)
    else:
        bits = vals.view(np.uint32)
        out = (
            (bits & np.uint32(0xFFFFFE00))
            | (idx.astype(np.uint32) & np.uint32(0x1FF))
        ).view(np.float32)
    return out


def decode_outliers(words: np.ndarray):
    words = np.ascontiguousarray(words, np.float32)
    vals = np.empty(words.shape, np.float32)
    idx = np.empty(words.shape, np.int32)
    lib = _load()
    if lib is not None:
        lib.kvq_decode_outliers(words.reshape(-1), vals.reshape(-1),
                                idx.reshape(-1), words.size)
    else:
        u = words.view(np.uint32)
        idx = (u & np.uint32(0x1FF)).astype(np.int32)
        vals = (u & np.uint32(0xFFFFFE00)).view(np.float32)
    return vals, idx
