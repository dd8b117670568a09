"""ctypes bindings for the C++ host codec (csrc/gsvc_codec.cpp).

Builds the shared library on demand with g++ (cached next to the source).
All entry points take/return NumPy arrays; streams are ``bytes``.

This is the host half of the codec split: bits are *estimated* on the TPU
(gsvc_tpu/ops/entropy.py), streams are *packed* here — mirroring the
reference's GPU-rANS + CPU-file layering (common/ans_coder.py,
utils/encodings.py:102-304, 714-818).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

def _find_src() -> pathlib.Path:
    """Locate csrc/gsvc_codec.cpp.  Fit launchers snapshot only the
    Python package (scripts/rd_r4_finetune.sh copies gsvc_tpu/ + cfgs/),
    so the sibling-of-package path may not exist — fall back to an env
    override, then the canonical repo checkout."""
    cands = []
    env = os.environ.get("GSVC_CSRC_DIR")
    if env:
        cands.append(pathlib.Path(env) / "gsvc_codec.cpp")
    cands.append(pathlib.Path(__file__).resolve().parents[2]
                 / "csrc" / "gsvc_codec.cpp")
    cands.append(pathlib.Path("/root/repo/csrc/gsvc_codec.cpp"))
    for c in cands:
        if c.exists():
            return c
    return cands[1 if not env else 0]


_SRC = _find_src()
_LIB_PATH = _SRC.parent / "libgsvc_codec.so"
_lock = threading.Lock()
_lib = None


def _build() -> pathlib.Path:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(_LIB_PATH)]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not _LIB_PATH.exists()
                or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime):
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        ll, i32p, f64p, u8p, u32p, llp = (
            ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
            np.ctypeslib.ndpointer(np.uint32, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
        )
        lib.ans_encode_gaussian.restype = ll
        lib.ans_encode_gaussian.argtypes = [i32p, f64p, f64p, ll, ll, ll,
                                            u8p, ll]
        lib.ans_decode_gaussian.restype = ll
        lib.ans_decode_gaussian.argtypes = [u8p, ll, f64p, f64p, ll, ll, ll,
                                            i32p]
        lib.ans_encode_binary.restype = ll
        lib.ans_encode_binary.argtypes = [u8p, f64p, ll, u8p, ll]
        lib.ans_decode_binary.restype = ll
        lib.ans_decode_binary.argtypes = [u8p, ll, f64p, ll, u8p]
        lib.octree_encode.restype = ll
        lib.octree_encode.argtypes = [u32p, ll, ctypes.c_int, u8p, ll]
        lib.octree_decode.restype = ll
        lib.octree_decode.argtypes = [u8p, ll, ll, ctypes.c_int, u32p]
        lib.octree_sort_indices.restype = None
        lib.octree_sort_indices.argtypes = [u32p, ll, ctypes.c_int, llp]
        _lib = lib
    return _lib


def native_available() -> bool:
    try:
        _get_lib()
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Gaussian rANS (per-element mu/sigma in symbol units)
# ---------------------------------------------------------------------------

def encode_gaussian_symbols(symbols, mu, sigma, min_s: int, max_s: int) -> bytes:
    """symbols int32 [N]; mu/sigma float64 [N] *in symbol units* (already
    divided by Q — parity with encoder_gaussian, utils/encodings.py:134)."""
    lib = _get_lib()
    symbols = np.ascontiguousarray(symbols, np.int32)
    mu = np.ascontiguousarray(mu, np.float64)
    sigma = np.ascontiguousarray(sigma, np.float64)
    n = symbols.shape[0]
    cap = 16 + 8 * max(n, 2)
    out = np.empty(cap, np.uint8)
    written = lib.ans_encode_gaussian(symbols, mu, sigma, n, min_s, max_s,
                                      out, cap)
    if written < 0:
        raise ValueError(f"ans_encode_gaussian failed: {written}")
    return bytes(out[:written])


def decode_gaussian_symbols(stream: bytes, mu, sigma, min_s: int,
                            max_s: int) -> np.ndarray:
    lib = _get_lib()
    mu = np.ascontiguousarray(mu, np.float64)
    sigma = np.ascontiguousarray(sigma, np.float64)
    n = mu.shape[0]
    buf = np.frombuffer(stream, np.uint8)
    out = np.empty(n, np.int32)
    got = lib.ans_decode_gaussian(np.ascontiguousarray(buf), buf.shape[0],
                                  mu, sigma, n, min_s, max_s, out)
    if got != n:
        raise ValueError("ans_decode_gaussian failed")
    return out


# ---------------------------------------------------------------------------
# Binary streams (hash signs, gaussian masks)
# ---------------------------------------------------------------------------

def encode_binary(bits, p1) -> bytes:
    """bits: {0,1} uint8 [N]; p1: scalar or [N] probability of 1
    (parity with encode_binary, utils/encodings.py:265-287)."""
    lib = _get_lib()
    bits = np.ascontiguousarray(bits, np.uint8)
    n = bits.shape[0]
    p = np.broadcast_to(np.asarray(p1, np.float64), (n,))
    p = np.ascontiguousarray(p)
    cap = 16 + max(n, 2)
    out = np.empty(cap, np.uint8)
    written = lib.ans_encode_binary(bits, p, n, out, cap)
    if written < 0:
        raise ValueError("ans_encode_binary failed")
    return bytes(out[:written])


def decode_binary(stream: bytes, n: int, p1) -> np.ndarray:
    lib = _get_lib()
    p = np.ascontiguousarray(np.broadcast_to(
        np.asarray(p1, np.float64), (n,)))
    buf = np.ascontiguousarray(np.frombuffer(stream, np.uint8))
    out = np.empty(n, np.uint8)
    got = lib.ans_decode_binary(buf, buf.shape[0], p, n, out)
    if got != n:
        raise ValueError("ans_decode_binary failed")
    return out


# ---------------------------------------------------------------------------
# Octree geometry (tmc3 / G-PCC replacement)
# ---------------------------------------------------------------------------

def encode_octree(xyz_q: np.ndarray, depth: int = 16) -> bytes:
    """xyz_q: uint32 [N, 3] quantized coords (< 2**depth per axis)."""
    lib = _get_lib()
    flat = np.ascontiguousarray(xyz_q.reshape(-1), np.uint32)
    n = xyz_q.shape[0]
    # worst case: every point opens its own branch at every level
    # (~depth bytes of occupancy context each) plus coder overhead
    cap = 1024 + 4 * max(n, 2) * depth
    out = np.empty(cap, np.uint8)
    written = lib.octree_encode(flat, n, depth, out, cap)
    if written < 0:
        raise ValueError("octree_encode overflow")
    return bytes(out[:written])


def decode_octree(stream: bytes, n: int, depth: int = 16) -> np.ndarray:
    """Returns uint32 [N, 3] in Morton order, duplicates consecutive."""
    lib = _get_lib()
    buf = np.ascontiguousarray(np.frombuffer(stream, np.uint8))
    out = np.empty(3 * n, np.uint32)
    got = lib.octree_decode(buf, buf.shape[0], n, depth, out)
    if got != n:
        raise ValueError(f"octree_decode returned {got} of {n}")
    return out.reshape(n, 3)


def morton_sort_indices(xyz_q: np.ndarray, depth: int = 16) -> np.ndarray:
    """selection[i] = original index of the i-th decoder-order point —
    the attribute-alignment permutation (analog of the reference's
    selection from encode_anchor, utils/encodings.py:741-818)."""
    lib = _get_lib()
    flat = np.ascontiguousarray(xyz_q.reshape(-1), np.uint32)
    n = xyz_q.shape[0]
    out = np.empty(n, np.int64)
    lib.octree_sort_indices(flat, n, depth, out)
    return out
