"""Native host library bindings (C++ exact bignum/RNS/NTT oracle).

The reference's host-side native layer is C (GPQHE poly_mpi_t over
libgcrypt MPI bignums, /root/reference/src/ctr.c:515-521).  Here the
native layer is csrc/hectr_host.cpp, built on demand with g++ and bound
via ctypes; hectr_tpu.ckks.modmath keeps pure-Python object-integer
fallbacks with identical contracts (used automatically when no
toolchain is available).

Public surface:
  available() -> bool
  crt_centered(residues u32[L,N], primes)  -> object int array [N]
  to_rns(coeffs object ints [N], primes)   -> u32[L,N]
  ntt_ref / intt_ref(a u32[N], p, psi)     -> u32[N]   exact oracle
  negacyclic_mul_ref(x, y, p)              -> u32[N]   O(N^2) oracle
"""

from __future__ import annotations

import ctypes
import functools
import os
import pathlib
import subprocess

import numpy as np

_SRC = pathlib.Path(__file__).resolve().parent.parent.parent / "csrc"
_BUILD = _SRC / "build"


@functools.lru_cache(maxsize=1)
def _lib():
    """Build (if stale) and load libhectr_host.so; None if unavailable."""
    if os.environ.get("HECTR_NATIVE") == "0":
        return None
    src = _SRC / "hectr_host.cpp"
    so = _BUILD / "libhectr_host.so"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            _BUILD.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                 str(src), "-o", str(so)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(so))
    except (OSError, subprocess.SubprocessError, FileNotFoundError):
        return None
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_int64
    lib.hectr_crt_centered.argtypes = [u32p, u64p, i64, i64, i64, u8p, u64p]
    lib.hectr_crt_centered.restype = ctypes.c_int
    lib.hectr_to_rns.argtypes = [u8p, u64p, u64p, i64, i64, i64, u32p]
    lib.hectr_to_rns.restype = ctypes.c_int
    lib.hectr_ntt_ref.argtypes = [u32p, i64, ctypes.c_uint64, ctypes.c_uint64]
    lib.hectr_ntt_ref.restype = ctypes.c_int
    lib.hectr_intt_ref.argtypes = [u32p, i64, ctypes.c_uint64, ctypes.c_uint64]
    lib.hectr_intt_ref.restype = ctypes.c_int
    lib.hectr_negacyclic_mul_ref.argtypes = [u32p, u32p, i64,
                                             ctypes.c_uint64, u32p]
    lib.hectr_negacyclic_mul_ref.restype = ctypes.c_int
    if lib.hectr_host_abi_version() != 1:
        return None
    return lib


def available() -> bool:
    return _lib() is not None


def _words_for(primes) -> int:
    bits = sum(int(p).bit_length() for p in primes) + 2
    return (bits + 63) // 64


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def crt_centered(residues: np.ndarray, primes: list[int]) -> np.ndarray:
    """u32[L, N] residues -> centered exact big-int coefficients
    (object array [N]); same contract as modmath.from_rns."""
    lib = _lib()
    assert lib is not None
    L, N = residues.shape
    W = _words_for(primes)
    res = np.ascontiguousarray(residues, dtype=np.uint32)
    pr = np.asarray(primes, dtype=np.uint64)
    neg = np.zeros(N, dtype=np.uint8)
    mag = np.zeros((N, W), dtype=np.uint64)
    rc = lib.hectr_crt_centered(
        _u32p(res), pr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        L, N, W,
        neg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mag.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    assert rc == 0, f"hectr_crt_centered rc={rc}"
    out = np.empty(N, dtype=object)
    shifts = [64 * i for i in range(W)]
    for k in range(N):
        v = 0
        row = mag[k]
        for i in range(W):
            if row[i]:
                v += int(row[i]) << shifts[i]
        out[k] = -v if neg[k] else v
    return out


def to_rns(coeffs_obj: np.ndarray, primes: list[int]) -> np.ndarray:
    """Exact signed big-int coefficients [N] -> u32[L, N] residues;
    same contract as modmath.to_rns."""
    lib = _lib()
    assert lib is not None
    N = coeffs_obj.shape[0]
    L = len(primes)
    W = _words_for(primes)
    neg = np.zeros(N, dtype=np.uint8)
    mag = np.zeros((N, W), dtype=np.uint64)
    mask = (1 << 64) - 1
    for k in range(N):
        v = int(coeffs_obj[k])
        if v < 0:
            neg[k] = 1
            v = -v
        for i in range(W):
            mag[k, i] = v & mask
            v >>= 64
        assert v == 0, "coefficient exceeds CRT word budget"
    pr = np.asarray(primes, dtype=np.uint64)
    out = np.zeros((L, N), dtype=np.uint32)
    rc = lib.hectr_to_rns(
        neg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mag.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        pr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        L, N, W, _u32p(out))
    assert rc == 0, f"hectr_to_rns rc={rc}"
    return out


def ntt_ref(a: np.ndarray, p: int, psi: int) -> np.ndarray:
    lib = _lib()
    assert lib is not None
    buf = np.ascontiguousarray(a, dtype=np.uint32).copy()
    rc = lib.hectr_ntt_ref(_u32p(buf), buf.shape[0], p, psi)
    assert rc == 0
    return buf


def intt_ref(a: np.ndarray, p: int, psi: int) -> np.ndarray:
    lib = _lib()
    assert lib is not None
    buf = np.ascontiguousarray(a, dtype=np.uint32).copy()
    rc = lib.hectr_intt_ref(_u32p(buf), buf.shape[0], p, psi)
    assert rc == 0
    return buf


def negacyclic_mul_ref(x: np.ndarray, y: np.ndarray, p: int) -> np.ndarray:
    lib = _lib()
    assert lib is not None
    xb = np.ascontiguousarray(x, dtype=np.uint32)
    yb = np.ascontiguousarray(y, dtype=np.uint32)
    out = np.zeros_like(xb)
    rc = lib.hectr_negacyclic_mul_ref(_u32p(xb), _u32p(yb), xb.shape[0], p,
                                      _u32p(out))
    assert rc == 0
    return out
