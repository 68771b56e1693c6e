"""ctypes bindings for the native host runtime (``native/qprop_native.cpp``).

Compiled on demand (``g++ -O3 -shared``) into the package directory;
every entry point has a pure-Python/scipy fallback so the framework
works without a toolchain (``native_available()`` reports the state).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = [
    "native_available",
    "tfim_chain_csr",
    "tfim_lattice2d_csr",
    "csr_spmv",
    "band_partition_remap",
]

_REPO_ROOT = Path(__file__).resolve().parent.parent
_SRC = _REPO_ROOT / "native" / "qprop_native.cpp"
_SO = Path(__file__).resolve().parent / "_qprop_native.so"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_I64 = ctypes.POINTER(ctypes.c_int64)
_F64 = ctypes.POINTER(ctypes.c_double)


def _build() -> bool:
    if not _SRC.exists():
        return False
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        str(_SRC),
        "-o",
        str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not _SO.exists() or (
            _SRC.exists() and _SRC.stat().st_mtime > _SO.stat().st_mtime
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        lib.tfim_chain_csr.restype = ctypes.c_int64
        lib.tfim_chain_csr.argtypes = [
            ctypes.c_int32, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int32, _I64, _I64, _F64, _F64,
        ]
        lib.tfim_lattice2d_csr.restype = ctypes.c_int64
        lib.tfim_lattice2d_csr.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, _I64, _I64, _F64, _F64,
        ]
        lib.csr_spmv_z.restype = None
        lib.csr_spmv_z.argtypes = [ctypes.c_int64, _I64, _I64] + [_F64] * 6
        lib.csr_band_partition_remap.restype = ctypes.c_int64
        lib.csr_band_partition_remap.argtypes = [
            ctypes.c_int64, ctypes.c_int64, _I64, _I64, _I64,
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def _ptr_i64(a):
    return a.ctypes.data_as(_I64)


def _ptr_f64(a):
    return a.ctypes.data_as(_F64)


def tfim_chain_csr(L: int, J=1.0, g=1.0, h=0.0, periodic=False):
    """CSR arrays ``(indptr, cols, values)`` of the 1D TFIM Hamiltonian
    on ``2^L`` dimensions, assembled natively in O(nnz) (scipy-kron
    fallback for small L)."""
    lib = _load()
    N = 1 << L
    nnz = (L + 1) * N
    if lib is not None:
        indptr = np.empty(N + 1, dtype=np.int64)
        cols = np.empty(nnz, dtype=np.int64)
        vr = np.empty(nnz, dtype=np.float64)
        vi = np.empty(nnz, dtype=np.float64)
        lib.tfim_chain_csr(
            L, float(J), float(g), float(h), int(bool(periodic)),
            _ptr_i64(indptr), _ptr_i64(cols), _ptr_f64(vr), _ptr_f64(vi),
        )
        return indptr, cols, vr + 1j * vi
    import scipy.sparse as sp

    from .models.lattice import PAULI

    I2 = sp.identity(2, format="csr", dtype=np.complex128)
    X = sp.csr_matrix(PAULI["X"])
    Z = sp.csr_matrix(PAULI["Z"])

    def site(op, i):
        out = sp.identity(1, format="csr", dtype=np.complex128)
        for j in range(L):
            out = sp.kron(out, op if j == i else I2, format="csr")
        return out

    H = sp.csr_matrix((N, N), dtype=np.complex128)
    bonds = [(i, i + 1) for i in range(L - 1)] + (
        [(L - 1, 0)] if periodic else []
    )
    for i, j in bonds:
        H = H + J * (site(Z, i) @ site(Z, j))
    for i in range(L):
        H = H + h * site(Z, i) + g * site(X, i)
    H = H.tocsr()
    H.sum_duplicates()
    return (
        H.indptr.astype(np.int64),
        H.indices.astype(np.int64),
        H.data.astype(np.complex128),
    )


def tfim_lattice2d_csr(Lx: int, Ly: int, J=1.0, g=1.0, h=0.0):
    """CSR arrays of the 2D open-boundary TFIM on ``2^(Lx*Ly)`` dims."""
    lib = _load()
    L = Lx * Ly
    N = 1 << L
    nnz = (L + 1) * N
    if lib is None:
        raise RuntimeError(
            "2D lattice assembly requires the native library (dimensions "
            "are too large for the scipy fallback)"
        )
    indptr = np.empty(N + 1, dtype=np.int64)
    cols = np.empty(nnz, dtype=np.int64)
    vr = np.empty(nnz, dtype=np.float64)
    vi = np.empty(nnz, dtype=np.float64)
    lib.tfim_lattice2d_csr(
        Lx, Ly, float(J), float(g), float(h),
        _ptr_i64(indptr), _ptr_i64(cols), _ptr_f64(vr), _ptr_f64(vi),
    )
    return indptr, cols, vr + 1j * vi


def csr_spmv(indptr, cols, values, x):
    """Multithreaded native complex CSR matvec (host baseline)."""
    lib = _load()
    n = len(indptr) - 1
    x = np.ascontiguousarray(x, dtype=np.complex128)
    if lib is None:
        import scipy.sparse as sp

        A = sp.csr_matrix((values, cols, indptr), shape=(n, n))
        return A @ x
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    ar = np.ascontiguousarray(values.real)
    ai = np.ascontiguousarray(values.imag)
    xr = np.ascontiguousarray(x.real)
    xi = np.ascontiguousarray(x.imag)
    yr = np.empty(n, dtype=np.float64)
    yi = np.empty(n, dtype=np.float64)
    lib.csr_spmv_z(
        n, _ptr_i64(indptr), _ptr_i64(cols),
        _ptr_f64(ar), _ptr_f64(ai), _ptr_f64(xr), _ptr_f64(xi),
        _ptr_f64(yr), _ptr_f64(yi),
    )
    return yr + 1j * yi


def band_partition_remap(indptr, cols, n_devices: int):
    """Halo width + extended-local column remap for a row-block
    partition (native two-pass; numpy fallback).  Returns
    ``(halo, ext_cols)`` or ``(None, None)`` if the matrix is not
    nearest-neighbor banded for this partition."""
    n = len(indptr) - 1
    lib = _load()
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    if lib is not None:
        ext = np.empty_like(cols)
        w = lib.csr_band_partition_remap(
            n, n_devices, _ptr_i64(indptr), _ptr_i64(cols), _ptr_i64(ext)
        )
        if w < 0:
            return None, None
        return int(w), ext
    n_local = n // n_devices
    row = np.repeat(np.arange(n), np.diff(indptr))
    lo = (row // n_local) * n_local
    w = int(
        max(
            np.maximum(lo - cols, 0).max(initial=0),
            np.maximum(cols - (lo + n_local - 1), 0).max(initial=0),
        )
    )
    if w > n_local:
        return None, None
    return w, cols - (lo - w)
