"""On-demand native (C++) helpers, with graceful numpy fallback.

The reference is pure Python end-to-end (SURVEY.md §2.2: zero first-party
native code); here the host-side runtime around the TPU kernels is native
where it pays.  Currently: the PET builder
(:func:`krylov_tpu.ops.pallas_spmv.build_pet`'s sort/schedule/scatter
passes), ~10x the numpy path on large matrices.

The shared object is compiled once per machine with ``g++ -O3`` into the
user cache dir and loaded via ctypes (no build-system dependency, no
pybind11).  Every native path has the numpy implementation as fallback
and ground truth; set ``KRYLOV_TPU_NO_NATIVE=1`` to disable natives.
"""

import ctypes
import os
import subprocess
import sys
import tempfile

_CSRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
_lib = None
_tried = False


def _cache_dir():
    base = os.environ.get(
        "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
    )
    d = os.path.join(base, "krylov_tpu")
    os.makedirs(d, exist_ok=True)
    return d


class _PetOut(ctypes.Structure):
    _fields_ = [
        ("nchunks", ctypes.c_int64),
        ("lc", ctypes.c_int64),
        ("nnz", ctypes.c_int64),
        ("fill", ctypes.c_double),
        ("ent", ctypes.POINTER(ctypes.c_int8)),
        ("dat", ctypes.POINTER(ctypes.c_float)),
        ("meta", ctypes.POINTER(ctypes.c_int32)),
        ("meta_v", ctypes.POINTER(ctypes.c_int32)),
    ]


# allocator callback for the copy-free pet_build2 ABI: Python hands out
# zeroed numpy buffers the builder fills in place
_PET_ALLOC_FN = ctypes.CFUNCTYPE(
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32
)


def _compile():
    src = os.path.join(_CSRC, "pet_build.cpp")
    with open(src, "rb") as f:
        blob = f.read()
    import hashlib

    tag = hashlib.sha256(blob).hexdigest()[:16]
    so = os.path.join(_cache_dir(), f"_pet_build_{tag}.so")
    if not os.path.exists(so):
        with tempfile.TemporaryDirectory() as td:
            tmp = os.path.join(td, "pet_build.so")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                 "-o", tmp],
                check=True, capture_output=True,
            )
            os.replace(tmp, so)
    return so


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("KRYLOV_TPU_NO_NATIVE"):
        return None
    try:
        lib = ctypes.CDLL(_compile())
        lib.pet_build.restype = ctypes.POINTER(_PetOut)
        lib.pet_build.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.pet_free.restype = None
        lib.pet_free.argtypes = [ctypes.POINTER(_PetOut)]
        lib.pet_build2.restype = ctypes.c_int32
        lib.pet_build2.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64,
            _PET_ALLOC_FN,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except Exception as e:  # no compiler / sandboxed fs / bad cache
        sys.stderr.write(f"krylov_tpu: native build unavailable ({e!r}); "
                         "using the numpy PET builder\n")
        _lib = None
    return _lib


def pet_build_native(csr, lc=None, cwp=None):
    """Native twin of the numpy PET array construction.

    ``csr``: canonical scipy CSR, float32.  Returns the dict of HOST
    numpy arrays + geometry (same contents as the numpy path; callers
    convert to device arrays), or None when the native path is
    unavailable.

    Uses the copy-free ``pet_build2`` ABI: the builder writes straight
    into numpy-owned zeroed buffers (no output copies — the old path
    double-buffered ~0.5 GB on large matrices) and reads scipy's native
    int32 index arrays without widening.
    """
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    n, m = csr.shape
    indptr, indices = csr.indptr, csr.indices
    if indptr.dtype == np.int32 and indices.dtype == np.int32:
        idx64 = 0
    else:
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        idx64 = 1
    data = np.ascontiguousarray(csr.data, dtype=np.float32)

    bufs = {}

    @_PET_ALLOC_FN
    def _alloc(nbytes, which):
        a = np.zeros(int(nbytes), np.uint8)
        bufs[int(which)] = a
        return a.ctypes.data

    nchunks_c = ctypes.c_int64()
    lc_c = ctypes.c_int64()
    fill_c = ctypes.c_double()
    rc = lib.pet_build2(
        n, m, int(csr.nnz),
        indptr.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        idx64,
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        0 if lc is None else int(lc),
        0 if cwp is None else int(cwp),
        _alloc,
        ctypes.byref(nchunks_c), ctypes.byref(lc_c), ctypes.byref(fill_c),
    )
    if rc != 0:
        return None
    nchunks, lc_out = int(nchunks_c.value), int(lc_c.value)
    return {
        "ent": bufs[0].view(np.int8).reshape(nchunks * lc_out, 128),
        "dat": bufs[1].view(np.float32).reshape(nchunks * lc_out, 128),
        "meta": bufs[2].view(np.int32),
        "meta_v": bufs[3].view(np.int32).reshape(nchunks * 8, 128),
        "nchunks": nchunks, "lc": lc_out, "fill": float(fill_c.value),
    }


# ---- amg_agg.cpp: AMG pairwise-matching aggregation -----------------------

_agg_lib = None
_agg_tried = False


def _load_agg():
    global _agg_lib, _agg_tried
    if _agg_tried:
        return _agg_lib
    _agg_tried = True
    if os.environ.get("KRYLOV_TPU_NO_NATIVE"):
        return None
    try:
        src = os.path.join(_CSRC, "amg_agg.cpp")
        with open(src, "rb") as f:
            blob = f.read()
        import hashlib

        tag = hashlib.sha256(blob).hexdigest()[:16]
        so = os.path.join(_cache_dir(), f"_amg_agg_{tag}.so")
        if not os.path.exists(so):
            with tempfile.TemporaryDirectory() as td:
                tmp = os.path.join(td, "amg_agg.so")
                # -ffp-contract=off: the sort key must be bit-identical
                # to numpy's (no FMA fusion of the final mul-subtract)
                subprocess.run(
                    ["g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
                     "-std=c++17", src, "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.amg_pairwise_labels.restype = ctypes.c_int64
        lib.amg_pairwise_labels.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_double, ctypes.c_int64, i64p,
        ]
        _agg_lib = lib
    except Exception as e:  # no compiler / sandboxed fs / bad cache
        sys.stderr.write(f"krylov_tpu: native amg_agg unavailable ({e!r}); "
                         "using the numpy aggregation path\n")
        _agg_lib = None
    return _agg_lib


def amg_pairwise_labels_native(csr, theta, rounds=8):
    """Native twin of ``amg._pairwise_labels`` (label-identical; tests
    assert equality).  ``csr`` must be canonical (sorted indices, no
    duplicates); returns ``(labels, n_agg)`` or None when the native
    path is unavailable or the dtype is unsupported (complex)."""
    import numpy as np

    lib = _load_agg()
    if lib is None:
        return None
    if csr.dtype == np.float32:
        kind = 0
    elif csr.dtype == np.float64:
        kind = 1
    else:
        return None
    if not csr.has_sorted_indices:
        return None
    n = csr.shape[0]
    # scipy's int32/int64 index arrays are read directly by the kernel
    # (idx_kind dispatch) — converting 2*nnz indices to int64 per call
    # was an O(nnz) copy tax on every matching pass
    if csr.indptr.dtype == np.int32 and csr.indices.dtype == np.int32:
        idx_kind = 0
        indptr = np.ascontiguousarray(csr.indptr)
        indices = np.ascontiguousarray(csr.indices)
    else:
        idx_kind = 1
        indptr = np.ascontiguousarray(csr.indptr, dtype=np.int64)
        indices = np.ascontiguousarray(csr.indices, dtype=np.int64)
    data = np.ascontiguousarray(csr.data)
    labels = np.empty(n, dtype=np.int64)
    n_agg = lib.amg_pairwise_labels(
        n,
        indptr.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        idx_kind,
        data.ctypes.data_as(ctypes.c_void_p),
        kind, float(theta), int(rounds),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n_agg < 0:
        return None
    return labels, int(n_agg)


# ---- amg_rap.cpp: smoothed-aggregation Galerkin triple product ------------

_rap_lib = None
_rap_tried = False

_RAP_ALLOC_FN = ctypes.CFUNCTYPE(
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32
)


def _load_rap():
    global _rap_lib, _rap_tried
    if _rap_tried:
        return _rap_lib
    _rap_tried = True
    if os.environ.get("KRYLOV_TPU_NO_NATIVE"):
        return None
    try:
        src = os.path.join(_CSRC, "amg_rap.cpp")
        with open(src, "rb") as f:
            blob = f.read()
        import hashlib

        tag = hashlib.sha256(blob).hexdigest()[:16]
        so = os.path.join(_cache_dir(), f"_amg_rap_{tag}.so")
        if not os.path.exists(so):
            with tempfile.TemporaryDirectory() as td:
                tmp = os.path.join(td, "amg_rap.so")
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                     "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        lib.amg_rap.restype = ctypes.c_int64
        lib.amg_rap.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), _RAP_ALLOC_FN,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _rap_lib = lib
    except Exception as e:  # no compiler / sandboxed fs / bad cache
        sys.stderr.write(f"krylov_tpu: native amg_rap unavailable ({e!r}); "
                         "using the scipy Galerkin path\n")
        _rap_lib = None
    return _rap_lib


def amg_rap_native(csr, labels, n_agg, scale=None):
    """Native Galerkin triple product ``P^H A P`` with the SA prolongator
    ``P = P_hat - diag(scale) (A P_hat)`` (``scale=None``: the tentative
    ``P_hat`` itself — plain aggregation / relabel-and-sum).

    ``csr`` must be canonical real f32/f64 CSR.  Returns the coarse
    matrix as a scipy CSR in ``csr.dtype`` with sorted indices, or None
    when the native path is unavailable (complex dtypes fall back to the
    scipy ground-truth path in ``amg._smoothed_prolongator``)."""
    import numpy as np

    lib = _load_rap()
    if lib is None:
        return None
    if csr.dtype == np.float32:
        data_kind = 0
    elif csr.dtype == np.float64:
        data_kind = 1
    else:
        return None
    n = csr.shape[0]
    if csr.indptr.dtype == np.int32 and csr.indices.dtype == np.int32:
        idx_kind = 0
        indptr = np.ascontiguousarray(csr.indptr)
        indices = np.ascontiguousarray(csr.indices)
    else:
        idx_kind = 1
        indptr = np.ascontiguousarray(csr.indptr, dtype=np.int64)
        indices = np.ascontiguousarray(csr.indices, dtype=np.int64)
    data = np.ascontiguousarray(csr.data)
    labels64 = np.ascontiguousarray(labels, dtype=np.int64)
    scale64 = (
        None if scale is None
        else np.ascontiguousarray(scale, dtype=np.float64)
    )

    bufs = {}

    @_RAP_ALLOC_FN
    def _alloc(nbytes, which):
        a = np.zeros(int(nbytes), np.uint8)
        bufs[int(which)] = a
        return a.ctypes.data

    nnz_c = ctypes.c_int64()
    rc = lib.amg_rap(
        n,
        indptr.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        idx_kind,
        data.ctypes.data_as(ctypes.c_void_p),
        data_kind,
        labels64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(n_agg),
        (None if scale64 is None
         else scale64.ctypes.data_as(ctypes.POINTER(ctypes.c_double))),
        _alloc,
        ctypes.byref(nnz_c),
    )
    if rc != 0:
        return None
    import scipy.sparse

    nnz = int(nnz_c.value)
    Ac = scipy.sparse.csr_matrix(
        (bufs[2].view(np.float64)[:nnz].astype(csr.dtype),
         bufs[1].view(np.int32)[:nnz],
         bufs[0].view(np.int64)),
        shape=(int(n_agg), int(n_agg)),
    )
    Ac.has_sorted_indices = True  # rows emitted sorted by the kernel
    return Ac


# ---- ilu0.cpp: incomplete-LU setup helpers --------------------------------

_ilu_lib = None
_ilu_tried = False


def _load_ilu():
    global _ilu_lib, _ilu_tried
    if _ilu_tried:
        return _ilu_lib
    _ilu_tried = True
    if os.environ.get("KRYLOV_TPU_NO_NATIVE"):
        return None
    try:
        src = os.path.join(_CSRC, "ilu0.cpp")
        with open(src, "rb") as f:
            blob = f.read()
        import hashlib

        tag = hashlib.sha256(blob).hexdigest()[:16]
        so = os.path.join(_cache_dir(), f"_ilu0_{tag}.so")
        if not os.path.exists(so):
            with tempfile.TemporaryDirectory() as td:
                tmp = os.path.join(td, "ilu0.so")
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
                     "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.ilu0_factor.restype = ctypes.c_int64
        lib.ilu0_factor.argtypes = [
            ctypes.c_int64, i64p, i64p, ctypes.POINTER(ctypes.c_double),
        ]
        lib.tri_levels.restype = ctypes.c_int64
        lib.tri_levels.argtypes = [
            ctypes.c_int64, i64p, i64p, ctypes.c_int64, i64p,
        ]
        _ilu_lib = lib
    except Exception as e:  # no compiler / sandboxed fs / bad cache
        sys.stderr.write(f"krylov_tpu: native ilu0 unavailable ({e!r}); "
                         "using the numpy setup path\n")
        _ilu_lib = None
    return _ilu_lib


def ilu0_factor_native(csr):
    """Native in-place ILU(0) numerics; returns the factored ``data``
    (float64) or None when the native path is unavailable.  ``csr`` must
    be canonical (sorted indices)."""
    import numpy as np

    lib = _load_ilu()
    if lib is None or np.iscomplexobj(csr.data):
        # the C kernel is real-f64; complex matrices take the numpy path
        return None
    n = csr.shape[0]
    indptr = np.ascontiguousarray(csr.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(csr.indices, dtype=np.int64)
    data = np.ascontiguousarray(csr.data, dtype=np.float64).copy()
    rc = lib.ilu0_factor(
        n,
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return data if rc == 0 else None


def tri_levels_native(sp_csr, lower):
    """Native dependency-level assignment; returns the per-row level
    array (int64) or None when the native path is unavailable."""
    import numpy as np

    lib = _load_ilu()
    if lib is None:
        return None
    n = sp_csr.shape[0]
    indptr = np.ascontiguousarray(sp_csr.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(sp_csr.indices, dtype=np.int64)
    level = np.zeros(n, dtype=np.int64)
    lib.tri_levels(
        n,
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        1 if lower else 0,
        level.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return level
