"""ctypes bindings for the native mesh-processing runtime (native/meshops.cpp).

Host-side counterpart of the reference's mcubes / pymeshlab / pyfqmr tooling
(reference `meshutils.py`, `nerf/renderer.py:497-698`).  The shared library is
built on demand with g++ (native/build.sh); all functions exchange plain
numpy buffers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_LIB = None


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    so = os.path.join(root, "native", "libmeshops.so")
    if not os.path.exists(so):
        subprocess.check_call(["sh", os.path.join(root, "native", "build.sh")])
    lib = ctypes.CDLL(so)

    c_fp = ctypes.POINTER(ctypes.c_float)
    c_ip = ctypes.POINTER(ctypes.c_int32)
    c_fpp = ctypes.POINTER(c_fp)
    c_ipp = ctypes.POINTER(c_ip)
    c_i64p = ctypes.POINTER(ctypes.c_int64)

    lib.marching_tets.restype = ctypes.c_int
    lib.marching_tets.argtypes = [
        c_fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        c_fp, c_fp, c_fpp, c_i64p, c_ipp, c_i64p,
    ]
    lib.decimate_qem.restype = ctypes.c_int
    lib.decimate_qem.argtypes = [
        c_fp, ctypes.c_int64, c_ip, ctypes.c_int64, ctypes.c_int64,
        c_fpp, c_i64p, c_ipp, c_i64p,
    ]
    lib.clean_components.restype = ctypes.c_int
    lib.clean_components.argtypes = [
        c_fp, ctypes.c_int64, c_ip, ctypes.c_int64, ctypes.c_int32, ctypes.c_float,
        c_fpp, c_i64p, c_ipp, c_i64p,
    ]
    lib.mesh_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def _collect(lib, pv, nv, pt, nt) -> Tuple[np.ndarray, np.ndarray]:
    n_v, n_t = nv.value, nt.value
    verts = np.ctypeslib.as_array(pv, shape=(max(n_v, 1), 3))[:n_v].copy()
    tris = np.ctypeslib.as_array(pt, shape=(max(n_t, 1), 3))[:n_t].copy()
    lib.mesh_free(ctypes.cast(pv, ctypes.c_void_p))
    lib.mesh_free(ctypes.cast(pt, ctypes.c_void_p))
    return verts.astype(np.float32), tris.astype(np.int32)


def marching_tets(
    grid: np.ndarray, iso: float, origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0)
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of grid [nx,ny,nz] -> (verts [V,3], tris [T,3])."""
    lib = _lib()
    g = np.ascontiguousarray(grid, dtype=np.float32)
    o = np.asarray(origin, np.float32)
    s = np.asarray(spacing, np.float32)
    pv = ctypes.POINTER(ctypes.c_float)()
    pt = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    ret = lib.marching_tets(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        g.shape[0], g.shape[1], g.shape[2], ctypes.c_float(iso),
        o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(pv), ctypes.byref(nv), ctypes.byref(pt), ctypes.byref(nt),
    )
    assert ret == 0
    return _collect(lib, pv, nv, pt, nt)


def decimate(verts: np.ndarray, tris: np.ndarray, target_faces: int) -> Tuple[np.ndarray, np.ndarray]:
    """QEM edge-collapse decimation (reference meshutils.py:64-97 decimate_mesh)."""
    if tris.shape[0] <= target_faces:
        return verts.astype(np.float32), tris.astype(np.int32)
    lib = _lib()
    v = np.ascontiguousarray(verts, np.float32)
    t = np.ascontiguousarray(tris, np.int32)
    pv = ctypes.POINTER(ctypes.c_float)()
    pt = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    ret = lib.decimate_qem(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), t.shape[0],
        int(target_faces),
        ctypes.byref(pv), ctypes.byref(nv), ctypes.byref(pt), ctypes.byref(nt),
    )
    assert ret == 0
    return _collect(lib, pv, nv, pt, nt)


def clean_components(
    verts: np.ndarray, tris: np.ndarray, min_faces: int = 8, min_diameter: float = 0.05
) -> Tuple[np.ndarray, np.ndarray]:
    """Drop tiny disconnected components (reference meshutils.py:183-225 clean_mesh)."""
    lib = _lib()
    v = np.ascontiguousarray(verts, np.float32)
    t = np.ascontiguousarray(tris, np.int32)
    pv = ctypes.POINTER(ctypes.c_float)()
    pt = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    ret = lib.clean_components(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), t.shape[0],
        int(min_faces), ctypes.c_float(min_diameter),
        ctypes.byref(pv), ctypes.byref(nv), ctypes.byref(pt), ctypes.byref(nt),
    )
    assert ret == 0
    return _collect(lib, pv, nv, pt, nt)
