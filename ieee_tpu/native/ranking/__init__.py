"""ctypes bindings for the native C++ ranking oracle.

Builds on first use (g++ -O3 -shared); the reference's equivalent was the
Cython ``rank_cylib`` extension built by ``setup.py`` (SURVEY §2.6).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "rank.cpp")
_LIB = osp.join(_HERE, "librank.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not osp.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.eval_market1501.restype = ctypes.c_int
        lib.eval_market1501.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return lib


def eval_market1501_native(distmat, q_pids, g_pids, q_camids, g_camids,
                           max_rank):
    """C++ CMC/mAP. Same semantics as ops.ranking.eval_market1501_numpy."""
    lib = _load()
    distmat = np.ascontiguousarray(distmat, np.float32)
    num_q, num_g = distmat.shape
    max_rank = min(int(max_rank), num_g)
    q_pids = np.ascontiguousarray(q_pids, np.int64)
    g_pids = np.ascontiguousarray(g_pids, np.int64)
    q_camids = np.ascontiguousarray(q_camids, np.int64)
    g_camids = np.ascontiguousarray(g_camids, np.int64)
    cmc = np.zeros(max_rank, np.float32)
    mAP = np.zeros(1, np.float32)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    valid = lib.eval_market1501(
        p(distmat, ctypes.c_float), p(q_pids, ctypes.c_int64),
        p(g_pids, ctypes.c_int64), p(q_camids, ctypes.c_int64),
        p(g_camids, ctypes.c_int64), num_q, num_g, max_rank,
        p(cmc, ctypes.c_float), p(mAP, ctypes.c_float),
    )
    assert valid > 0, "Error: all query identities do not appear in gallery"
    return cmc, float(mAP[0])
