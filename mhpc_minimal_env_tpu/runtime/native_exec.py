"""ctypes bindings for the native real-time execution engine
(native/executor.cpp).  Builds the shared library on first use.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmhpc_exec.so")

_c_double_p = ctypes.POINTER(ctypes.c_double)


def _build():
    src = os.path.join(_NATIVE_DIR, "executor.cpp")
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, src],
        check=True,
    )


def _load():
    if not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH)
        < os.path.getmtime(os.path.join(_NATIVE_DIR, "executor.cpp"))
    ):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mhpc_exec_create.restype = ctypes.c_void_p
    lib.mhpc_exec_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int
    ]
    lib.mhpc_exec_destroy.argtypes = [ctypes.c_void_p]
    lib.mhpc_exec_set_torque_limit.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.mhpc_exec_publish.restype = ctypes.c_int
    lib.mhpc_exec_publish.argtypes = [
        ctypes.c_void_p, ctypes.c_int, _c_double_p, _c_double_p, _c_double_p
    ]
    lib.mhpc_exec_plan_seq.restype = ctypes.c_uint64
    lib.mhpc_exec_plan_seq.argtypes = [ctypes.c_void_p]
    lib.mhpc_exec_tick.restype = ctypes.c_int
    lib.mhpc_exec_tick.argtypes = [ctypes.c_void_p, _c_double_p, _c_double_p]
    lib.mhpc_exec_log_len.restype = ctypes.c_int
    lib.mhpc_exec_log_len.argtypes = [ctypes.c_void_p]
    lib.mhpc_exec_read_log.restype = ctypes.c_int
    lib.mhpc_exec_read_log.argtypes = [ctypes.c_void_p, _c_double_p, ctypes.c_int]
    return lib


_lib = None


def get_lib():
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


class NativeExecutor:
    """Real-time feedback-policy executor (double-buffered plans, ring log)."""

    def __init__(self, xs=14, us=4, log_capacity=4096, max_steps=256):
        self._lib = get_lib()
        self.xs, self.us = xs, us
        self.max_steps = max_steps
        self._h = self._lib.mhpc_exec_create(xs, us, log_capacity, max_steps)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.mhpc_exec_destroy(self._h)
            self._h = None

    def publish(self, x_nom, u_nom, K):
        x_nom = np.ascontiguousarray(x_nom, dtype=np.float64)
        u_nom = np.ascontiguousarray(u_nom, dtype=np.float64)
        K = np.ascontiguousarray(K, dtype=np.float64)
        n = x_nom.shape[0]
        assert x_nom.shape == (n, self.xs) and u_nom.shape == (n, self.us)
        assert K.shape == (n, self.us, self.xs)
        rc = self._lib.mhpc_exec_publish(
            self._h, n,
            x_nom.ctypes.data_as(_c_double_p),
            u_nom.ctypes.data_as(_c_double_p),
            K.ctypes.data_as(_c_double_p),
        )
        if rc != 0:
            raise ValueError(
                f"plan of {n} steps exceeds preallocated max_steps="
                f"{self.max_steps}")

    def set_torque_limit(self, lim: float):
        self._lib.mhpc_exec_set_torque_limit(self._h, float(lim))

    @property
    def plan_seq(self):
        return int(self._lib.mhpc_exec_plan_seq(self._h))

    def tick(self, x):
        x = np.ascontiguousarray(x, dtype=np.float64)
        u = np.zeros(self.us, dtype=np.float64)
        k = self._lib.mhpc_exec_tick(
            self._h, x.ctypes.data_as(_c_double_p), u.ctypes.data_as(_c_double_p)
        )
        return k, u

    def read_log(self, max_rows=4096):
        out = np.zeros((max_rows, self.xs + self.us), dtype=np.float64)
        n = self._lib.mhpc_exec_read_log(
            self._h, out.ctypes.data_as(_c_double_p), max_rows
        )
        return out[:n]
