"""ctypes bridge to the reference's generated CasADi kernels (debug tooling).

Loads /tmp/refrun/libkern.so (compiled from /root/reference/CasadiGen/source)
and exposes dense numpy wrappers.  Used only for validation tooling — never on
the framework's compute path.
"""
import ctypes
import numpy as np

LIB = ctypes.CDLL("/tmp/refrun/libkern.so")
c_double_p = ctypes.POINTER(ctypes.c_double)
c_longlong_p = ctypes.POINTER(ctypes.c_longlong)


def _sparsity(fname, i):
    f = getattr(LIB, fname + "_sparsity_out")
    f.restype = c_longlong_p
    sp = f(ctypes.c_longlong(i))
    nrow, ncol = sp[0], sp[1]
    colptr = [sp[2 + j] for j in range(ncol + 1)]
    nnz = colptr[-1]
    rows = [sp[2 + ncol + 1 + j] for j in range(nnz)]
    return nrow, ncol, colptr, rows


def call(fname, args, n_out):
    """Evaluate kernel; returns list of DENSE column-major outputs."""
    f = getattr(LIB, fname)
    f.restype = ctypes.c_int
    work = getattr(LIB, fname + "_work")
    sz = [ctypes.c_longlong(0) for _ in range(4)]
    work(*[ctypes.byref(s) for s in sz])
    iw = (ctypes.c_longlong * max(1, sz[2].value))()
    w = (ctypes.c_double * max(1, sz[3].value))()

    arg_arr = (c_double_p * len(args))()
    np_args = [np.ascontiguousarray(a, dtype=np.float64) for a in args]
    for i, a in enumerate(np_args):
        arg_arr[i] = a.ctypes.data_as(c_double_p)

    outs_sparse = []
    res_arr = (c_double_p * n_out)()
    metas = []
    for i in range(n_out):
        nrow, ncol, colptr, rows = _sparsity(fname, i)
        nnz = colptr[-1]
        buf = np.zeros(nnz, dtype=np.float64)
        outs_sparse.append(buf)
        metas.append((nrow, ncol, colptr, rows))
        res_arr[i] = buf.ctypes.data_as(c_double_p)

    rc = f(arg_arr, res_arr, iw, w, ctypes.c_int(0))
    assert rc == 0

    dense = []
    for (nrow, ncol, colptr, rows), buf in zip(metas, outs_sparse):
        M = np.zeros((nrow, ncol))
        k = 0
        for c in range(ncol):
            for _ in range(colptr[c], colptr[c + 1]):
                M[rows[k], c] = buf[k]
                k += 1
        dense.append(M)
    return dense


def dyn(mode, x, u):
    name = {1: "Dyn_BS", 2: "Dyn_FL", 3: "Dyn_FS", 4: "Dyn_FL"}[mode]
    xd, y = call(name, [x, u], 2)
    return xd.ravel(), y.ravel()


def dyn_par(mode, x, u):
    name = {1: "Dyn_BS_par", 2: "Dyn_FL_par", 3: "Dyn_FS_par", 4: "Dyn_FL_par"}[mode]
    Ac, Bc, C, D = call(name, [x, u], 4)
    return Ac, Bc, C, D


def imp(which, x):
    xn, y = call("Imp_F" if which == "F" else "Imp_B", [x], 2)
    return xn.ravel(), y.ravel()


def imp_par(which, x):
    return call("Imp_F_par" if which == "F" else "Imp_B_par", [x], 1)[0]


def jac(which, x):
    J, Jd = call("Jacob_F" if which == "F" else "Jacob_B", [x], 2)
    return J, Jd


def tconstr(which, x):
    h, hx, hxx = call(
        "WB_FL1_terminal_constr" if which == 1 else "WB_FL2_terminal_constr", [x], 3
    )
    return float(h.ravel()[0]), hx.ravel(), hxx
