"""ctypes bridge to the native host runtime (native/ → libdwbc_host.so).

The C++ library provides: the URDF→model compiler, .dwbcm serialization,
golden-matrix IO, and the real-time producer/consumer loop harness.  This
module loads it, exposes pythonic wrappers, and can deserialize .dwbcm files
into :class:`RobotModel` so the native and Python compilers are
interchangeable (cross-checked in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATHS = [
    os.path.join(_NATIVE_DIR, "build", "libdwbc_host.so"),
]

_lib = None


def build_native(verbose: bool = False) -> str:
    """Build the native library with cmake+ninja; returns the .so path."""
    build_dir = os.path.join(_NATIVE_DIR, "build")
    subprocess.run(
        ["cmake", "-B", build_dir, "-G", "Ninja", _NATIVE_DIR],
        check=True, capture_output=not verbose,
    )
    subprocess.run(
        ["ninja", "-C", build_dir], check=True, capture_output=not verbose
    )
    return os.path.join(build_dir, "libdwbc_host.so")


def get_lib(auto_build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    path = next((p for p in _LIB_PATHS if os.path.exists(p)), None)
    if path is None and auto_build:
        path = build_native()
    if path is None:
        raise RuntimeError("libdwbc_host.so not found; run native build")
    lib = ctypes.CDLL(path)
    lib.dwbc_compile_urdf.restype = ctypes.c_int
    lib.dwbc_compile_urdf.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int
    ]
    lib.dwbc_model_info.restype = ctypes.c_int
    lib.dwbc_model_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.dwbc_golden_diff.restype = ctypes.c_double
    lib.dwbc_golden_diff.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ctypes.c_longlong, ctypes.c_longlong,
    ]
    lib.dwbc_golden_write.restype = ctypes.c_int
    lib.dwbc_golden_write.argtypes = lib.dwbc_golden_diff.argtypes
    _lib = lib
    return lib


def compile_urdf_native(urdf_path: str, out_path: str, floating: bool = True):
    lib = get_lib()
    err = ctypes.create_string_buffer(512)
    rc = lib.dwbc_compile_urdf(
        urdf_path.encode(), 1 if floating else 0, out_path.encode(), err, 512
    )
    if rc != 0:
        raise RuntimeError(f"native compile failed: {err.value.decode()}")
    return out_path


def load_dwbcm(path: str):
    """Deserialize a native .dwbcm artifact into a RobotModel."""
    from .model.compile import RobotModel

    with open(path, "rb") as f:
        raw = f.read()
    off = 0

    def take(n):
        nonlocal off
        out = raw[off : off + n]
        off += n
        return out

    assert take(8) == b"DWBCM001", "bad magic"
    floating, nbody, ndof, model_dof = np.frombuffer(take(32), dtype=np.int64)

    def take_str():
        (n,) = np.frombuffer(take(8), dtype=np.int64)
        return take(int(n)).decode()

    name = take_str()
    body_names = tuple(take_str() for _ in range(nbody))
    joint_names = tuple(take_str() for _ in range(nbody))

    def arr(dtype, *shape):
        n = int(np.prod(shape))
        a = np.frombuffer(take(n * np.dtype(dtype).itemsize), dtype=dtype)
        return a.reshape(shape).copy()

    parent = arr(np.int32, nbody)
    q_index = arr(np.int32, nbody)
    X_T_rot = arr(np.float64, nbody, 3, 3)
    X_T_trans = arr(np.float64, nbody, 3)
    axis = arr(np.float64, nbody, 3)
    mass = arr(np.float64, nbody)
    com = arr(np.float64, nbody, 3)
    inertia = arr(np.float64, nbody, 3, 3)
    jl = [arr(np.float64, model_dof) for _ in range(5)]
    (nf,) = np.frombuffer(take(8), dtype=np.int64)
    fixed = {}
    for _ in range(int(nf)):
        nm = take_str()
        (body,) = np.frombuffer(take(8), dtype=np.int64)
        R = arr(np.float64, 3, 3)
        p = arr(np.float64, 3)
        fixed[nm] = (int(body), R, p)

    base_dof = 6 if floating else 0
    amask = np.zeros((nbody, ndof))
    for i in range(int(nbody)):
        if floating:
            amask[i, 0:6] = 1.0
        k = i
        while k > 0:
            amask[i, q_index[k]] = 1.0
            k = parent[k]

    return RobotModel(
        name=name, floating=bool(floating), nbody=int(nbody), ndof=int(ndof),
        nq=int(ndof) + 1 if floating else int(ndof),
        model_dof=int(model_dof),
        body_names=body_names, joint_names=joint_names,
        parent=parent, q_index=q_index, X_T_rot=X_T_rot, X_T_trans=X_T_trans,
        axis=axis, mass=mass, com=com, inertia=inertia, ancestor_mask=amask,
        joint_limit_lower=jl[0], joint_limit_upper=jl[1],
        effort_limit=jl[2], velocity_limit=jl[3], damping=jl[4],
        fixed_frames=fixed, total_mass=float(mass.sum()),
        gravity=np.array([0.0, 0.0, -9.81]),
    )


def golden_diff_native(path: str, mat: np.ndarray) -> float:
    """Frobenius diff via the native reader (column-major golden format)."""
    lib = get_lib()
    m = np.asfortranarray(np.atleast_2d(np.asarray(mat, np.float64)))
    ptr = m.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    return lib.dwbc_golden_diff(path.encode(), ptr, m.shape[0], m.shape[1])


def run_rt_loop(period_us: int, ticks: int, state_dim: int, out_dim: int,
                producer, consumer):
    """Run the native RT loop with Python callbacks (for integration tests;
    production consumers should be native or dispatch pre-compiled XLA)."""
    lib = get_lib()
    PROD = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_double),
                            ctypes.c_longlong, ctypes.c_void_p)
    CONS = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_double),
                            ctypes.POINTER(ctypes.c_double), ctypes.c_void_p)
    lib.dwbc_run_rt_loop.restype = ctypes.c_int
    lib.dwbc_run_rt_loop.argtypes = [
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_longlong, PROD, CONS, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double),
    ]

    def prod_cb(state_ptr, tick, _):
        arr = np.ctypeslib.as_array(state_ptr, shape=(state_dim,))
        producer(arr, int(tick))

    def cons_cb(state_ptr, out_ptr, _):
        s = np.ctypeslib.as_array(state_ptr, shape=(state_dim,))
        o = np.ctypeslib.as_array(out_ptr, shape=(out_dim,))
        consumer(s, o)

    stats = (ctypes.c_double * 6)()
    lib.dwbc_run_rt_loop(
        state_dim, out_dim, period_us, ticks, PROD(prod_cb), CONS(cons_cb),
        None, stats,
    )
    return dict(
        avg_us=stats[0], min_us=stats[1], max_us=stats[2], p99_us=stats[3],
        ticks=int(stats[4]), missed_deadlines=int(stats[5]),
    )
