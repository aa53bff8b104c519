"""URDF → RobotModel via the native C++ parser (native/urdf_loader.cpp).

The reference's robot loading is native C++ (Pinocchio's urdf parser;
models reach crocoddyl via pinocchio::ModelTpl — e.g.
include/crocoddyl/multibody/states/multibody.hxx:25-35 consumes
URDF-derived limits).  Here the native parser flattens the kinematic tree
(merging fixed joints, compositing their inertias) and this module freezes
the result into a :class:`~crocoddyl_tpu.dynamics.model.RobotModel` pytree.

The shared library is built on demand with g++ (cached next to the source);
set CROCOTPU_NATIVE_DIR to relocate the build output.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "urdf_loader.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build_dir() -> str:
    d = os.environ.get("CROCOTPU_NATIVE_DIR") or os.path.join(
        _REPO_ROOT, "native", "build")
    os.makedirs(d, exist_ok=True)
    return d


def _load_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so = os.path.join(_build_dir(), "liburdf_loader.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            cmd = ["g++", "-O2", "-std=c++17", "-fPIC", "-shared",
                   _SRC, "-o", so]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.crocotpu_parse_urdf.restype = ctypes.c_void_p
        lib.crocotpu_parse_urdf.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.crocotpu_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def _decode(x):
    """JSON 'inf'/'-inf' strings → floats."""
    if isinstance(x, str):
        return float(x)
    return x


def load_urdf_string(urdf_text: str, floating_base: bool = True,
                     dtype=np.float64):
    """Parse URDF text into a RobotModel (native C++ parse)."""
    import jax.numpy as jnp
    from ..dynamics.model import RobotModel

    lib = _load_lib()
    ptr = lib.crocotpu_parse_urdf(urdf_text.encode(), int(floating_base))
    try:
        raw = ctypes.cast(ptr, ctypes.c_char_p).value.decode()
    finally:
        lib.crocotpu_free(ptr)
    d = json.loads(raw)
    if "error" in d:
        raise ValueError(f"URDF parse error: {d['error']}")

    def arr(key, shape=None):
        a = np.asarray([[_decode(v) for v in row] if isinstance(row, list)
                        else _decode(row) for row in d[key]], dtype)
        if shape is not None:
            a = a.reshape(shape)
        return a

    nj = len(d["joint_types"])
    nf = max(len(d["frame_names"]), 1)
    fp_R = (arr("fp_R", (nf, 3, 3)) if d["frame_names"]
            else np.eye(3, dtype=dtype)[None])
    fp_p = (arr("fp_p", (nf, 3)) if d["frame_names"]
            else np.zeros((1, 3), dtype))
    return RobotModel(
        joint_types=tuple(d["joint_types"]),
        parents=tuple(d["parents"]),
        joint_names=tuple(d["joint_names"]),
        frame_names=tuple(d["frame_names"]) or ("__world__",),
        frame_parents=tuple(d["frame_parents"]) or (0,),
        jp_R=jnp.asarray(arr("jp_R", (nj, 3, 3))),
        jp_p=jnp.asarray(arr("jp_p", (nj, 3))),
        axis=jnp.asarray(arr("axis", (nj, 3))),
        mass=jnp.asarray(arr("mass", (nj,))),
        com=jnp.asarray(arr("com", (nj, 3))),
        inertia=jnp.asarray(arr("inertia", (nj, 3, 3))),
        fp_R=jnp.asarray(fp_R),
        fp_p=jnp.asarray(fp_p),
        gravity=jnp.asarray(np.asarray([0.0, 0.0, -9.81], dtype)),
        q_lb=jnp.asarray(arr("q_lb")),
        q_ub=jnp.asarray(arr("q_ub")),
        v_limit=jnp.asarray(arr("v_limit")),
        effort_limit=jnp.asarray(arr("effort_limit")),
    )


def load_urdf(path: str, floating_base: bool = True, dtype=np.float64):
    """Load a .urdf file into a RobotModel."""
    with open(path) as f:
        return load_urdf_string(f.read(), floating_base, dtype)
