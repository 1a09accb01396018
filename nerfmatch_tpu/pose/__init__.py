"""Host-side PnP + RANSAC pose solving.

API surface mirrors the reference's ``estimate_pose`` (cv2 AP3P + RefineLM,
``utils/geometry.py:189-219``) and ``estimate_pose_pycolmap``
(``:222-265``): both return ``(R, t, inliers)`` in world->camera convention
or ``None`` on failure.

Backends:
  * ``native`` (default): the in-tree C++ P3P + LO-RANSAC + LM module
    (``csrc/pnp.cpp``), compiled lazily with g++ and loaded via ctypes —
    the pycolmap replacement.
  * ``cv``: OpenCV ``solvePnPRansac`` (AP3P) + ``solvePnPRefineLM`` when cv2
    is importable — bit-matching the reference's "cv" solver path.

The solver runs on the host CPU; device code never blocks on it (evaluators
batch matches to numpy first).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "csrc" / "pnp.cpp"
_LIB_PATH = Path(__file__).parent / "csrc" / "_libpnp.so"
_lib = None


def _host_sig() -> str:
    """CPU identity for the -march=native artifact: a worktree copied to a
    different machine (mtimes intact) must rebuild, not SIGILL on foreign
    ISA extensions — same per-host keying as the XLA compile cache."""
    import hashlib
    import platform

    flags = ""
    try:
        for line in Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith(("flags", "Features")):
                flags = line
                break
    except OSError:
        pass
    return hashlib.sha1(
        (platform.machine() + flags).encode()).hexdigest()[:16]


def _build_library() -> Path:
    """Compile the native module if missing/stale/built on another host."""
    sig_path = _LIB_PATH.with_suffix(".so.host")
    sig = _host_sig()
    if (_LIB_PATH.exists()
            and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime
            and sig_path.exists() and sig_path.read_text() == sig):
        return _LIB_PATH
    # Compile to a per-pid temp file and atomically replace: concurrent
    # processes (pytest-xdist, multi-process eval) must never CDLL a
    # half-written .so.
    tmp = _LIB_PATH.with_suffix(f".tmp{os.getpid()}.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(tmp)]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _LIB_PATH)
    sig_path.write_text(sig)
    return _LIB_PATH


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build_library()))
        lib.pnp_ransac.restype = ctypes.c_int
        lib.pnp_ransac.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # pts2d
            ctypes.POINTER(ctypes.c_double),  # pts3d
            ctypes.c_int,                     # n
            ctypes.POINTER(ctypes.c_double),  # K
            ctypes.c_double,                  # thres
            ctypes.c_int,                     # max_iters
            ctypes.c_double,                  # confidence
            ctypes.c_uint64,                  # seed
            ctypes.c_int,                     # refine_iters
            ctypes.POINTER(ctypes.c_double),  # R_out
            ctypes.POINTER(ctypes.c_double),  # t_out
            ctypes.POINTER(ctypes.c_uint8),   # inlier_mask
            ctypes.POINTER(ctypes.c_int),     # num_inliers
        ]
        lib.pnp_refine.restype = None
        lib.pnp_refine.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
        ]
        _lib = lib
    return _lib


def _as_c(arr, dtype=np.float64):
    arr = np.ascontiguousarray(arr, dtype=dtype)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def estimate_pose_native(pts2d, pts3d, K, ransac_thres: float = 1.0,
                         max_iters: int = 2000, confidence: float = 0.9999,
                         seed: int = 0, refine_iters: int = 30):
    """Native C++ P3P + LO-RANSAC + LM.  Returns (R, t, inlier_idx) or None."""
    pts2d = np.asarray(pts2d, np.float64).reshape(-1, 2)
    pts3d = np.asarray(pts3d, np.float64).reshape(-1, 3)
    n = len(pts2d)  # AFTER reshape: a flat (2N,) input must count N rows
    if n < 4:
        return None
    lib = _get_lib()
    p2d, p2d_c = _as_c(pts2d)
    p3d, p3d_c = _as_c(pts3d)
    Km, K_c = _as_c(np.asarray(K, np.float64).reshape(3, 3))
    R = np.zeros((3, 3), np.float64)
    t = np.zeros(3, np.float64)
    mask = np.zeros(n, np.uint8)
    n_inl = ctypes.c_int(0)
    ok = lib.pnp_ransac(
        p2d_c, p3d_c, n, K_c, float(ransac_thres), int(max_iters),
        float(confidence), int(seed) or 0x12345678, int(refine_iters),
        R.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(n_inl),
    )
    if not ok or np.any(np.isnan(t)):
        return None
    inliers = np.where(mask > 0)[0]
    return R, t, inliers


def refine_pose_native(pts2d, pts3d, K, R, t, iters: int = 30):
    """LM-refine an initial pose on all given correspondences."""
    lib = _get_lib()
    p2d, p2d_c = _as_c(np.asarray(pts2d, np.float64).reshape(-1, 2))
    p3d, p3d_c = _as_c(np.asarray(pts3d, np.float64).reshape(-1, 3))
    Km, K_c = _as_c(np.asarray(K, np.float64).reshape(3, 3))
    R_io = np.ascontiguousarray(R, np.float64).copy()
    t_io = np.ascontiguousarray(t, np.float64).reshape(3).copy()
    lib.pnp_refine(p2d_c, p3d_c, len(p2d), K_c,
                   R_io.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                   t_io.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                   int(iters))
    return R_io, t_io


def estimate_pose_cv(pts2d, pts3d, K, ransac_thres: float = 1.0):
    """OpenCV AP3P RANSAC + LM refine (reference 'cv' solver)."""
    import cv2

    pts2d = np.ascontiguousarray(pts2d, np.float32)
    pts3d = np.ascontiguousarray(pts3d, np.float32)
    K = np.ascontiguousarray(K, np.float32)
    if len(pts2d) < 4:
        return None
    success, rvec, tvec, inliers = cv2.solvePnPRansac(
        pts3d, pts2d, cameraMatrix=K, distCoeffs=None,
        reprojectionError=ransac_thres, flags=cv2.SOLVEPNP_AP3P)
    if not success or inliers is None or np.any(np.isnan(tvec)):
        return None
    inliers = inliers.ravel()
    rvec, tvec = cv2.solvePnPRefineLM(
        pts3d[inliers], pts2d[inliers], cameraMatrix=K, distCoeffs=None,
        rvec=rvec, tvec=tvec)
    R = cv2.Rodrigues(rvec)[0]
    return R, tvec.ravel(), inliers


def estimate_pose(pts2d, pts3d, K, ransac_thres: float = 1.0,
                  solver: str = "native", **kw):
    """Unified entry.  solver: 'native' (C++; also serves the reference's
    'colmap' role) | 'cv' (OpenCV).  Returns (R, t, inliers) w2c or None."""
    if solver in ("native", "colmap"):
        return estimate_pose_native(pts2d, pts3d, K, ransac_thres, **kw)
    if solver == "cv":
        if kw:
            raise ValueError(f"cv solver does not support {sorted(kw)}; "
                             f"pass them to the native solver instead")
        return estimate_pose_cv(pts2d, pts3d, K, ransac_thres)
    raise ValueError(f"Unknown solver: {solver}")


# pycolmap-compatible alias (reference estimate_pose_pycolmap :222-265).
def estimate_pose_pycolmap(pts2d, pts3d, K, img_wh=None, ransac_thres: float = 1.0,
                           center_subpixel: bool = False, **kw):
    # The reference's center_subpixel +0.5 cancels PYCOLMAP's half-integer
    # pixel-center convention.  Both in-tree backends (native C++, cv2)
    # already use the continuous convention the 2D points are produced in
    # (pixel_grid_np emits pixel-center coordinates), so shifting here
    # would BIAS every correspondence by half a pixel — the flag is
    # accepted for CLI parity and is deliberately an identity.
    del center_subpixel
    return estimate_pose_native(pts2d, pts3d, K, ransac_thres, **kw)
