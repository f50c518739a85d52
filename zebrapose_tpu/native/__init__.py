"""ctypes bindings for the zebra_native C++ library.

Builds `native/libzebra_native.so` on first use if absent (g++ only, no
external deps). See native/zebra_native.cpp for what each entry point
replaces in the reference.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libzebra_native.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO_PATH)
    c_int = ctypes.c_int
    c_u32 = ctypes.c_uint32
    c_dbl = ctypes.c_double
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.zn_render_label.argtypes = [f32p, c_int, i32p, c_int, i32p, f64p,
                                    f64p, f64p, c_int, c_int, i32p,
                                    ctypes.c_void_p]
    lib.zn_render_label.restype = c_int
    lib.zn_partition_mesh.argtypes = [f32p, c_int, c_int, c_int, c_u32,
                                      u32p]
    lib.zn_partition_mesh.restype = c_int
    lib.zn_face_classes.argtypes = [u32p, i32p, c_int, u32p]
    lib.zn_face_classes.restype = c_int
    lib.zn_class_centroids.argtypes = [f32p, c_int, u32p, c_int, f32p]
    lib.zn_class_centroids.restype = c_int
    lib.zn_edge_refine.argtypes = [f32p, c_int, i32p, c_int, f64p, c_int,
                                   c_int, i32p, c_int, c_int, c_dbl,
                                   c_dbl, f64p, f64p]
    lib.zn_edge_refine.restype = c_int
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.zn_edge_refine_debug.argtypes = [f32p, c_int, i32p, c_int, f64p,
                                         c_int, c_int, i32p, c_int,
                                         c_int, c_dbl, c_dbl, f64p,
                                         f64p, u8p]
    lib.zn_edge_refine_debug.restype = c_int
    _lib = lib
    return lib


def render_label(vertices: np.ndarray, faces: np.ndarray,
                 face_class: np.ndarray, K: np.ndarray, R: np.ndarray,
                 t: np.ndarray, width: int, height: int,
                 with_depth: bool = False
                 ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Render per-pixel face class ids (0 = background) and optional
    depth under x_c = R X + t."""
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32).reshape(-1, 3)
    fc = np.ascontiguousarray(face_class, np.int32)
    out = np.zeros((height, width), np.int32)
    depth = np.zeros((height, width), np.float32) if with_depth else None
    rc = lib.zn_render_label(
        v, len(v), f, len(f), fc,
        np.ascontiguousarray(K, np.float64).reshape(-1),
        np.ascontiguousarray(R, np.float64).reshape(-1),
        np.ascontiguousarray(t, np.float64).reshape(-1),
        width, height, out,
        depth.ctypes.data_as(ctypes.c_void_p) if with_depth else None)
    if rc != 0:
        raise RuntimeError(f"zn_render_label failed: {rc}")
    return out, depth


def partition_mesh(vertices: np.ndarray, divide_number: int,
                   n_levels: int, seed: int = 0) -> np.ndarray:
    """Hierarchical balanced surface encoding: per-vertex class id in
    [0, divide_number**n_levels)."""
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    out = np.zeros((len(v),), np.uint32)
    rc = lib.zn_partition_mesh(v, len(v), divide_number, n_levels, seed,
                               out)
    if rc != 0:
        raise RuntimeError(f"zn_partition_mesh failed: {rc}")
    return out


def face_classes(vertex_class: np.ndarray, faces: np.ndarray) -> np.ndarray:
    lib = _load()
    f = np.ascontiguousarray(faces, np.int32).reshape(-1, 3)
    vc = np.ascontiguousarray(vertex_class, np.uint32)
    out = np.zeros((len(f),), np.uint32)
    lib.zn_face_classes(vc, f, len(f), out)
    return out


def class_centroids(vertices: np.ndarray, vertex_class: np.ndarray,
                    n_classes: int) -> np.ndarray:
    """[n_classes, 3] centroids; NaN rows for empty classes."""
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    vc = np.ascontiguousarray(vertex_class, np.uint32)
    out = np.zeros((n_classes, 3), np.float32)
    lib.zn_class_centroids(v, len(v), vc, n_classes, out)
    return out


def edge_refine(vertices: np.ndarray, faces: np.ndarray, K: np.ndarray,
                width: int, height: int, contour_xy: np.ndarray,
                R: np.ndarray, t: np.ndarray, iterations: int = 10,
                damp_rot: float = 5e3, damp_trans: float = 5e5,
                debug_dir: str = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Contour-based Gauss-Newton pose refinement (py_edge_refine
    equivalent). contour_xy: [N,2] int pixel coords of the visible part
    of the predicted entire-mask contour. Returns refined (R, t).

    debug_dir: when given, writes one `iter_XX.png` per iteration
    visualizing the rendered silhouette (gray), its contour (green) and
    the target visible contour (red) — the reference's
    edge_refine_debug.cpp save-images introspection for diagnosing
    refiner divergence."""
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32).reshape(-1, 3)
    c = np.ascontiguousarray(contour_xy, np.int32).reshape(-1, 2)
    R_io = np.ascontiguousarray(R, np.float64).reshape(-1).copy()
    t_io = np.ascontiguousarray(t, np.float64).reshape(-1).copy()
    Kc = np.ascontiguousarray(K, np.float64).reshape(-1)
    if debug_dir is None:
        rc = lib.zn_edge_refine(v, len(v), f, len(f), Kc,
                                width, height, c, len(c), iterations,
                                damp_rot, damp_trans, R_io, t_io)
        frames = None
    else:
        frames = np.zeros((iterations, height, width), np.uint8)
        rc = lib.zn_edge_refine_debug(v, len(v), f, len(f), Kc,
                                      width, height, c, len(c),
                                      iterations, damp_rot, damp_trans,
                                      R_io, t_io, frames)
    if frames is not None:
        import os as _os

        import cv2 as _cv2
        _os.makedirs(debug_dir, exist_ok=True)
        palette = np.array([[0, 0, 0], [96, 96, 96], [0, 255, 0],
                            [0, 0, 255]], np.uint8)  # BGR
        for i, fr in enumerate(frames):
            if rc != 0 and not fr.any():
                break  # iteration never ran
            _cv2.imwrite(_os.path.join(debug_dir, f"iter_{i:02d}.png"),
                         palette[fr])
    if rc != 0:
        raise RuntimeError(f"zn_edge_refine failed: {rc}")
    return R_io.reshape(3, 3), t_io
