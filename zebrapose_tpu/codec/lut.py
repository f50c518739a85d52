"""Class-id -> 3D-point correspondence lookup table.

The reference keeps this as a Python dict `{class_id: np.array([x,y,z])}`
loaded from `Class_CorresPoint<obj>.txt` and does a per-pixel dict lookup
inside the pose decode loop (CNN_output_to_pose.py:10-64). Here the table
is a dense `float32[num_classes, 3]` array so the whole masked-pixels ->
3D-points step is one `jnp.take` gather on device.

Invalid classes (NaN rows in the file: surface regions that received no
vertex) map to (0,0,0) with valid=False — the same observable behavior as
the reference, which skips NaN entries and leaves a zero row in the
correspondence list (CNN_output_to_pose.py:58-62).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class CorrespondenceLUT:
    """Dense class-id -> region-centroid table.

    points: float32[num_classes, 3], zeros where invalid.
    valid:  bool[num_classes].
    base:   digits-per-level d (divide_number_each_itration).
    n_digits: number of levels n (number_of_itration).
    """

    points: np.ndarray
    valid: np.ndarray
    base: int
    n_digits: int

    @property
    def num_classes(self) -> int:
        return self.points.shape[0]


def load_correspondence_lut(path: str) -> CorrespondenceLUT:
    """Parse a reference-format `Class_CorresPoint*.txt` file.

    Format (Generate_Mesh_with_GT_Color.cpp:396-455): first line
    `total_classes divide_number n_iterations`, then one
    `class_id x y z` line per class (values may be `nan`).
    """
    with open(path, "r") as f:
        header = f.readline().split()
        total = int(float(header[0]))
        base = int(float(header[1]))
        n_digits = int(float(header[2]))
        data = np.loadtxt(f, dtype=np.float64)
    if data.ndim == 1:
        data = data[None, :]
    points = np.zeros((total, 3), dtype=np.float32)
    valid = np.zeros((total,), dtype=bool)
    ids = data[:, 0].astype(np.int64)
    xyz = data[:, 1:4]
    ok = ~np.isnan(xyz).any(axis=1)
    points[ids[ok]] = xyz[ok].astype(np.float32)
    valid[ids[ok]] = True
    return CorrespondenceLUT(points=points, valid=valid, base=base,
                             n_digits=n_digits)


def save_correspondence_lut(path: str, lut: CorrespondenceLUT) -> None:
    """Write a LUT back out in the reference text format."""
    with open(path, "w") as f:
        f.write(f"{lut.num_classes} {lut.base} {lut.n_digits}\n")
        for i in range(lut.num_classes):
            if lut.valid[i]:
                x, y, z = (float(v) for v in lut.points[i])
                f.write(f"{i} {x} {y} {z}\n")
            else:
                f.write(f"{i} nan nan nan\n")


def reduce_lut_ignore_bits(lut: CorrespondenceLUT,
                           ignore_bits: int) -> CorrespondenceLUT:
    """Drop the last `ignore_bits` levels: new point = mean over the group.

    Replaces generate_new_corres_dict (generate_new_dict.py:4-33), which
    enumerates all 2^16 string codes in Python; here it is one reshape +
    mean over the trailing group axis. A group containing any invalid
    member becomes invalid (NaN-propagation semantics of the reference's
    sum over dict entries).
    """
    if ignore_bits == 0:
        return lut
    group = lut.base ** ignore_bits
    n_new = lut.num_classes // group
    pts = lut.points.reshape(n_new, group, 3)
    val = lut.valid.reshape(n_new, group)
    all_valid = val.all(axis=1)
    mean_pts = pts.mean(axis=1)
    mean_pts = np.where(all_valid[:, None], mean_pts, 0.0).astype(np.float32)
    return CorrespondenceLUT(points=mean_pts, valid=all_valid,
                             base=lut.base,
                             n_digits=lut.n_digits - ignore_bits)
