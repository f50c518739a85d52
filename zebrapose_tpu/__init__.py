"""zebrapose_tpu — a TPU-native 6DoF object-pose framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
lyltc1/ZebraPose (CVPR'22 "ZebraPose: Coarse to Fine Surface Encoding for
6DoF Object Pose Estimation" plus the lyltc1 fork extensions: entire-mask
second head, DDP-style data-parallel training, symmetry-aware GT labels,
contour-based pose refinement, detector-input test paths).

Design principles (TPU-first, not a port):
  * Everything on the hot path (crop/resize preprocessing, the
    encoder-decoder CNN, surface-code decoding, correspondence building,
    EPnP+RANSAC pose solving, ADD/ADD-S metrics) is expressed as jittable
    fixed-shape JAX programs so a whole detection->crop->code->pose
    pipeline compiles to a single XLA executable per batch shape.
  * Scaling is via `jax.sharding.Mesh` + NamedSharding data parallelism
    over ICI; gradients and metrics are averaged with mesh collectives
    (replacing the reference's torch DDP/NCCL, train_v5.py).
  * Variable-size quantities (foreground pixel sets, RANSAC inlier sets,
    per-image instance counts) become fixed-capacity masked tensors.
  * Host code does byte I/O only; no per-pixel Python loops anywhere.
"""

__version__ = "0.1.0"
