"""Torch-semantics primitive layers in Flax linen (NHWC).

The reference model is plain torchvision-style PyTorch; to make its
checkpoints convertible and activations bit-comparable, these wrappers pin
the exact padding / BN / transposed-conv semantics PyTorch uses (XLA's
SAME padding differs for even inputs, and flax's ConvTranspose padding
convention differs from torch's (padding, output_padding) pair).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class _Int8Conv(nn.Module):
    """Drop-in nn.Conv replacement executing on the TPU int8 MXU path.

    Declares the SAME parameter tree as the nn.Conv it replaces
    (kernel [kh,kw,in,out] f32, bias [out] f32), so trained or
    torch-converted checkpoints load unchanged. Quantization happens at
    apply time, in-graph:
      * weights: per-output-channel symmetric int8 (amax/127) — the
        per-channel rescale rides the dequant multiply;
      * activations: per-tensor dynamic symmetric int8 (one amax
        reduce per call — an elementwise-pass cost, repaid by the
        ~1.4x int8 conv throughput on the hot 128^2/dilated shapes and
        halved HBM traffic, measured on v5e — PERF.md);
      * accumulation int32, dequantized output cast to `dtype`.
    Inference-only: gradients through round() are not defined here.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32)
        w = kernel.astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)),
                         1e-8) / 127.0                       # [out]
        wq = jnp.round(w / sw).astype(jnp.int8)
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, window_strides=self.strides, padding=self.padding,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * sw)    # sw broadcasts over C
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b
        return y.astype(self.dtype)


def _ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """round() whose gradient is the identity (straight-through
    estimator): forward = round(x), backward = 1. The standard QAT
    trick — round() itself has zero gradient almost everywhere, which
    would stop all learning through a quantizer."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


class _FakeQuantConv(nn.Module):
    """Differentiable twin of _Int8Conv for quantization-aware training.

    Forward simulates the serving-mode int8 path — the SAME per-channel
    symmetric weight scales, per-tensor dynamic activation scale, and
    round/clip order — but keeps everything in float so gradients flow:
    rounding uses the straight-through estimator, the scales are
    stop_gradient'ed (amax is not a useful gradient path), and the clip
    saturates (zero gradient outside [-127, 127], so activations learn
    to stay in range). The conv runs on INTEGER-VALUED float arrays and
    rescales once afterwards, exactly like _Int8Conv's int32-accumulate
    -then-dequantize — integers <= 127 are exact even in a bf16 MXU
    pass, so the QAT forward tracks the deployed int8 forward to f32
    accumulation error (~1e-7 relative), not to bf16 error.

    Parameter tree identical to nn.Conv/_Int8Conv: a checkpoint
    fine-tuned with this module loads unchanged into the int8 serving
    model (ZebraPoseNet(quant=True)).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32)
        w = kernel.astype(jnp.float32)
        sw = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)),
                        1e-8) / 127.0)                        # [out]
        wq = _ste_round(w / sw)            # integer-valued, grads pass
        xf = x.astype(jnp.float32)
        sx = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0)
        # round-then-clip mirrors _Int8Conv; clip STE saturates.
        xq = jnp.clip(_ste_round(xf / sx), -127, 127)
        y = jax.lax.conv_general_dilated(
            xq, wq, window_strides=self.strides, padding=self.padding,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y * (sx * sw)                  # sw broadcasts over C
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b
        return y.astype(self.dtype)


class TorchConv(nn.Module):
    """nn.Conv2d equivalent: explicit symmetric padding, HWIO kernel.

    quant selects the conv implementation, all with identical parameter
    trees so the same checkpoint loads into any of them:
      False  — plain nn.Conv (training / full-precision serving);
      True   — _Int8Conv, the int8 MXU serving path;
      "qat"  — _FakeQuantConv, the differentiable int8 simulation for
               quantization-aware (fine-)tuning (train --qat).
    Toggled per-model via ZebraPoseNet(quant=...)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    quant: Any = False          # False | True (int8 serve) | "qat"
    # int8 only pays off on MXU-bound convs; small convs (stem 3->64,
    # layer1 64x64, 1-channel heads) measured no speedup on v5e AND are
    # the accuracy-sensitive ones (first-layer input range, tiny-channel
    # quantization noise). Quantize only when Cin*Cout clears this bar.
    # The same gate applies to "qat" so training simulates exactly the
    # convs that will be quantized at serving time.
    quant_min_cinxcout: int = 16384

    @nn.compact
    def __call__(self, x):
        if self.quant and x.shape[-1] * self.features >= \
                self.quant_min_cinxcout:
            impl = _FakeQuantConv if self.quant == "qat" else _Int8Conv
            return impl(
                features=self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((self.padding, self.padding),
                         (self.padding, self.padding)),
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class TorchConvTranspose(nn.Module):
    """nn.ConvTranspose2d(k, s, padding=p, output_padding=op) equivalent.

    Kernel stored [kh, kw, out, in]; applied with
    lax.conv_transpose(transpose_kernel=True,
    padding=(k-1-p, k-1-p+op)) — verified numerically against torch.
    """

    features: int
    in_features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=(0, 1, 3)),
            (k, k, self.features, self.in_features), jnp.float32)
        lo = k - 1 - self.padding
        hi = k - 1 - self.padding + self.output_padding
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), kernel.astype(self.dtype),
            strides=(self.stride, self.stride),
            padding=((lo, hi), (lo, hi)),
            transpose_kernel=True,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class TorchBatchNorm(nn.Module):
    """nn.BatchNorm2d equivalent (momentum 0.1 torch == 0.9 flax, eps 1e-5)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


def max_pool_3x3_s2_p1(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.MaxPool2d(3, stride=2, padding=1) on NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))


def interpolate_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]
                         ) -> jnp.ndarray:
    """F.interpolate(mode='bilinear', align_corners=False) on NHWC.

    Half-pixel source mapping, edge clamp, no antialiasing (torch default;
    jax.image.resize antialiases on downscale so it can't be used here).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x

    def coords(out_size, in_size):
        s = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (
            in_size / out_size) - 0.5
        s = jnp.clip(s, 0.0, in_size - 1.0)
        i0 = jnp.floor(s).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, in_size - 1)
        f = s - i0
        return i0, i1, f

    y0, y1, fy = coords(oh, h)
    x0, x1, fx = coords(ow, w)
    top = x[:, y0][:, :, x0] * (1 - fx)[None, None, :, None] + \
        x[:, y0][:, :, x1] * fx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - fx)[None, None, :, None] + \
        x[:, y1][:, :, x1] * fx[None, None, :, None]
    return top * (1 - fy)[None, :, None, None] + \
        bot * fy[None, :, None, None]
