"""DeepLabV3-style ASPP decoder family in Flax linen (NHWC).

Mirrors the reference decoders (`zebrapose/model/aspp.py`, `aspp_v3.py`):
  * ASPP:   5 branches (1x1, 3x3 d6/d12/d18, global) -> 1x1 fuse -> two
            deconv upsample stages with skip concats (x_64, x_128) ->
            final conv to num_classes at h/2 resolution.
  * ASPPv3: the mask-conditioned second decoder of the v3 model — 4
            branches + the predicted mask concatenated at 32/64/128
            resolutions (`aspp_v3.py:75-102`).
  * Non-binary ablation: same trunk, split mask/code output convs for
            base-d CE ablations (`aspp.py:228-340`).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from zebrapose_tpu.models.layers import (
    TorchBatchNorm,
    TorchConv,
    TorchConvTranspose,
    interpolate_bilinear,
)


class _ConvBnRelu(nn.Module):
    features: int
    kernel_size: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        y = TorchConv(self.features, self.kernel_size, 1, self.padding,
                      self.dilation, use_bias=self.use_bias,
                      dtype=self.dtype, quant=self.quant, name="conv")(x)
        y = TorchBatchNorm(dtype=self.dtype, name="bn")(y, train)
        return nn.relu(y)


class UpsampleBlock(nn.Module):
    """ConvT(s2) + BN + ReLU + 2x(Conv3x3 + BN + ReLU). Ref: ASPP.upsample."""

    features: int
    in_features: int
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        y = TorchConvTranspose(self.features, self.in_features, 3, 2, 1, 1,
                               use_bias=False, dtype=self.dtype,
                               name="deconv")(x)
        y = TorchBatchNorm(dtype=self.dtype, name="bn0")(y, train)
        y = nn.relu(y)
        for i in (1, 2):
            y = TorchConv(self.features, 3, 1, 1, use_bias=False,
                          dtype=self.dtype, quant=self.quant,
                          name=f"conv{i}")(y)
            y = TorchBatchNorm(dtype=self.dtype, name=f"bn{i}")(y, train)
            y = nn.relu(y)
        return y


def _final_conv_padding(output_kernel_size: int) -> int:
    return 1 if output_kernel_size == 3 else 0


class ASPP(nn.Module):
    """The main decoder. Returns [N, h/2, w/2, num_classes] logits."""

    num_classes: int
    concat: bool = True
    output_kernel_size: int = 1
    skip_lo_ch: int = 64   # x_64 channels
    skip_hi_ch: int = 64   # x_128 channels
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x_high, x_128, x_64, train: bool = False):
        h, w = x_high.shape[1], x_high.shape[2]
        b1 = _ConvBnRelu(256, 1, dtype=self.dtype, quant=self.quant,
                         name="conv_1x1_1")(
            x_high, train)
        b2 = _ConvBnRelu(256, 3, 6, 6, dtype=self.dtype, quant=self.quant,
                         name="conv_3x3_1")(
            x_high, train)
        b3 = _ConvBnRelu(256, 3, 12, 12, dtype=self.dtype, quant=self.quant,
                         name="conv_3x3_2")(x_high, train)
        b4 = _ConvBnRelu(256, 3, 18, 18, dtype=self.dtype, quant=self.quant,
                         name="conv_3x3_3")(x_high, train)
        gp = jnp.mean(x_high, axis=(1, 2), keepdims=True)
        gp = _ConvBnRelu(256, 1, dtype=self.dtype, quant=self.quant,
                         name="conv_1x1_2")(
            gp, train)
        gp = jnp.broadcast_to(gp, (gp.shape[0], h, w, gp.shape[3]))

        out = jnp.concatenate([b1, b2, b3, b4, gp], axis=-1)
        out = _ConvBnRelu(256, 1, dtype=self.dtype, quant=self.quant,
                          name="conv_1x1_3")(
            out, train)

        up1 = UpsampleBlock(256, 256, dtype=self.dtype, quant=self.quant,
                            name="upsample_1")(
            out, train)
        if self.concat:
            up1 = jnp.concatenate([up1, x_64], axis=-1)
            up2_in = 256 + self.skip_lo_ch
        else:
            up2_in = 256
        up2 = UpsampleBlock(256, up2_in, dtype=self.dtype, quant=self.quant,
                            name="upsample_2")(up1, train)

        up2 = jnp.concatenate([up2, x_128], axis=-1)
        k = self.output_kernel_size
        return TorchConv(self.num_classes, k, 1, _final_conv_padding(k),
                         dtype=self.dtype, name="conv_1x1_4")(up2)


class ASPPNonBinary(nn.Module):
    """Ablation decoder: split mask/code heads (base-d CE codes)."""

    code_length: int
    base: int
    concat: bool = True
    output_kernel_size: int = 1
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x_high, x_128, x_64, train: bool = False):
        h, w = x_high.shape[1], x_high.shape[2]
        b1 = _ConvBnRelu(256, 1, dtype=self.dtype, quant=self.quant,
                         name="conv_1x1_1")(
            x_high, train)
        b2 = _ConvBnRelu(256, 3, 6, 6, dtype=self.dtype, quant=self.quant,
                         name="conv_3x3_1")(
            x_high, train)
        b3 = _ConvBnRelu(256, 3, 12, 12, dtype=self.dtype, quant=self.quant,
                         name="conv_3x3_2")(x_high, train)
        b4 = _ConvBnRelu(256, 3, 18, 18, dtype=self.dtype, quant=self.quant,
                         name="conv_3x3_3")(x_high, train)
        gp = jnp.mean(x_high, axis=(1, 2), keepdims=True)
        gp = _ConvBnRelu(256, 1, dtype=self.dtype, quant=self.quant,
                         name="conv_1x1_2")(
            gp, train)
        gp = jnp.broadcast_to(gp, (gp.shape[0], h, w, gp.shape[3]))
        out = jnp.concatenate([b1, b2, b3, b4, gp], axis=-1)
        out = _ConvBnRelu(256, 1, dtype=self.dtype, quant=self.quant,
                          name="conv_1x1_3")(
            out, train)
        up1 = UpsampleBlock(256, 256, dtype=self.dtype, quant=self.quant,
                            name="upsample_1")(
            out, train)
        if self.concat:
            up1 = jnp.concatenate([up1, x_64], axis=-1)
            up2_in = 256 + 64
        else:
            up2_in = 256
        up2 = UpsampleBlock(256, up2_in, dtype=self.dtype, quant=self.quant,
                            name="upsample_2")(up1, train)
        up2 = jnp.concatenate([up2, x_128], axis=-1)
        k = self.output_kernel_size
        pad = _final_conv_padding(k)
        mask = TorchConv(1, k, 1, pad, dtype=self.dtype,
                         name="conv_1x1_4_mask")(up2)
        code = TorchConv(self.code_length * self.base, k, 1, pad,
                         dtype=self.dtype, name="conv_1x1_4_code")(up2)
        return mask, code


class ASPPv3(nn.Module):
    """Mask-conditioned entire-mask decoder of the v3 model.

    Takes the first decoder's predicted mask logits (at h/2) and
    concatenates bilinear resizes of it at the 32/64/128 stages.
    """

    num_classes: int = 1
    output_kernel_size: int = 1
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, mask, x_high, x_128, x_64, train: bool = False):
        h, w = x_high.shape[1], x_high.shape[2]
        b1 = _ConvBnRelu(256, 1, dtype=self.dtype, quant=self.quant,
                         name="conv_1x1_1")(
            x_high, train)
        b2 = _ConvBnRelu(256, 3, 6, 6, dtype=self.dtype, quant=self.quant,
                         name="conv_3x3_1")(
            x_high, train)
        b3 = _ConvBnRelu(256, 3, 12, 12, dtype=self.dtype, quant=self.quant,
                         name="conv_3x3_2")(x_high, train)
        gp = jnp.mean(x_high, axis=(1, 2), keepdims=True)
        gp = _ConvBnRelu(256, 1, dtype=self.dtype, quant=self.quant,
                         name="conv_1x1_2")(
            gp, train)
        gp = jnp.broadcast_to(gp, (gp.shape[0], h, w, gp.shape[3]))
        mask_32 = interpolate_bilinear(mask, (h, w))
        out = jnp.concatenate([b1, b2, b3, gp, mask_32], axis=-1)  # 1025ch
        out = _ConvBnRelu(256, 1, dtype=self.dtype, quant=self.quant,
                          name="conv_1x1_3")(
            out, train)

        up1 = UpsampleBlock(256, 256, dtype=self.dtype, quant=self.quant,
                            name="upsample_1")(
            out, train)
        mask_64 = interpolate_bilinear(mask, (2 * h, 2 * w))
        up1 = jnp.concatenate([up1, x_64, mask_64], axis=-1)
        up2 = UpsampleBlock(256, 256 + 64 + 1, dtype=self.dtype,
                            quant=self.quant,
                            name="upsample_2")(up1, train)
        up2 = jnp.concatenate([up2, x_128, mask], axis=-1)
        k = self.output_kernel_size
        return TorchConv(self.num_classes, k, 1, _final_conv_padding(k),
                         dtype=self.dtype, name="conv_1x1_4")(up2)
