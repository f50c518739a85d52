"""ResNet-OS8 backbone with decoder skip taps, in Flax linen (NHWC).

Same topology as the reference backbone (`zebrapose/model/resnet.py:
170-254`): torchvision resnet34 stem + layer1 + layer2 (pretrained-
convertible), then two freshly-initialized dilated BasicBlock stages
(layer4: 6 blocks, 256ch, dilation 2; layer5: 3 blocks, 512ch, dilation 4)
keeping output stride 8. In concat mode exposes the skip taps
x_128 (64ch, h/2), x_64 (64ch, h/4), x_32 (128ch, h/8), x_16 (256, h/8),
x_high (512, h/8).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from zebrapose_tpu.models.layers import (
    TorchBatchNorm,
    TorchConv,
    max_pool_3x3_s2_p1,
)


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        y = TorchConv(self.channels, 3, self.stride, self.dilation,
                      self.dilation, use_bias=False, dtype=self.dtype,
                      quant=self.quant, name="conv1")(x)
        y = TorchBatchNorm(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = TorchConv(self.channels, 3, 1, self.dilation, self.dilation,
                      use_bias=False, dtype=self.dtype, quant=self.quant,
                      name="conv2")(y)
        y = TorchBatchNorm(dtype=self.dtype, name="bn2")(y, train)
        if self.downsample:
            sc = TorchConv(self.channels, 1, self.stride, 0, 1,
                           use_bias=False, dtype=self.dtype,
                           quant=self.quant, name="downsample_conv")(x)
            sc = TorchBatchNorm(dtype=self.dtype, name="downsample_bn")(
                sc, train)
        else:
            sc = x
        return nn.relu(y + sc)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (1x1 -> 3x3 -> 1x1 x4) with dilation."""

    channels: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = 4 * self.channels
        y = TorchConv(self.channels, 1, 1, 0, use_bias=False,
                      dtype=self.dtype, quant=self.quant, name="conv1")(x)
        y = TorchBatchNorm(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = TorchConv(self.channels, 3, self.stride, self.dilation,
                      self.dilation, use_bias=False, dtype=self.dtype,
                      quant=self.quant, name="conv2")(y)
        y = TorchBatchNorm(dtype=self.dtype, name="bn2")(y, train)
        y = nn.relu(y)
        y = TorchConv(out_ch, 1, 1, 0, use_bias=False, dtype=self.dtype,
                      quant=self.quant, name="conv3")(y)
        y = TorchBatchNorm(dtype=self.dtype, name="bn3")(y, train)
        if self.downsample:
            sc = TorchConv(out_ch, 1, self.stride, 0, 1, use_bias=False,
                           dtype=self.dtype, quant=self.quant,
                           name="downsample_conv")(x)
            sc = TorchBatchNorm(dtype=self.dtype, name="downsample_bn")(
                sc, train)
        else:
            sc = x
        return nn.relu(y + sc)


def _stage(name: str, channels: int, num_blocks: int, stride: int,
           dilation: int, in_channels: int, dtype, block=BasicBlock,
           quant: bool = False):
    """A make_layer-equivalent list of blocks."""
    out_ch = channels * (4 if block is Bottleneck else 1)
    blocks = []
    for i in range(num_blocks):
        s = stride if i == 0 else 1
        ds = (s != 1) or (in_channels != out_ch) if i == 0 else False
        blocks.append(block(channels, s, dilation, downsample=ds,
                            dtype=dtype, quant=quant, name=f"{name}_{i}"))
        in_channels = out_ch
    return blocks


class ResNet34OS8(nn.Module):
    """ResNet34 output-stride-8 with skip taps (concat mode always on;
    non-concat callers just ignore the extra taps)."""

    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        # stem: conv7x7 s2 + BN + ReLU  -> x_128 (h/2, 64)
        y = TorchConv(64, 7, 2, 3, use_bias=False, dtype=self.dtype,
                      quant=self.quant, name="conv1")(x)
        y = TorchBatchNorm(dtype=self.dtype, name="bn1")(y, train)
        x_128 = nn.relu(y)

        # maxpool + layer1 (3 blocks, 64) -> x_64 (h/4, 64)
        y = max_pool_3x3_s2_p1(x_128)
        for blk in _stage("layer1", 64, 3, 1, 1, 64, self.dtype,
                          quant=self.quant):
            y = blk(y, train)
        x_64 = y

        # layer2 (4 blocks, 128, s2) -> x_32 (h/8, 128)
        for blk in _stage("layer2", 128, 4, 2, 1, 64, self.dtype,
                          quant=self.quant):
            y = blk(y, train)
        x_32 = y

        # dilated layer4 (6 blocks, 256, d2) -> x_16 (h/8, 256)
        for blk in _stage("layer4", 256, 6, 1, 2, 128, self.dtype,
                          quant=self.quant):
            y = blk(y, train)
        x_16 = y

        # dilated layer5 (3 blocks, 512, d4) -> x_high (h/8, 512)
        for blk in _stage("layer5", 512, 3, 1, 4, 256, self.dtype,
                          quant=self.quant):
            y = blk(y, train)
        x_high = y

        return x_high, x_128, x_64, x_32, x_16


class ResNet50OS8(nn.Module):
    """ResNet50-based OS8 backbone per the reference's 50-layer branch
    (resnet.py:206-227): torchvision resnet50 stem + Bottleneck layer1/2
    (pretrained-convertible), then BasicBlock dilated stages at 1024/2048
    channels. Taps: x_128 (64ch), x_64 (256ch), x_32 (512ch)."""

    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        y = TorchConv(64, 7, 2, 3, use_bias=False, dtype=self.dtype,
                      quant=self.quant, name="conv1")(x)
        y = TorchBatchNorm(dtype=self.dtype, name="bn1")(y, train)
        x_128 = nn.relu(y)

        y = max_pool_3x3_s2_p1(x_128)
        for blk in _stage("layer1", 64, 3, 1, 1, 64, self.dtype,
                          block=Bottleneck, quant=self.quant):
            y = blk(y, train)
        x_64 = y  # 256ch

        for blk in _stage("layer2", 128, 4, 2, 1, 256, self.dtype,
                          block=Bottleneck, quant=self.quant):
            y = blk(y, train)
        x_32 = y  # 512ch

        for blk in _stage("layer4", 1024, 6, 1, 2, 512, self.dtype,
                          quant=self.quant):
            y = blk(y, train)
        x_16 = y

        for blk in _stage("layer5", 2048, 3, 1, 4, 1024, self.dtype,
                          quant=self.quant):
            y = blk(y, train)
        return y, x_128, x_64, x_32, x_16
