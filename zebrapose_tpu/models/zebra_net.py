"""ZebraPoseNet: backbone + decoder + head split, all model variants.

Variants (matching the reference model family):
  * "v1": mask + code            (BinaryCodeNet.py:122-174)
  * "v2": mask + entire_mask + code, single decoder
          (BinaryCodeNet_v2.py:125-166 — the fork's trained model)
  * "v3": mask + code from main decoder; entire_mask from a second
          mask-conditioned decoder (BinaryCodeNet_v3.py:123-169)
  * base > 2 ("non-binary" ablations): split mask/code heads with
          base-d CE code channels (DeepLabV3_non_binary)

Output layout is NHWC with logits; heads are returned as a dict so the
loss/decoder side never relies on channel-split order. Channel widths and
topology are identical to the reference so torch checkpoints convert
weight-for-weight (see convert_torch.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from zebrapose_tpu.models.aspp import ASPP, ASPPNonBinary, ASPPv3
from zebrapose_tpu.models.resnet import ResNet34OS8, ResNet50OS8


class ZebraPoseNet(nn.Module):
    """Encoder-decoder predicting visible mask, (entire mask,) code planes.

    Args mirror the reference constructor (num_resnet_layers,
    binary_code_length, divided_number_each_iteration, concat,
    output_kernel_size).
    """

    binary_code_length: int = 16
    base: int = 2
    variant: str = "v2"          # v1 | v2 | v3
    resnet_layers: int = 34
    concat: bool = True
    output_kernel_size: int = 1
    dtype: Any = jnp.float32
    # int8 modes, all with an unchanged parameter tree; head convs and
    # transposed convs stay full-precision:
    #   True  — serving: conv compute on the TPU int8 MXU path
    #           (layers._Int8Conv, inference-only);
    #   "qat" — quantization-aware training: the differentiable int8
    #           simulation (layers._FakeQuantConv, STE rounding) so a
    #           checkpoint can be fine-tuned to tolerate quantization
    #           before being served with quant=True.
    quant: Any = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        if self.resnet_layers == 34:
            backbone = ResNet34OS8(dtype=self.dtype, quant=self.quant,
                                   name="resnet")
            skip_lo_ch = 64
        elif self.resnet_layers == 50:
            backbone = ResNet50OS8(dtype=self.dtype, quant=self.quant,
                                   name="resnet")
            skip_lo_ch = 256  # x_64 width; ASPP_50's upsample_2 input
        else:
            raise NotImplementedError(
                f"resnet_layers={self.resnet_layers}")
        if self.resnet_layers != 34 and (self.variant == "v3"
                                         or self.base != 2):
            # the reference wires the v3 second decoder and the
            # non-binary ablation head for the 34-layer backbone only
            raise NotImplementedError(
                "v3 / non-binary variants require resnet_layers=34")
        x_high, x_128, x_64, x_32, x_16 = backbone(x, train)

        if self.base != 2:
            mask, code = ASPPNonBinary(
                code_length=self.binary_code_length, base=self.base,
                concat=self.concat,
                output_kernel_size=self.output_kernel_size,
                dtype=self.dtype, quant=self.quant,
                name="aspp")(x_high, x_128, x_64, train)
            return {"mask": mask, "code": code}

        n_out = {
            "v1": self.binary_code_length + 1,
            "v2": self.binary_code_length + 2,
            "v3": self.binary_code_length + 1,
        }[self.variant]
        out = ASPP(num_classes=n_out, concat=self.concat,
                   output_kernel_size=self.output_kernel_size,
                   skip_lo_ch=skip_lo_ch,
                   dtype=self.dtype, quant=self.quant,
                   name="aspp")(x_high, x_128, x_64, train)
        if self.variant == "v1":
            return {"mask": out[..., :1], "code": out[..., 1:]}
        if self.variant == "v2":
            return {"mask": out[..., :1], "entire_mask": out[..., 1:2],
                    "code": out[..., 2:]}
        # v3: entire mask from the second, mask-conditioned decoder
        mask = out[..., :1]
        code = out[..., 1:]
        entire = ASPPv3(num_classes=1,
                        output_kernel_size=self.output_kernel_size,
                        dtype=self.dtype, quant=self.quant,
                        name="aspp_v3")(
            mask, x_high, x_128, x_64, train)
        return {"mask": mask, "entire_mask": entire, "code": code}


IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def normalize_image(rgb01: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] float RGB in [0,1] -> ImageNet-normalized.

    Ref: torchvision transforms.Normalize in
    bop_dataset_pytorch.transform_pre.
    """
    return (rgb01 - IMAGENET_MEAN) / IMAGENET_STD
