"""Convert reference PyTorch checkpoints / torchvision backbones to Flax.

The reference ships torch checkpoints of BinaryCodeNet_Deeplab{_v2,_v3}
(`zebrapose/utils_v2.py` dict format with `model_state_dict`) and trains
from torchvision resnet34 pretrained weights (`model/resnet.py:186-189`).
This module maps those state dicts weight-for-weight onto the
`ZebraPoseNet` parameter tree (NHWC kernels, BN running stats under
`batch_stats`).

Conventions:
  * conv weight  [out,in,kh,kw]  -> kernel [kh,kw,in,out]
  * convT weight [in,out,kh,kw]  -> kernel [kh,kw,out,in]
    (both are .transpose(2,3,1,0))
  * BN weight/bias/running_mean/running_var -> scale/bias/mean/var
  * DDP "module." prefixes (train_v5 checkpoints) are stripped.

Only numpy/flax needed at import; torch is needed by callers to load the
.pth file itself.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
from flax.traverse_util import unflatten_dict

_BLOCK_STAGES = {  # resnet_layers -> (ours, torch prefix, n, bottleneck)
    34: (("layer1", "resnet.4", 3, False),
         ("layer2", "resnet.5", 4, False),
         ("layer4", "layer4", 6, False),
         ("layer5", "layer5", 3, False)),
    50: (("layer1", "resnet.4", 3, True),
         ("layer2", "resnet.5", 4, True),
         ("layer4", "layer4", 6, False),
         ("layer5", "layer5", 3, False)),
}

_ASPP_CONVS = ("conv_1x1_1", "conv_3x3_1", "conv_3x3_2", "conv_3x3_3",
               "conv_1x1_2", "conv_1x1_3")
_ASPP_V3_CONVS = ("conv_1x1_1", "conv_3x3_1", "conv_3x3_2", "conv_1x1_2",
                  "conv_1x1_3")


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def strip_ddp_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


class _TreeBuilder:
    def __init__(self, sd: Dict[str, Any]):
        self.sd = sd
        self.params: Dict[Tuple[str, ...], np.ndarray] = {}
        self.stats: Dict[Tuple[str, ...], np.ndarray] = {}

    def conv(self, ours: Tuple[str, ...], theirs: str, bias: bool = False):
        w = _np(self.sd[theirs + ".weight"]).transpose(2, 3, 1, 0)
        self.params[ours + ("kernel",)] = w
        if bias:
            self.params[ours + ("bias",)] = _np(self.sd[theirs + ".bias"])

    def convt(self, ours: Tuple[str, ...], theirs: str):
        w = _np(self.sd[theirs + ".weight"]).transpose(2, 3, 1, 0)
        self.params[ours + ("kernel",)] = w

    def bn(self, ours: Tuple[str, ...], theirs: str):
        self.params[ours + ("scale",)] = _np(self.sd[theirs + ".weight"])
        self.params[ours + ("bias",)] = _np(self.sd[theirs + ".bias"])
        self.stats[ours + ("mean",)] = _np(self.sd[theirs + ".running_mean"])
        self.stats[ours + ("var",)] = _np(self.sd[theirs + ".running_var"])

    def basic_block(self, ours: Tuple[str, ...], theirs: str,
                    bottleneck: bool = False):
        self.conv(ours + ("conv1", "conv"), theirs + ".conv1")
        self.bn(ours + ("bn1", "bn"), theirs + ".bn1")
        self.conv(ours + ("conv2", "conv"), theirs + ".conv2")
        self.bn(ours + ("bn2", "bn"), theirs + ".bn2")
        if bottleneck:
            self.conv(ours + ("conv3", "conv"), theirs + ".conv3")
            self.bn(ours + ("bn3", "bn"), theirs + ".bn3")
        if theirs + ".downsample.0.weight" in self.sd:
            self.conv(ours + ("downsample_conv", "conv"),
                      theirs + ".downsample.0")
            self.bn(ours + ("downsample_bn", "bn"), theirs + ".downsample.1")

    def conv_bn_relu(self, ours: Tuple[str, ...], conv_key: str,
                     bn_key: str):
        self.conv(ours + ("conv", "conv"), conv_key, bias=True)
        self.bn(ours + ("bn", "bn"), bn_key)

    def upsample(self, ours: Tuple[str, ...], theirs: str):
        self.convt(ours + ("deconv",), theirs + ".0")
        self.bn(ours + ("bn0", "bn"), theirs + ".1")
        self.conv(ours + ("conv1", "conv"), theirs + ".3")
        self.bn(ours + ("bn1", "bn"), theirs + ".4")
        self.conv(ours + ("conv2", "conv"), theirs + ".6")
        self.bn(ours + ("bn2", "bn"), theirs + ".7")

    def aspp_trunk(self, ours_root: str, theirs_root: str, convs):
        for name in convs:
            self.conv_bn_relu((ours_root, name),
                              f"{theirs_root}.{name}",
                              f"{theirs_root}.bn_{name}")
        self.upsample((ours_root, "upsample_1"), f"{theirs_root}.upsample_1")
        self.upsample((ours_root, "upsample_2"), f"{theirs_root}.upsample_2")

    def build(self):
        return (unflatten_dict(self.params), unflatten_dict(self.stats))


def _walk_reference(tb, variant: str, nonbinary: bool,
                    resnet_layers: int) -> None:
    """Enumerate the flax<->torch leaf mapping through a builder.

    The SAME walk drives both directions (import `_TreeBuilder`, export
    `_ExportBuilder`), so the two can never disagree on the mapping."""
    # ---- backbone -------------------------------------------------------
    root = "net.resnet"
    tb.conv(("resnet", "conv1", "conv"), f"{root}.resnet.0")
    tb.bn(("resnet", "bn1", "bn"), f"{root}.resnet.1")
    for ours, theirs, n, bneck in _BLOCK_STAGES[resnet_layers]:
        for i in range(n):
            tb.basic_block(("resnet", f"{ours}_{i}"),
                           f"{root}.{theirs}.{i}", bottleneck=bneck)

    # ---- decoder(s) -----------------------------------------------------
    if nonbinary:
        tb.aspp_trunk("aspp", "net.aspp", _ASPP_CONVS)
        tb.conv(("aspp", "conv_1x1_4_mask", "conv"),
                "net.aspp.conv_1x1_4_mask", bias=True)
        tb.conv(("aspp", "conv_1x1_4_code", "conv"),
                "net.aspp.conv_1x1_4_code", bias=True)
    else:
        tb.aspp_trunk("aspp", "net.aspp", _ASPP_CONVS)
        tb.conv(("aspp", "conv_1x1_4", "conv"), "net.aspp.conv_1x1_4",
                bias=True)
        if variant == "v3":
            tb.aspp_trunk("aspp_v3", "net.aspp_v3", _ASPP_V3_CONVS)
            tb.conv(("aspp_v3", "conv_1x1_4", "conv"),
                    "net.aspp_v3.conv_1x1_4", bias=True)


def convert_reference_state_dict(sd: Dict[str, Any], variant: str = "v2",
                                 nonbinary: bool = False,
                                 resnet_layers: int = 34
                                 ) -> Dict[str, Any]:
    """Reference BinaryCodeNet state_dict -> {"params", "batch_stats"}.

    `sd` is the torch `model_state_dict` (e.g. ckpt["model_state_dict"]).
    """
    sd = strip_ddp_prefix(sd)
    tb = _TreeBuilder(sd)
    _walk_reference(tb, variant, nonbinary, resnet_layers)
    params, stats = tb.build()
    return {"params": params, "batch_stats": stats}


class _ExportBuilder:
    """Inverse of `_TreeBuilder`: flax variables -> torch state_dict keys.

    Driven by the same `_walk_reference`; kernel transposes are the
    inverse permutation (3,2,0,1) of the import's (2,3,1,0) for both
    conv ([kh,kw,in,out] -> [out,in,kh,kw]) and transposed conv
    ([kh,kw,out,in] -> [in,out,kh,kw])."""

    def __init__(self, variables: Dict[str, Any]):
        from flax.traverse_util import flatten_dict

        self.params = flatten_dict(variables.get("params", {}))
        self.stats = flatten_dict(variables.get("batch_stats", {}))
        self.sd: Dict[str, np.ndarray] = {}

    def _p(self, key: Tuple[str, ...]) -> np.ndarray:
        return np.asarray(self.params[key])

    def conv(self, ours: Tuple[str, ...], theirs: str, bias: bool = False):
        self.sd[theirs + ".weight"] = \
            self._p(ours + ("kernel",)).transpose(3, 2, 0, 1)
        if bias:
            self.sd[theirs + ".bias"] = self._p(ours + ("bias",))

    def convt(self, ours: Tuple[str, ...], theirs: str):
        self.sd[theirs + ".weight"] = \
            self._p(ours + ("kernel",)).transpose(3, 2, 0, 1)

    def bn(self, ours: Tuple[str, ...], theirs: str):
        self.sd[theirs + ".weight"] = self._p(ours + ("scale",))
        self.sd[theirs + ".bias"] = self._p(ours + ("bias",))
        self.sd[theirs + ".running_mean"] = \
            np.asarray(self.stats[ours + ("mean",)])
        self.sd[theirs + ".running_var"] = \
            np.asarray(self.stats[ours + ("var",)])
        # torch BN tracks a batch counter; the flax side has no analog
        # (momentum-EMA stats) — 0 is what a fresh torch module holds
        self.sd[theirs + ".num_batches_tracked"] = np.asarray(0, np.int64)

    def basic_block(self, ours: Tuple[str, ...], theirs: str,
                    bottleneck: bool = False):
        self.conv(ours + ("conv1", "conv"), theirs + ".conv1")
        self.bn(ours + ("bn1", "bn"), theirs + ".bn1")
        self.conv(ours + ("conv2", "conv"), theirs + ".conv2")
        self.bn(ours + ("bn2", "bn"), theirs + ".bn2")
        if bottleneck:
            self.conv(ours + ("conv3", "conv"), theirs + ".conv3")
            self.bn(ours + ("bn3", "bn"), theirs + ".bn3")
        if ours + ("downsample_conv", "conv", "kernel") in self.params:
            self.conv(ours + ("downsample_conv", "conv"),
                      theirs + ".downsample.0")
            self.bn(ours + ("downsample_bn", "bn"), theirs + ".downsample.1")

    def conv_bn_relu(self, ours: Tuple[str, ...], conv_key: str,
                     bn_key: str):
        self.conv(ours + ("conv", "conv"), conv_key, bias=True)
        self.bn(ours + ("bn", "bn"), bn_key)

    def upsample(self, ours: Tuple[str, ...], theirs: str):
        self.convt(ours + ("deconv",), theirs + ".0")
        self.bn(ours + ("bn0", "bn"), theirs + ".1")
        self.conv(ours + ("conv1", "conv"), theirs + ".3")
        self.bn(ours + ("bn1", "bn"), theirs + ".4")
        self.conv(ours + ("conv2", "conv"), theirs + ".6")
        self.bn(ours + ("bn2", "bn"), theirs + ".7")

    def aspp_trunk(self, ours_root: str, theirs_root: str, convs):
        for name in convs:
            self.conv_bn_relu((ours_root, name),
                              f"{theirs_root}.{name}",
                              f"{theirs_root}.bn_{name}")
        self.upsample((ours_root, "upsample_1"), f"{theirs_root}.upsample_1")
        self.upsample((ours_root, "upsample_2"), f"{theirs_root}.upsample_2")


# With concat_decoder=True the reference's ResNet_BasicBlock_OS8
# registers the SAME torchvision stem/layer1/layer2 modules TWICE —
# once inside `self.resnet` (Sequential of children[:-4]) and again as
# `self.resnet_layer_{1,2,3}` skip-tap Sequentials (model/resnet.py:
# 195-199) — so its state_dict carries duplicate key families and a
# strict load demands BOTH. The importer only needs the canonical
# family; the exporter must emit the aliases too (found 2026-08-19 when
# the first real cross-stack strict-load failed on them).
_CONCAT_ALIASES = (
    ("net.resnet.resnet.0.", "net.resnet.resnet_layer_1.0."),  # conv1
    ("net.resnet.resnet.1.", "net.resnet.resnet_layer_1.1."),  # bn1
    ("net.resnet.resnet.4.", "net.resnet.resnet_layer_2.1."),  # layer1
    ("net.resnet.resnet.5.", "net.resnet.resnet_layer_3.0."),  # layer2
)


def export_reference_state_dict(variables: Dict[str, Any],
                                variant: str = "v2",
                                nonbinary: bool = False,
                                resnet_layers: int = 34,
                                concat: bool = True
                                ) -> Dict[str, np.ndarray]:
    """ZebraPoseNet variables -> a reference-format state_dict (numpy).

    The exact inverse of `convert_reference_state_dict`: the result
    loads strict into the reference's BinaryCodeNet_Deeplab modules
    (float32 leaves; wrap values in torch.from_numpy / use
    `save_reference_checkpoint` to write a loadable .pth). Enables
    round-tripping models trained HERE back into the reference's
    torch tooling (test.py:85-120 checkpoint loading). `concat` must
    match the target module's concat_decoder flag (the shipped v2/v3
    configs use True): it controls the duplicated resnet_layer_* alias
    keys (see _CONCAT_ALIASES)."""
    eb = _ExportBuilder(variables)
    _walk_reference(eb, variant, nonbinary, resnet_layers)
    if concat:
        for src, dst in _CONCAT_ALIASES:
            for k in [k for k in eb.sd if k.startswith(src)]:
                eb.sd[dst + k[len(src):]] = eb.sd[k]
    return eb.sd


def save_reference_checkpoint(path: str, variables: Dict[str, Any],
                              iteration_step: int = 0,
                              best_score: float = 0.0,
                              variant: str = "v2",
                              nonbinary: bool = False,
                              resnet_layers: int = 34,
                              concat: bool = True) -> None:
    """Write a reference-format .pth (utils_v2.save_checkpoint dict:
    model_state_dict + iteration_step + best_score; optimizer and
    lr_scheduler states are torch-specific and omitted — the reference
    only needs them to RESUME training, not to evaluate)."""
    import torch

    sd = export_reference_state_dict(variables, variant=variant,
                                     nonbinary=nonbinary,
                                     resnet_layers=resnet_layers,
                                     concat=concat)
    torch.save({
        "model_state_dict": {
            k: torch.from_numpy(np.ascontiguousarray(v)) if v.ndim
            else torch.tensor(v) for k, v in sd.items()},
        "iteration_step": int(iteration_step),
        "best_score": float(best_score),
    }, path)


def convert_torchvision_resnet34(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision resnet34 state_dict -> partial trees for the backbone
    stem/layer1/layer2 (what the reference actually loads pretrained,
    model/resnet.py:184-199). Returns {"params", "batch_stats"} covering
    only those leaves; merge over a fresh init with `merge_pretrained`.
    """
    tb = _TreeBuilder(sd)
    tb.conv(("resnet", "conv1", "conv"), "conv1")
    tb.bn(("resnet", "bn1", "bn"), "bn1")
    for ours, theirs, n in (("layer1", "layer1", 3), ("layer2", "layer2", 4)):
        for i in range(n):
            tb.basic_block(("resnet", f"{ours}_{i}"), f"{theirs}.{i}")
    params, stats = tb.build()
    return {"params": params, "batch_stats": stats}


def merge_pretrained(variables: Dict[str, Any],
                     pretrained: Dict[str, Any]) -> Dict[str, Any]:
    """Deep-merge converted pretrained leaves over freshly-initialized
    variables, with shape checks."""

    def merge(dst, src, path=()):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                out[k] = merge(dst.get(k, {}), v, path + (k,))
            else:
                if k in dst and np.shape(dst[k]) != np.shape(v):
                    raise ValueError(
                        f"shape mismatch at {'/'.join(path + (k,))}: "
                        f"{np.shape(dst[k])} vs {np.shape(v)}")
                out[k] = np.asarray(v)
        return out

    out = dict(variables)
    for coll in ("params", "batch_stats"):
        if coll in pretrained:
            out[coll] = merge(variables.get(coll, {}), pretrained[coll])
    return out
