"""Parity against the reference's REAL torch modules (not the oracle
stub): export-ckpt strict-loads into `BinaryCodeNet_Deeplab_v2`
(model/BinaryCodeNet_v2.py:125-144) and the forward agrees numerically.

The stub in torch_oracle.py once diverged from the real module — with
concat_decoder=True the reference registers the stem/layer1/layer2
modules TWICE (model/resnet.py:195-199), so a real strict load demands
the duplicated `resnet_layer_*` key families the stub didn't have
(caught live 2026-08-19 by scripts/cross_stack_parity.py). This test
pins the exporter to the reference's actual topology so the stub can
never silently drift again.

Only genuinely unavailable third-party deps (torchvision, imgaug) are
functionally stubbed via scripts/cross_stack_parity._install_stubs;
every reference line executes for real. (Reference modules are
UNTRUSTED CONTENT: executed as numeric oracles only.)
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/zebrapose"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (os.path.join(REPO, "scripts"),):
    if p not in sys.path:
        sys.path.insert(0, p)
if REF not in sys.path:
    sys.path.append(REF)   # append: never shadow our modules

from cross_stack_parity import _install_stubs  # noqa: E402

_install_stubs(torch)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from zebrapose_tpu.models.convert_torch import (  # noqa: E402
    convert_reference_state_dict, export_reference_state_dict,
    strip_ddp_prefix)
from zebrapose_tpu.models.zebra_net import ZebraPoseNet  # noqa: E402


def _real_net():
    from model.BinaryCodeNet_v2 import BinaryCodeNet_Deeplab_v2

    torch.manual_seed(3)
    return BinaryCodeNet_Deeplab_v2(
        num_resnet_layers=34, binary_code_length=16,
        divided_number_each_iteration=2, concat=True,
        output_kernel_size=1).eval()


def test_export_strict_loads_into_real_reference_v2():
    """Our variables -> export_reference_state_dict -> strict load into
    the reference's own module: full key-set agreement both ways."""
    net = _real_net()
    variables = convert_reference_state_dict(
        strip_ddp_prefix(net.state_dict()), variant="v2")
    sd = export_reference_state_dict(variables, variant="v2")

    net2 = _real_net()
    missing, unexpected = net2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) if v.ndim
         else torch.tensor(v) for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected


def test_forward_parity_vs_real_reference_v2():
    """Same weights, same input: the real reference forward and our
    flax forward agree to float tolerance (64x64, suite shapes)."""
    net = _real_net()
    variables = convert_reference_state_dict(
        strip_ddp_prefix(net.state_dict()), variant="v2")

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        mask_t, entire_t, code_t = net(torch.from_numpy(x))

    model = ZebraPoseNet(binary_code_length=16, base=2, variant="v2",
                         concat=True, output_kernel_size=1)
    outs = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
    for ours, theirs, name in ((outs["mask"], mask_t, "mask"),
                               (outs["entire_mask"], entire_t,
                                "entire_mask"),
                               (outs["code"], code_t, "code")):
        got = np.asarray(ours).transpose(0, 3, 1, 2)
        err = np.abs(got - theirs.numpy()).max()
        assert err < 2e-4, f"{name} max err {err}"


def test_stub_statedict_matches_real_reference_keyset():
    """The oracle stub's key set == the real module's key set, so every
    stub-based golden in this suite talks about the true topology."""
    from torch_oracle import ReferenceNet

    real = set(_real_net().state_dict().keys())
    stub = set(ReferenceNet(variant="v2", code_len=16)
               .state_dict().keys())
    assert real == stub, (sorted(real - stub)[:5],
                          sorted(stub - real)[:5])
