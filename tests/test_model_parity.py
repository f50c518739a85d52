"""Numerical parity: ZebraPoseNet (flax) vs a torch oracle of the
reference topology (see torch_oracle.py — state-dict-key compatible with
reference checkpoints). Pins conv padding, BN, deconv and interpolation
semantics end to end, and validates the checkpoint converter.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_oracle import ReferenceNet, fake_torchvision_resnet34_state_dict
from zebrapose_tpu.models.layers import interpolate_bilinear
from zebrapose_tpu.models.zebra_net import ZebraPoseNet, normalize_image
from zebrapose_tpu.models.convert_torch import (
    convert_reference_state_dict,
    convert_torchvision_resnet34,
    merge_pretrained,
    strip_ddp_prefix,
)


def test_interpolate_bilinear_matches_torch():
    rng = np.random.default_rng(20)
    x = rng.normal(size=(2, 16, 16, 5)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for out in [(8, 8), (32, 32), (5, 7)]:
        expect = torch.nn.functional.interpolate(
            xt, size=out, mode="bilinear").numpy().transpose(0, 2, 3, 1)
        got = np.asarray(interpolate_bilinear(jnp.asarray(x), out))
        np.testing.assert_allclose(got, expect, atol=1e-5)


@pytest.mark.parametrize("variant", ["v1", "v2", "v3"])
def test_forward_parity(variant):
    torch.manual_seed(42)
    net = ReferenceNet(variant=variant, code_len=16).eval()
    sd = strip_ddp_prefix(net.state_dict())
    variables = convert_reference_state_dict(sd, variant=variant)

    rng = np.random.default_rng(21)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs_t = net(torch.from_numpy(x))

    model = ZebraPoseNet(binary_code_length=16, base=2, variant=variant,
                         concat=True, output_kernel_size=1)
    outs = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)

    def chk(ours, theirs, name):
        got = np.asarray(ours).transpose(0, 3, 1, 2)
        err = np.abs(got - theirs.numpy()).max()
        assert err < 2e-4, f"{variant}/{name} max err {err}"

    if variant == "v1":
        chk(outs["mask"], outs_t[0], "mask")
        chk(outs["code"], outs_t[1], "code")
    else:
        chk(outs["mask"], outs_t[0], "mask")
        chk(outs["entire_mask"], outs_t[1], "entire_mask")
        chk(outs["code"], outs_t[2], "code")


def test_forward_parity_resnet50():
    from torch_oracle import ReferenceNet50
    torch.manual_seed(7)
    net = ReferenceNet50(code_len=16).eval()
    variables = convert_reference_state_dict(net.state_dict(),
                                             variant="v2",
                                             resnet_layers=50)
    rng = np.random.default_rng(22)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        mask_t, entire_t, code_t = net(torch.from_numpy(x))
    model = ZebraPoseNet(binary_code_length=16, variant="v2",
                         resnet_layers=50, concat=True)
    outs = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
    for ours, theirs, name in ((outs["mask"], mask_t, "mask"),
                               (outs["entire_mask"], entire_t, "entire"),
                               (outs["code"], code_t, "code")):
        err = np.abs(np.asarray(ours).transpose(0, 3, 1, 2) -
                     theirs.numpy()).max()
        assert err < 5e-4, f"resnet50/{name} max err {err}"


def test_ddp_prefix_stripping():
    net = ReferenceNet(variant="v1", code_len=4)
    sd = {"module." + k: v for k, v in net.state_dict().items()}
    variables = convert_reference_state_dict(strip_ddp_prefix(sd),
                                             variant="v1")
    assert "resnet" in variables["params"]


def test_torchvision_backbone_merge():
    torch.manual_seed(1)
    sd = fake_torchvision_resnet34_state_dict()
    pre = convert_torchvision_resnet34(sd)
    model = ZebraPoseNet(binary_code_length=16, variant="v2", concat=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    merged = merge_pretrained(dict(variables), pre)
    k = merged["params"]["resnet"]["conv1"]["conv"]["kernel"]
    expect = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(k), expect)
    out = model.apply(merged, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out["code"].shape == (1, 32, 32, 16)


def test_normalize_image():
    x = jnp.ones((2, 4, 4, 3)) * 0.5
    y = np.asarray(normalize_image(x))
    expect = (0.5 - np.array([0.485, 0.456, 0.406])) / \
        np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(y[0, 0, 0], expect, rtol=1e-5)
