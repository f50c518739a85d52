"""Checkpoint EXPORT: flax variables -> reference-format torch .pth.

The import direction (convert_reference_state_dict) is golden-tested in
test_model_parity / test_reference_torch_oracle; these tests pin the
inverse: exporting re-imported variables reproduces the original torch
state_dict BIT-EXACTLY, loads strict into the reference's own module
topology, and a written .pth round-trips through our runner loader.
Reference format: utils_v2.py save_checkpoint (model_state_dict +
iteration_step + best_score)."""

import numpy as np
import pytest
import torch

from torch_oracle import ReferenceNet, ReferenceNet50
from zebrapose_tpu.models.convert_torch import (
    convert_reference_state_dict, export_reference_state_dict,
    save_reference_checkpoint, strip_ddp_prefix)


def _roundtrip(net, variant, resnet_layers=34):
    sd = strip_ddp_prefix(net.state_dict())
    variables = convert_reference_state_dict(sd, variant=variant,
                                             resnet_layers=resnet_layers)
    out = export_reference_state_dict(variables, variant=variant,
                                      resnet_layers=resnet_layers)
    return sd, variables, out


@pytest.mark.parametrize("variant", ["v1", "v2", "v3"])
def test_export_bitexact_and_strict_load(variant):
    torch.manual_seed(11)
    net = ReferenceNet(variant=variant, code_len=16).eval()
    sd, _, out = _roundtrip(net, variant)

    # exact key space (num_batches_tracked included for strict loads)
    assert set(out) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(
            out[k], v.numpy(), err_msg=k)

    # loads strict into a FRESH reference-topology module
    net2 = ReferenceNet(variant=variant, code_len=16)
    net2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) if v.ndim
         else torch.tensor(v) for k, v in out.items()}, strict=True)


def test_export_bitexact_resnet50():
    torch.manual_seed(12)
    net = ReferenceNet50(code_len=16).eval()
    sd, _, out = _roundtrip(net, "v2", resnet_layers=50)
    assert set(out) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(out[k], v.numpy(), err_msg=k)


def test_saved_pth_roundtrips_through_runner_loader(tmp_path):
    """save_reference_checkpoint writes a .pth our own eval runner (and
    the reference's test.py) can load; variables survive bit-exactly."""
    from zebrapose_tpu.eval.runner import load_model_variables

    torch.manual_seed(13)
    net = ReferenceNet(variant="v2", code_len=16).eval()
    variables = convert_reference_state_dict(
        strip_ddp_prefix(net.state_dict()), variant="v2")

    path = str(tmp_path / "exported.pth")
    save_reference_checkpoint(path, variables, iteration_step=1234,
                              best_score=0.875, variant="v2")

    ckpt = torch.load(path, map_location="cpu")
    assert ckpt["iteration_step"] == 1234
    assert ckpt["best_score"] == 0.875

    back = load_model_variables(path, model=None, variant="v2",
                                crop_size=64)
    flat_a = _flat(variables)
    flat_b = _flat(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=str(k))


def _flat(variables):
    from flax.traverse_util import flatten_dict
    return {("params",) + k: v
            for k, v in flatten_dict(variables["params"]).items()} | \
           {("batch_stats",) + k: v
            for k, v in flatten_dict(variables["batch_stats"]).items()}
