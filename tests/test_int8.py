"""int8 serving mode (models/layers._Int8Conv): checkpoint compatibility
and numerical sanity. The accuracy/throughput gate on the trained
rehearsal checkpoint is scripts/int8_eval.py (real TPU): measured
1261 vs 1029 crops/s (+22%) at ADD recall 0.717 vs 0.733 — see PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zebrapose_tpu.models.layers import TorchConv, _Int8Conv
from zebrapose_tpu.models.zebra_net import ZebraPoseNet


def _models(**kw):
    m = ZebraPoseNet(binary_code_length=4, variant="v2", **kw)
    mq = ZebraPoseNet(binary_code_length=4, variant="v2", quant=True, **kw)
    return m, mq


def test_quant_param_tree_identical():
    """quant=True must load the exact same checkpoints: identical
    variable tree (names, shapes, dtypes)."""
    m, mq = _models()
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    vq = mq.init(jax.random.PRNGKey(0), x, train=False)
    t = jax.tree.map(lambda a: (a.shape, a.dtype), v)
    tq = jax.tree.map(lambda a: (a.shape, a.dtype), vq)
    assert jax.tree.structure(t) == jax.tree.structure(tq)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, t, tq))


def test_quant_forward_close_to_float():
    """Per-channel weight / per-tensor activation int8 should track the
    float forward within a few percent of the logit range on random
    weights, and most binarized code bits should agree."""
    m, mq = _models()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    outq = mq.apply(v, x, train=False)
    for k in out:
        amax = float(jnp.max(jnp.abs(out[k])))
        diff = float(jnp.max(jnp.abs(out[k] - outq[k])))
        assert diff < 0.05 * amax + 1e-3, (k, diff, amax)
    agree = float(jnp.mean((out["code"] > 0) == (outq["code"] > 0)))
    assert agree > 0.95


def test_small_convs_exempt_bit_exact():
    """Convs below the Cin*Cout bar fall back to the float path and must
    be bit-identical to a plain TorchConv."""
    conv = TorchConv(8, 3, 1, 1, use_bias=True)
    convq = TorchConv(8, 3, 1, 1, use_bias=True, quant=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
    v = conv.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(np.asarray(conv.apply(v, x)),
                                  np.asarray(convq.apply(v, x)))


def test_int8_conv_param_names_match_nn_conv():
    """_Int8Conv must declare nn.Conv's exact param names/shapes so the
    swap is invisible to checkpoints."""
    c = _Int8Conv(features=16, kernel_size=(3, 3),
                  padding=((1, 1), (1, 1)))
    x = jnp.zeros((1, 8, 8, 4))
    v = c.init(jax.random.PRNGKey(0), x)
    assert set(v["params"].keys()) == {"kernel", "bias"}
    assert v["params"]["kernel"].shape == (3, 3, 4, 16)
    assert v["params"]["bias"].shape == (16,)


def test_int8_conv_quantization_error_bounded():
    """One isolated int8 conv: output error vs exact f32 conv bounded by
    the quantization step (activations amax/127, weights per-channel)."""
    rng = np.random.default_rng(2)
    cin, cout = 64, 256   # above the quantization bar
    conv = TorchConv(cout, 3, 1, 1, use_bias=False)
    convq = TorchConv(cout, 3, 1, 1, use_bias=False, quant=True)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, cin)).astype(np.float32))
    v = conv.init(jax.random.PRNGKey(0), x)
    y = np.asarray(conv.apply(v, x))
    yq = np.asarray(convq.apply(v, x))
    # error budget: per-element |e| <= 9*cin * (sx*|w| + sw*|x| + sx*sw)/2
    # in the worst case; empirically ~1e-2 of the output range here
    rel = np.max(np.abs(y - yq)) / (np.max(np.abs(y)) + 1e-9)
    assert rel < 0.05, rel


@pytest.mark.parametrize("variant", ["v1", "v3"])
def test_quant_other_variants_run(variant):
    m = ZebraPoseNet(binary_code_length=4, variant=variant, quant=True)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert all(bool(jnp.all(jnp.isfinite(o))) for o in out.values())


def test_quant_resnet50_runs():
    """Bottleneck (r50) plumbing: quant model runs and stays finite."""
    m = ZebraPoseNet(binary_code_length=4, variant="v2",
                     resnet_layers=50, quant=True)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert all(bool(jnp.all(jnp.isfinite(o))) for o in out.values())
