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


# ---------------------------------------------------------------- QAT


def test_qat_param_tree_identical():
    """quant='qat' declares the same variable tree as the float and int8
    models — checkpoints move freely between train/qat/serve."""
    m = ZebraPoseNet(binary_code_length=4, variant="v2")
    mq = ZebraPoseNet(binary_code_length=4, variant="v2", quant="qat")
    x = jnp.zeros((1, 32, 32, 3))
    t = jax.tree.map(lambda a: (a.shape, a.dtype),
                     m.init(jax.random.PRNGKey(0), x, train=False))
    tq = jax.tree.map(lambda a: (a.shape, a.dtype),
                      mq.init(jax.random.PRNGKey(0), x, train=False))
    assert jax.tree.structure(t) == jax.tree.structure(tq)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, t, tq))


def test_qat_forward_matches_int8_serving():
    """The QAT fake-quant forward must track the deployed int8 forward
    on the SAME variables to accumulation error (float conv over
    integer-valued arrays vs int32 accumulate), not merely 'be close':
    what QAT optimizes is what serving runs."""
    mq8 = ZebraPoseNet(binary_code_length=4, variant="v2", quant=True)
    mqat = ZebraPoseNet(binary_code_length=4, variant="v2", quant="qat")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    v = mq8.init(jax.random.PRNGKey(0), x, train=False)
    out8 = mq8.apply(v, x, train=False)
    outq = mqat.apply(v, x, train=False)
    for k in out8:
        amax = float(jnp.max(jnp.abs(out8[k]))) + 1e-9
        diff = float(jnp.max(jnp.abs(out8[k] - outq[k])))
        assert diff < 1e-4 * amax + 1e-5, (k, diff, amax)


def test_qat_gradients_flow_through_quantized_conv():
    """STE: a conv above the quantization bar must pass useful (finite,
    nonzero) gradients to its kernel — plain round() would zero them."""
    conv = TorchConv(256, 3, 1, 1, use_bias=True, quant="qat")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 64)).astype(np.float32))
    v = conv.init(jax.random.PRNGKey(0), x)
    # 64*256 clears quant_min_cinxcout: the quantized path is active
    # (the fallback would make this test vacuous)
    assert 64 * 256 >= TorchConv.quant_min_cinxcout
    target = jnp.asarray(rng.normal(size=(1, 8, 8, 256)).astype(np.float32))

    def loss(params):
        y = conv.apply({"params": params}, x)
        return jnp.mean((y - target) ** 2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert gnorm > 0.0, "gradients vanished through the quantizer"


def test_qat_finetune_reduces_quantized_error():
    """Micro QAT loop: a few SGD steps on the fake-quant forward must
    reduce the INT8-SERVED model's loss below its post-training-
    quantization starting point (the whole point of QAT)."""
    import optax

    conv = TorchConv(256, 3, 1, 1, use_bias=True)
    convq = TorchConv(256, 3, 1, 1, use_bias=True, quant=True)
    convqat = TorchConv(256, 3, 1, 1, use_bias=True, quant="qat")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    v = conv.init(jax.random.PRNGKey(1), x)
    target = conv.apply(v, x)  # float net's own output = ideal target

    def qat_loss(params):
        return jnp.mean((convqat.apply({"params": params}, x)
                         - target) ** 2)

    def served_loss(params):
        return float(jnp.mean((convq.apply({"params": params}, x)
                               - target) ** 2))

    ptq = served_loss(v["params"])      # post-training quantization
    # lr 1e-4: larger steps overshoot the narrow quantization-noise
    # minimum at first (measured 1e-3 needs ~60 steps just to get back
    # under the PTQ start); 1e-4 reaches ~0.33x by step 20
    opt = optax.adam(1e-4)
    params = v["params"]
    opt_state = opt.init(params)
    step = jax.jit(lambda p, s: (lambda g: opt.update(g, s, p))(
        jax.grad(qat_loss)(p)))
    for _ in range(60):
        updates, opt_state = step(params, opt_state)
        params = optax.apply_updates(params, updates)
    assert served_loss(params) < 0.5 * ptq, (served_loss(params), ptq)


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
