"""Compact inference checkpoint (utils/compact_ckpt.py).

Pins the two properties the committed rehearsal npz relies on:
round-trip structural fidelity, and the forward-bit-exactness argument
for bf16 storage — a bf16-compute model (flax `dtype=jnp.bfloat16`
casts f32 params at apply time) produces IDENTICAL outputs from the
f32 params and from their bf16-rounded f32 reload, because
bf16(f32(bf16(x))) == bf16(x) (the widening cast is value-preserving).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zebrapose_tpu.utils.compact_ckpt import load_compact, save_compact


def _tree(rng):
    return {
        "params": {
            "conv": {"kernel": rng.normal(size=(3, 3, 4, 8))
                     .astype(np.float32)},
            "bn": {"scale": rng.normal(size=(8,)).astype(np.float32)},
        },
        "batch_stats": {"bn": {"mean": rng.normal(size=(8,))
                               .astype(np.float32),
                               "var": rng.uniform(0.5, 2, size=(8,))
                               .astype(np.float32)}},
    }


def test_round_trip_structure_and_meta(tmp_path):
    rng = np.random.default_rng(0)
    tree = _tree(rng)
    path = str(tmp_path / "c.npz")
    save_compact(tree, path, meta={"step": 2500, "best_score": "0.742"})
    loaded, meta = load_compact(path)
    assert meta == {"step": 2500, "best_score": "0.742"}
    assert jax.tree.structure(loaded) == jax.tree.structure(tree)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(tree)):
        assert a.shape == b.shape and a.dtype == b.dtype
        # stored as bf16: equal after bf16 rounding, close in f32
        np.testing.assert_allclose(a, b, rtol=8e-3, atol=1e-6)


def test_bf16_storage_is_bf16_idempotent(tmp_path):
    """The exactness claim itself: rounding f32->bf16->f32->bf16 gives
    the same bf16 values as a single f32->bf16 cast, for every float
    in a representative sample including denormals and huge values."""
    import ml_dtypes

    x = np.concatenate([
        np.random.default_rng(1).normal(size=4096).astype(np.float32),
        np.float32([0, -0, 1e-38, -1e-38, 3.4e38, -3.4e38, 1e-45]),
    ])
    once = x.astype(ml_dtypes.bfloat16)
    path = str(tmp_path / "x.npz")
    save_compact({"params": {"w": x}}, path)
    reloaded = load_compact(path)[0]["params"]["w"]
    assert reloaded.dtype == np.float32
    twice = reloaded.astype(ml_dtypes.bfloat16)
    assert np.array_equal(once.view(np.uint16), twice.view(np.uint16))


def test_forward_bit_exact_for_bf16_model(tmp_path):
    """End-to-end on a real bf16 flax module: apply(original f32
    params) == apply(compact-reloaded params) bitwise."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), dtype=jnp.bfloat16)(x)
            return nn.Dense(4, dtype=jnp.bfloat16)(x.mean(axis=(1, 2)))

    m = M()
    x = jnp.asarray(np.random.default_rng(2)
                    .normal(size=(2, 8, 8, 4)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    path = str(tmp_path / "m.npz")
    save_compact(jax.tree.map(np.asarray, variables), path)
    reloaded = jax.tree.map(jnp.asarray, load_compact(path)[0])
    a = np.asarray(m.apply(variables, x))
    b = np.asarray(m.apply(reloaded, x))
    assert np.array_equal(a.view(np.uint8), b.view(np.uint8))


def test_int_leaves_and_bad_keys(tmp_path):
    path = str(tmp_path / "i.npz")
    save_compact({"params": {"steps": np.arange(3, dtype=np.int64)}},
                 path)
    loaded, meta = load_compact(path)
    assert loaded["params"]["steps"].dtype == np.int64
    assert meta == {}
    with pytest.raises(ValueError):
        save_compact({"a/b": np.zeros(1, np.float32)}, path)
