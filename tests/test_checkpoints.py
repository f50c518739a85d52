"""Checkpoint manager tests: rolling keep-3, resume, best-by-score."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from zebrapose_tpu.train.checkpoints import CheckpointManager
from zebrapose_tpu.train.state import create_train_state


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        y = nn.Dense(4)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        return {"code": y}


def _mk_state():
    model = TinyNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    return create_train_state(model, variables, learning_rate=1e-3,
                              n_bits=4)


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    state = _mk_state()
    state = state.replace(step=jnp.asarray(7, jnp.int32),
                          histogram=jnp.arange(4.0))
    mgr.save(state)

    fresh = _mk_state()
    restored = mgr.restore(fresh)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.histogram),
                               np.arange(4.0))
    np.testing.assert_allclose(
        np.asarray(restored.params["Dense_0"]["kernel"]),
        np.asarray(state.params["Dense_0"]["kernel"]))
    mgr.close()


def test_restore_step_dir_and_loud_empty_root(tmp_path):
    """Eval entrypoints accept a direct orbax step dir verbatim, and an
    empty checkpoint root raises instead of silently handing back the
    random-init template (observed failure mode: garbage poses, recall
    0.0, no error — 2026-08-19 CLI drive)."""
    import os

    import pytest

    from zebrapose_tpu.train.checkpoints import is_step_dir, \
        restore_step_dir

    mgr = CheckpointManager(str(tmp_path / "ck"))
    state = _mk_state()
    state = state.replace(step=jnp.asarray(3, jnp.int32))
    mgr.save_best(state, 0.5)
    mgr.wait()

    best = os.path.join(str(tmp_path / "ck"), "best", "step_3")
    assert is_step_dir(best)
    assert not is_step_dir(str(tmp_path / "ck"))
    restored = restore_step_dir(best, _mk_state())
    np.testing.assert_allclose(
        np.asarray(restored.params["Dense_0"]["kernel"]),
        np.asarray(state.params["Dense_0"]["kernel"]))
    mgr.close()

    # the runner loader refuses an empty root loudly
    from test_trainer import TinyZebra
    from zebrapose_tpu.eval.runner import load_model_variables
    with pytest.raises(FileNotFoundError, match="Refusing"):
        load_model_variables(str(tmp_path / "nothing_here"),
                             model=TinyZebra(), variant="v2",
                             crop_size=64)
    # and accepts the step dir verbatim through the same entrypoint
    # (template built inside the loader uses the default n_bits=16)
    model16 = TinyNet()
    v16 = model16.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 3, 3)))
    s16 = create_train_state(model16, dict(v16), 1e-3)
    mgr16 = CheckpointManager(str(tmp_path / "ck16"))
    mgr16.save_best(s16, 0.25)
    mgr16.wait()
    mgr16.close()
    best16 = os.path.join(str(tmp_path / "ck16"), "best", "step_0")
    out = load_model_variables(best16, model=TinyNet(), variant="v2",
                               crop_size=3)
    np.testing.assert_allclose(
        np.asarray(out["params"]["Dense_0"]["kernel"]),
        np.asarray(s16.params["Dense_0"]["kernel"]))


def test_rolling_keep_3(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=3)
    state = _mk_state()
    for s in (1, 2, 3, 4, 5):
        mgr.save(state.replace(step=jnp.asarray(s, jnp.int32)))
    assert mgr.latest_step() == 5
    steps = sorted(mgr._mgr.all_steps())
    assert steps == [3, 4, 5]
    mgr.close()


def test_async_save_visible_after_reader_barrier(tmp_path):
    """save() is async (the disk write overlaps training); any reader
    (latest_step/restore) synchronizes first, so a just-issued save is
    always visible through the public API."""
    mgr = CheckpointManager(str(tmp_path / "ck"))
    state = _mk_state().replace(step=jnp.asarray(11, jnp.int32))
    mgr.save(state)                      # no explicit wait
    assert mgr.latest_step() == 11       # reader barrier
    restored = mgr.restore(_mk_state())
    assert int(restored.step) == 11
    mgr.close()


def test_restore_empty_returns_template(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    state = _mk_state()
    restored = mgr.restore(state)
    assert restored is state
    mgr.close()


def test_best_checkpoint_single_kept(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    state = _mk_state()
    mgr.save_best(state.replace(step=jnp.asarray(10, jnp.int32)), 0.5)
    mgr.save_best(state.replace(step=jnp.asarray(20, jnp.int32)), 0.9)
    best = mgr.restore_best(_mk_state())
    assert int(best.step) == 20
    np.testing.assert_allclose(float(best.best_score), 0.9)
    mgr.close()
