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
