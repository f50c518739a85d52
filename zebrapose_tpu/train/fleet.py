"""Per-object fleet training — K object models, ONE program, one process.

ZebraPose trains one network per object; the reference parallelizes over
objects by hand, one python process per GPU via CUDA_VISIBLE_DEVICES
(reference train_v2.py:2-5) plus a shell notebook of per-object launches
(reference my_working_record:58-66). The TPU-native equivalent is a
single-controller fleet: every per-object TrainState is stacked along a
leading fleet axis, that axis is sharded over a 1-D device mesh, and ONE
jitted step advances all objects simultaneously — a `shard_map` over the
model axis with a local vmap inside, so each device trains its own
objects' models and the program is collective-free by construction
(check_vma proves nothing crosses ICI). An 8-chip slice trains 8
objects at single-chip speed with one host process instead of eight
interpreters, one compile instead of eight, and one dispatch per step
for the whole fleet (on a 30 ms-RTT tunnel the per-step dispatch alone
is worth more than the compute).

Semantics per object are EXACTLY train_v2's single-GPU recipe: BatchNorm
batches, histogram-EMA, Adam schedule and best-checkpoint selection are
all per-object (vmapped), not fleet-global — no lr/iteration world
scaling applies (that recipe is for data parallelism WITHIN one object,
train_v5.py:82-91).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zebrapose_tpu.models.losses import CodeLossConfig
from zebrapose_tpu.train.state import TrainState
from zebrapose_tpu.train.train_step import _train_step_impl

MODEL_AXIS = "model"

_STATE_FIELDS = ("step", "params", "batch_stats", "opt_state",
                 "histogram", "best_score")


def make_fleet_mesh(devices=None) -> Mesh:
    """1-D mesh whose axis carries per-object models, not batch rows."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (MODEL_AXIS,))


def fleet_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(MODEL_AXIS))


def stack_states(states: List[TrainState],
                 pad_to: Optional[int] = None) -> TrainState:
    """Stack K per-object states into one fleet state (leading axis K).

    All states must share the architecture and optimizer (apply_fn/tx are
    taken from the first; they are static pytree fields so they cannot be
    stacked). Restored members may sit at different steps — `fit_fleet`
    requires them equal so the shared loop counter means the same thing
    for every object.

    `pad_to`: pad the fleet axis to this length by repeating the last
    state — dataset-scale fleets rarely divide the mesh (lmo's 15 or
    tless's 30 objects on 8 chips), and padding one ghost row wastes
    1/K of the vmapped compute vs. idling whole devices on a sub-mesh.
    Ghost rows are never checkpointed or reported (fit_fleet slices them
    off)."""
    if pad_to is not None and pad_to > len(states):
        states = list(states) + [states[-1]] * (pad_to - len(states))
    t = states[0]
    stacked = {
        f: jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[getattr(s, f) for s in states])
        for f in _STATE_FIELDS}
    return t.replace(**stacked)


def index_state(fleet_state: TrainState, i: int) -> TrainState:
    """Slice object i's state back out (device-side gather of one row)."""
    return fleet_state.replace(**{
        f: jax.tree.map(lambda x: x[i], getattr(fleet_state, f))
        for f in _STATE_FIELDS})


def shard_fleet_state(mesh: Mesh, fleet_state: TrainState) -> TrainState:
    """Place every stacked leaf with its fleet axis over the mesh."""
    n = int(jax.tree.leaves(fleet_state.params)[0].shape[0])
    if n % mesh.devices.size:
        raise ValueError(
            f"fleet size {n} not divisible by mesh size "
            f"{mesh.devices.size}; train K%D==0 objects or pass a "
            f"sub-mesh (make_fleet_mesh(jax.devices()[:K]))")
    sh = fleet_sharding(mesh)
    return fleet_state.replace(**{
        f: jax.tree.map(lambda x: jax.device_put(x, sh),
                        getattr(fleet_state, f))
        for f in _STATE_FIELDS})


@partial(jax.jit, static_argnames=("n_models", "loss_cfg",
                                   "binary_loss_weight",
                                   "predict_entire_mask", "mesh"),
         donate_argnames=("state",))
def fleet_train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                     n_models: int,
                     loss_cfg: CodeLossConfig,
                     binary_loss_weight: float = 3.0,
                     predict_entire_mask: bool = True,
                     mesh: Optional[Mesh] = None
                     ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One step for every object in the fleet.

    `batch` leaves are FLAT [K*B, ...] in object-major order (object k
    owns rows [k*B, (k+1)*B)) so the fleet can reuse the standard
    `preprocess_batch` program unchanged. Returns the updated fleet
    state and per-object metrics (every value is [K]).

    With a mesh, the step is a `shard_map` over the model axis with a
    local vmap inside: each device advances its own K/D whole objects
    and the program is collective-free BY CONSTRUCTION (check_vma
    verifies nothing crosses ICI). GSPMD cannot be trusted with the
    alternative — vmap-over-models lowers convolutions to
    feature_group_count=K grouped convs, and the partitioner fails to
    split those along the group axis (seen: 'output feature dimension
    not divisible by feature_group_count' on an 8-device mesh).
    Without a mesh — or on a 1-device mesh, where sharding is a no-op —
    a plain vmap. (The 1-device bypass also matters operationally: on
    the experimental single-chip `axon` platform shard_map hangs even
    for an identity program, measured 2026-08-17.)"""
    per_obj = batch[next(iter(batch))].shape[0] // n_models

    def local(s, bt):
        bt = jax.tree.map(
            lambda x: x.reshape((-1, per_obj) + x.shape[1:]), bt)

        def one(si, bi):
            return _train_step_impl(si, bi, loss_cfg, binary_loss_weight,
                                    predict_entire_mask)

        return jax.vmap(one)(s, bt)

    if mesh is None or mesh.devices.size == 1:
        return local(state, batch)
    spec = P(MODEL_AXIS)
    return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec),
                         out_specs=(spec, spec))(state, batch)


@dataclasses.dataclass
class FleetResources:
    """K single-object TrainResources driven by one fleet program.

    Members must share every shape-determining config (crop sizes, code
    depth, architecture); datasets/LUTs/meshes/checkpoint dirs are
    per-object. `n_pad` ghost rows (copies of the last member) pad the
    fleet axis up to a multiple of the mesh size; they train on
    duplicated data and are never checkpointed or reported."""
    members: list  # List[TrainResources]
    mesh: Mesh
    state: TrainState  # stacked + sharded fleet state (K + n_pad rows)
    n_pad: int = 0


def build_fleet_setup(cfg, obj_names: List[str], output_dir: str,
                      mesh: Optional[Mesh] = None,
                      **member_kwargs) -> FleetResources:
    """Assemble a fleet from one config and K object names.

    Each member is built by the standard `build_train_setup` against a
    1-device mesh so the DDP world-scaling recipe (lr x world,
    iters / world) does NOT apply — fleet parallelism is across objects,
    each object trains at the reference's single-GPU recipe. Member
    checkpoints/logs land in <output_dir>/<obj_name>/."""
    import os

    from zebrapose_tpu.parallel.mesh import make_mesh
    from zebrapose_tpu.train.trainer import build_train_setup

    if mesh is None:
        mesh = make_fleet_mesh()
    # members are built against a standard 1-device data mesh: world=1,
    # so the DDP lr/iteration scaling recipe stays off (see module doc)
    one_dev = make_mesh(jax.devices()[:1])
    members = [
        build_train_setup(cfg, name, os.path.join(output_dir, name),
                          mesh=one_dev, **member_kwargs)
        for name in obj_names]
    shapes = {(m.cfg.BoundingBox_CropSize_image,
               m.cfg.BoundingBox_CropSize_GT, m.cfg.number_of_itration,
               m.cfg.divide_number_each_itration, m.cfg.batch_size)
              for m in members}
    if len(shapes) > 1:
        raise ValueError(f"fleet members disagree on shapes: {shapes}")
    pad = (-len(members)) % mesh.devices.size
    state = shard_fleet_state(mesh, stack_states(
        [m.state for m in members], pad_to=len(members) + pad))
    return FleetResources(members=members, mesh=mesh, state=state,
                          n_pad=pad)


def _fleet_validate(members, state: TrainState, fleet_eval,
                    key, n_pad: int = 0) -> List[Dict[str, float]]:
    """Pose validation for the whole fleet: the K val splits stream
    through the fleet eval program in lockstep (fleet_serve.fleet_infer),
    the stacked train-state params/batch_stats feed the vmapped forward
    directly, and each member gets the standard ADD/ADD-S metric dict
    (trainer.fit's validation contract, train_v2.py:287-344). Ghost rows
    (n_pad) re-walk the last member's val split and are discarded."""
    from zebrapose_tpu.eval.evaluate import pose_errors, summarize
    from zebrapose_tpu.eval.fleet_serve import fleet_infer

    variables = {"params": state.params,
                 "batch_stats": state.batch_stats}
    datasets = [m.val_dataset for m in members] + \
        [members[-1].val_dataset] * n_pad
    Rs, ts, ok = fleet_infer(
        datasets, fleet_eval, variables,
        min(m.val_batch_size for m in members), key)
    out = []
    for i, m in enumerate(members):
        for j in range(len(m.val_dataset)):
            if not ok[i][j]:
                Rs[i][j] = np.eye(3)
                ts[i][j] = 0
        errors = pose_errors(m.val_dataset, Rs[i], ts[i], ok[i],
                             m.vertices, m.symmetric)
        out.append(summarize(errors, m.diameter,
                             "ADD-S" if m.symmetric else "ADD"))
    return out


def fit_fleet(fleet: FleetResources, log_freq: int = 1000,
              validate: bool = True,
              max_steps: Optional[int] = None) -> List[float]:
    """Train every object simultaneously; returns per-object best recall.

    The loop mirrors `trainer.fit`'s cadence (log + rolling checkpoint +
    pose validation + best-ckpt per object every `log_freq` steps,
    train_v2.py:287-344) but advances all K objects with one
    `fleet_train_step` per iteration."""
    from zebrapose_tpu.data.pipeline import preprocess_batch
    from zebrapose_tpu.train.trainer import _loss_cfg

    members = fleet.members
    if any(m.device_cache is not None for m in members):
        raise ValueError(
            "fleet training drives the streaming input path; build "
            "members with device_cache=False")
    k = len(members)
    cfg = members[0].cfg
    loss_cfg = _loss_cfg(cfg)
    state = fleet.state

    starts = {int(s) for s in np.asarray(jax.device_get(state.step))}
    if len(starts) > 1:
        raise ValueError(
            f"fleet members restored at different steps {sorted(starts)}; "
            "resume them to a common step (or train separately)")
    start_step = starts.pop()
    total = min(m.total_iterations for m in members)
    end_step = total if max_steps is None else \
        min(start_step + max_steps, total)

    # Validation runs through the FLEET eval program too: one vmapped
    # forward over all objects' val crops + per-object decode, consuming
    # the stacked train state directly (no per-member slicing, K x fewer
    # dispatches than sequential single-object validations).
    fleet_eval = None
    if validate and all(m.val_dataset is not None for m in members):
        from zebrapose_tpu.eval.fleet_serve import (make_fleet_eval_step,
                                                    stack_luts)

        if len({m.pnp_cfg for m in members}) > 1:
            raise ValueError("fleet members disagree on pnp_cfg")
        lp, lv = stack_luts([m.lut for m in members]
                            + [members[-1].lut] * fleet.n_pad)
        fleet_eval = make_fleet_eval_step(
            lambda b, v: members[0].model.apply(v, b["image"],
                                                train=False),
            lp, lv, crop_img=cfg.BoundingBox_CropSize_image,
            crop_gt=cfg.BoundingBox_CropSize_GT,
            base=cfg.divide_number_each_itration,
            n_bits=cfg.number_of_itration,
            resize_method=cfg.resize_method,
            loss_type=cfg.BinaryCode_Loss_Type,
            pnp_cfg=members[0].pnp_cfg, mesh=fleet.mesh)

    sh = fleet_sharding(fleet.mesh)
    key = jax.random.PRNGKey(0)
    best = [float(x) for x in
            np.asarray(jax.device_get(state.best_score))[:k]]
    feed_keys = ("rgb", "label", "mask", "entire_mask", "roi_param",
                 "valid")
    try:
        for it in range(start_step, end_step):
            raws = [next(m.train_iter) for m in members]
            if fleet.n_pad:      # ghost rows re-train on the last
                raws += [raws[-1]] * fleet.n_pad  # member's batch
            feed = {kk: jax.device_put(
                        np.concatenate([np.asarray(r[kk]) for r in raws]),
                        sh)
                    for kk in feed_keys}
            batch = preprocess_batch(
                feed, jax.random.fold_in(key, it),
                crop_img=cfg.BoundingBox_CropSize_image,
                crop_gt=cfg.BoundingBox_CropSize_GT,
                base=cfg.divide_number_each_itration,
                n_bits=cfg.number_of_itration, is_train=True,
                resize_method=cfg.resize_method,
                use_pepper_salt=cfg.use_peper_salt,
                use_motion_blur=cfg.use_motion_blur)
            state, metrics = fleet_train_step(
                state, batch, n_models=k + fleet.n_pad, loss_cfg=loss_cfg,
                binary_loss_weight=float(cfg.binary_loss_weight),
                predict_entire_mask=cfg.predict_entire_mask,
                mesh=fleet.mesh)

            if (it + 1) % 50 == 0:
                # drain the dispatch queue (axon: fetching is the only
                # sync; queued executions pin their host input buffers)
                float(jax.device_get(metrics["loss_total"][0]))

            if (it + 1) % log_freq == 0 or it + 1 == end_step:
                vals = {kk: np.asarray(jax.device_get(v))
                        for kk, v in metrics.items()}
                hist = np.asarray(jax.device_get(state.histogram))
                for i, m in enumerate(members):
                    scalars = {kk: float(v[i]) for kk, v in vals.items()}
                    scalars.update({f"bit_err_{j}": float(h)
                                    for j, h in enumerate(hist[i])})
                    m.logger.log(it + 1, scalars, prefix="train/")
                    m.ckpt.save(index_state(state, i))
                if fleet_eval is not None:
                    val_metrics = _fleet_validate(
                        members, state, fleet_eval,
                        # distinct stream from the train-step keys
                        jax.random.fold_in(key, (1 << 31) + it),
                        n_pad=fleet.n_pad)
                    for i, m in enumerate(members):
                        prefix = "ADD-S" if m.symmetric else "ADD"
                        recall = val_metrics[i][f"{prefix}_recall_0.1d"]
                        m.logger.log(it + 1, val_metrics[i],
                                     prefix="val/")
                        if recall > best[i]:
                            best[i] = recall
                            m.ckpt.save_best(
                                index_state(state, i).replace(
                                    best_score=jnp.full((), best[i],
                                                        jnp.float32)),
                                best[i])
                    # fold the new bests back into the stacked state so
                    # the NEXT rolling checkpoints persist them (ghost
                    # rows carry the last member's value, never saved)
                    state = state.replace(best_score=jax.device_put(
                        np.asarray(best + [best[-1]] * fleet.n_pad,
                                   np.float32), sh))
    finally:
        for m in members:
            m.train_iter.close()
            m.ckpt.wait()   # drain async saves before the process exits
    return best
