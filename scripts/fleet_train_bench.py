"""Fleet TRAINING rate at K=4/chip on the real chip (round-4 VERDICT #6).

The HBM budget table (scripts/fleet_hbm_budget.py, PERF.md) says K=4
full ZebraPoseNet v2 members at b32/256^2 fit one v5e chip; the
dataset-scale training-economics claim previously rested on a 10-step
K=2 CLI drive. This measures the sustained optimizer rate of the K=4
fleet step (train/fleet.py — 1-device bypass lowers to plain vmap, see
the shard_map/axon notes there) against 4 SEQUENTIAL single-object
`train_step`s at the same per-member batch:

  fleet : 1 dispatch advancing 4 models  (one program, K models resident)
  seq   : 4 dispatches, one per model    (the reference's deployment
          shape — one process per object per GPU, train_v2.py:2-5 —
          minus the process overhead, which this bench charitably
          excludes)

Both paths run the identical `_train_step_impl` math on identical
synthetic preprocessed batches (input pipeline excluded by design: the
claim under test is step economics, not host feed). Sync protocol per
CLAUDE.md: explicit scalar fetches (block_until_ready is a no-op on
axon), queue bounded every sync_freq rounds like the production loop.

Run on the TPU:  python scripts/fleet_train_bench.py [--k 4] [--b 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--b", type=int, default=32,
                    help="per-member batch")
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=40)
    ap.add_argument("--warm", type=int, default=4)
    ap.add_argument("--sync_freq", type=int, default=10)
    ap.add_argument("--bf16", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from zebrapose_tpu.models.losses import CodeLossConfig
    from zebrapose_tpu.models.zebra_net import ZebraPoseNet
    from zebrapose_tpu.train.fleet import fleet_train_step, stack_states
    from zebrapose_tpu.train.state import create_train_state
    from zebrapose_tpu.train.train_step import train_step

    K, B, S = args.k, args.b, args.crop
    G = S // 2
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  (K={K} B={B} crop={S})",
          flush=True)

    model = ZebraPoseNet(
        binary_code_length=16, variant="v2", concat=True,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    def make_states():
        out = []
        for k in range(K):
            variables = model.init(jax.random.PRNGKey(k),
                                   jnp.zeros((1, S, S, 3), jnp.float32),
                                   train=False)
            out.append(create_train_state(model, dict(variables), 2e-4))
        return out

    def batch_for(n):
        return {
            "image": jnp.asarray(rng.normal(
                size=(n, S, S, 3)).astype(np.float32)),
            "mask": jnp.asarray((rng.random(
                (n, G, G)) > 0.5).astype(np.float32)),
            "entire_mask": jnp.asarray((rng.random(
                (n, G, G)) > 0.3).astype(np.float32)),
            "code": jnp.asarray((rng.random(
                (n, G, G, 16)) > 0.5).astype(np.float32)),
        }

    loss_cfg = CodeLossConfig()

    # ---- fleet: one dispatch / round --------------------------------
    # K=4 b32 sits at 14.89/16 GB XLA peak (fleet_hbm_budget table),
    # so the phase must not hold ANYTHING else: build, stack, free the
    # unstacked copies, and only then step. The sequential phase gets
    # its own freshly-built states afterwards.
    fleet_batch = batch_for(K * B)
    states = make_states()
    fleet_state = stack_states(states)
    del states
    t_compile = time.time()
    fleet_state, m = fleet_train_step(fleet_state, fleet_batch, K,
                                      loss_cfg)
    float(jax.device_get(m["loss_total"][0]))
    print(f"fleet compile+first step: {time.time() - t_compile:.1f}s",
          flush=True)
    for _ in range(args.warm - 1):
        fleet_state, m = fleet_train_step(fleet_state, fleet_batch, K,
                                          loss_cfg)
    float(jax.device_get(m["loss_total"][0]))
    t0 = time.time()
    for r in range(args.rounds):
        fleet_state, m = fleet_train_step(fleet_state, fleet_batch, K,
                                          loss_cfg)
        if (r + 1) % args.sync_freq == 0:
            float(jax.device_get(m["loss_total"][0]))
    float(jax.device_get(m["loss_total"][0]))
    fleet_ms = (time.time() - t0) / args.rounds * 1e3

    mem = {}
    try:
        ms_ = jax.local_devices()[0].memory_stats()
        if ms_:
            mem = {"bytes_in_use_gb": round(
                ms_.get("bytes_in_use", 0) / 2 ** 30, 2)}
    except Exception:
        pass
    del fleet_state, m, fleet_batch

    # ---- sequential: K dispatches / round ---------------------------
    seq_batches = [batch_for(B) for _ in range(K)]
    states = make_states()
    t_compile = time.time()
    out0 = train_step(states[0], seq_batches[0], loss_cfg)
    states[0], m0 = out0
    float(jax.device_get(m0["loss_total"]))
    print(f"seq compile+first step: {time.time() - t_compile:.1f}s",
          flush=True)
    for _ in range(args.warm - 1):
        for k in range(K):
            states[k], mk = train_step(states[k], seq_batches[k],
                                       loss_cfg)
    float(jax.device_get(mk["loss_total"]))
    t0 = time.time()
    for r in range(args.rounds):
        for k in range(K):
            states[k], mk = train_step(states[k], seq_batches[k],
                                       loss_cfg)
        if (r + 1) % args.sync_freq == 0:
            float(jax.device_get(mk["loss_total"]))
    float(jax.device_get(mk["loss_total"]))
    seq_ms = (time.time() - t0) / args.rounds * 1e3

    crops_fleet = K * B / fleet_ms * 1e3
    crops_seq = K * B / seq_ms * 1e3
    report = {
        "k": K, "b_per_member": B, "crop": S,
        "fleet_ms_per_round": round(fleet_ms, 1),
        "seq_ms_per_round": round(seq_ms, 1),
        "fleet_crops_s": round(crops_fleet, 0),
        "seq_crops_s": round(crops_seq, 0),
        "fleet_over_seq": round(crops_fleet / crops_seq, 3),
        "crops_s_per_member_fleet": round(crops_fleet / K, 0),
        "hbm_after_fleet": mem,
        "date": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(report, indent=2), flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reports", "fleet_train_k4.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
