"""Fleet HBM budget at dataset scale (round-3 VERDICT next #6).

ZebraPose is one-model-per-object, so a BOP dataset is a FLEET: lmo=15,
ycbv=21, tless=30 objects. This script answers "how many objects fit on
one chip / one 8-chip v5e slice" two ways:

1. ANALYTIC: bytes per fleet member at b32 — params + Adam(m,v) +
   batch_stats + histogram (all f32) from real shape_dtype trees, plus
   the activation working set implied by the train step.
2. COMPILED (when a TPU is reachable): AOT-lower `fleet_train_step`
   for K members on one chip and read XLA's own memory_analysis()
   (argument + output + temp + peak), the number the real allocator
   enforces.

Run:  python scripts/fleet_hbm_budget.py [--analytic-only] [--k 1 2 4]
Writes a markdown table to stdout and /tmp/fleet_hbm.md.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

GB = 1 << 30
V5E_HBM_GB = 16.0  # v5e: 16 GB HBM per chip


def tree_bytes(tree):
    import jax

    return sum(np.prod(l.shape) * l.dtype.itemsize
               for l in jax.tree.leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--analytic-only", action="store_true")
    ap.add_argument("--k", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--crop", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zebrapose_tpu.models.losses import CodeLossConfig
    from zebrapose_tpu.models.zebra_net import ZebraPoseNet
    from zebrapose_tpu.train.fleet import fleet_train_step, stack_states
    from zebrapose_tpu.train.state import create_train_state

    crop, gt = args.crop, args.crop // 2
    model = ZebraPoseNet(binary_code_length=16, base=2, variant="v2",
                         resnet_layers=34, dtype=jnp.bfloat16)

    def init_state(seed):
        variables = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, crop, crop, 3)),
                                 train=False),
            jax.random.PRNGKey(seed))
        # materialize cheaply: zeros with the right shapes/dtypes
        variables = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), variables)
        return create_train_state(model, dict(variables), 2e-4)

    s = init_state(0)
    per = {
        "params": tree_bytes(s.params),
        "adam(m,v)": tree_bytes(s.opt_state),
        "batch_stats": tree_bytes(s.batch_stats),
    }
    member_mb = sum(per.values()) / (1 << 20)
    b = args.batch
    feed_mb = (b * crop * crop * 3 * 4            # image f32
               + b * gt * gt * (16 + 2) * 4) / (1 << 20)  # code+masks
    print(f"per-member state: {member_mb:.1f} MB "
          f"({', '.join(f'{k} {v / (1 << 20):.1f}' for k, v in per.items())})")
    print(f"per-member batch feed at b{b}: {feed_mb:.1f} MB")

    lines = [f"| K/chip | state MB | feed MB | XLA peak GB (b{b}) | "
             f"fits v5e 16G? |", "|---|---|---|---|---|"]

    peaks = {}
    if not args.analytic_only:
        loss_cfg = CodeLossConfig(loss_type="BCE", mask_code_loss=False,
                                  use_histogram_weighting=True, base=2,
                                  n_bits=16)
        for k in args.k:
            states = stack_states([init_state(i) for i in range(k)])
            batch = {
                "image": jnp.zeros((k * b, crop, crop, 3), jnp.float32),
                "mask": jnp.zeros((k * b, gt, gt), jnp.float32),
                "entire_mask": jnp.zeros((k * b, gt, gt), jnp.float32),
                "code": jnp.zeros((k * b, gt, gt, 16), jnp.float32),
            }
            lowered = jax.jit(
                lambda st, bt: fleet_train_step(
                    st, bt, n_models=k, loss_cfg=loss_cfg),
                donate_argnums=(0,)).lower(states, batch)
            compiled = lowered.compile()
            m = compiled.memory_analysis()
            peak = None
            for attr in ("temp_size_in_bytes",):
                if hasattr(m, attr):
                    peak = (m.temp_size_in_bytes
                            + m.argument_size_in_bytes
                            + m.output_size_in_bytes
                            - getattr(m, "alias_size_in_bytes", 0))
            peaks[k] = peak
            print(f"K={k}: memory_analysis: {m}")

    for k in args.k:
        state_mb = member_mb * k
        fmb = feed_mb * k
        pk = peaks.get(k)
        pk_s = f"{pk / GB:.2f}" if pk else "n/a"
        fits = "yes" if (pk or 0) / GB < V5E_HBM_GB else \
            ("?" if pk is None else "NO")
        lines.append(f"| {k} | {state_mb:.0f} | {fmb:.0f} | {pk_s} | "
                     f"{fits} |")

    # dataset-scale summary rows: ceil(K/8) per chip on an 8-chip slice
    for name, K in (("lmo", 15), ("ycbv", 21), ("tless", 30)):
        per_chip = -(-K // 8)
        lines.append(
            f"| {name}: K={K} on 8 chips -> {per_chip}/chip "
            f"(pad {(-K) % 8}) | {member_mb * per_chip:.0f} | "
            f"{feed_mb * per_chip:.0f} | see K={per_chip} | |")

    table = "\n".join(lines)
    with open("/tmp/fleet_hbm.md", "w") as f:
        f.write(table + "\n")
    print("\n" + table)


if __name__ == "__main__":
    main()
