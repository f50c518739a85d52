"""Headline benchmark: crops/sec/chip for the FULL on-device pipeline
480x640 raw frame -> ROI crop+resize+normalize (preprocess) -> ZebraPoseNet
v2 forward (bf16, 256^2) -> binarize -> surface-code decode -> batched
EPnP+RANSAC pose — i.e. everything the reference does per detection
(bop_dataset get_roi + test.py net forward + CNN_outputs_to_object_pose)
as ONE compiled XLA program. A model-only program (pre-cropped input,
matching the round-1 bench) is timed alongside for continuity.

The decode stage runs on a realistic COMPACT object mask (~20% fg
ellipse), not random logits: shapes are fixed either way, but the
reported workload composition should match a trained model's output.

Prints exactly one JSON line:
  {"metric", "value", "unit", "vs_baseline", ...extras}

vs_baseline is null: the reference records no throughput number
anywhere (BASELINE.md) and cannot run here, so there is nothing
measured to divide by. "value" (absolute crops/s) is the result; the
20 crops/s reference-GPU-path guess (batch-1 torch forward + per-pixel
Python decode + CPU Progressive-X RANSAC) appears only inside the
clearly-labeled "estimated_baseline" object.
"""

import json
import os
import time

import numpy as np

REFERENCE_CROPS_PER_SEC_ESTIMATE = 20.0  # estimated, NOT measured
IMG_H, IMG_W = 480, 640


def _compact_mask(batch: int, size: int = 128) -> np.ndarray:
    """Elliptical ~20% fg masks like a trained model's output (the
    round-1 bench used random logits = ~50% fg, a different RANSAC
    quality mix)."""
    yy, xx = np.mgrid[0:size, 0:size]
    masks = np.zeros((batch, size, size), np.float32)
    rng = np.random.default_rng(3)
    for i in range(batch):
        cy, cx = rng.uniform(0.4, 0.6, 2) * size
        ry, rx = rng.uniform(0.25, 0.35, 2) * size
        masks[i] = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
                    <= 1.0).astype(np.float32)
    return masks


def _time_program(fn, args, iters=10):
    """First call compiles+warms; then time. Fetching the scalar output
    forces full execution (block_until_ready is a no-op on axon)."""
    float(fn(*args)[-1])
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*args)
    float(out[-1])
    return (time.perf_counter() - t0) / iters


def _trained_mask_section(batch_size: int = 64, iters: int = 10):
    """Time the PRODUCTION eval program — the model's OWN mask-head
    output gating the decode (make_eval_step), not the synthetic
    compact masks of the headline — with a trained checkpoint on real
    rendered frames, when the full-shape rehearsal artifacts
    (scripts/rehearsal_full_shape.py: trained-to-0.74-recall ckpt +
    on-disk BOP tree) exist in this environment, OR from the COMMITTED
    compact checkpoint `trained/rehearsal3_best.npz` (bf16-stored
    params+batch_stats, forward-bit-exact — utils/compact_ckpt.py) plus
    a deterministic rebuild of the rehearsal tree, so the section is
    reproducible from a bare checkout (~2 min one-time tree render).
    Headline numbers stay on synthetic masks; this section makes the
    workload composition honest whenever a trained model is available
    (a random-weight mask head would be noise — see PERF.md)."""
    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.abspath(__file__))
    candidates = [os.environ.get("ZEBRAPOSE_TRAINED_ROOT"),
                  "/tmp/zebra_rehearsal3",
                  os.path.join(repo, "artifacts", "rehearsal3")]
    root = next((r for r in candidates if r
                 and os.path.isdir(os.path.join(r, "run", "checkpoints",
                                                "best"))
                 and os.path.isdir(os.path.join(r, "lmo", "test"))), None)
    npz_variables = npz_meta = None
    if root is None:
        # Committed compact checkpoint (params+batch_stats, bf16-stored,
        # forward-bit-exact for the bf16 model — utils/compact_ckpt.py):
        # rebuild the DETERMINISTIC rehearsal tree (seed 0 -> identical
        # val frames to the ones the ckpt's best-selection saw) and run
        # from a bare checkout even after an environment reset wiped
        # the gitignored artifacts/ dir (it did, between r4 sessions).
        npz = os.path.join(repo, "trained", "rehearsal3_best.npz")
        if os.path.exists(npz):
            try:
                import importlib.util

                from zebrapose_tpu.utils.compact_ckpt import load_compact

                root = "/tmp/zebra_rehearsal_bench"
                if not os.path.isdir(os.path.join(root, "lmo", "test")):
                    spec = importlib.util.spec_from_file_location(
                        "rehearsal_full_shape",
                        os.path.join(repo, "scripts",
                                     "rehearsal_full_shape.py"))
                    mod = importlib.util.module_from_spec(spec)
                    spec.loader.exec_module(mod)
                    mod.build_tree(root, n_train=160, n_val=120)
                npz_variables, npz_meta = load_compact(npz)
            except Exception as e:          # pragma: no cover
                return {"note": f"compact-ckpt fallback failed: {e!r}"}
    if root is None:
        return {"note": ("no trained checkpoint in this environment "
                         "(run scripts/rehearsal_full_shape.py); decode "
                         "timed on synthetic compact masks only")}
    best_dir = os.path.join(root, "run", "checkpoints", "best")
    try:
        import orbax.checkpoint as ocp

        from zebrapose_tpu.codec.lut import load_correspondence_lut
        from zebrapose_tpu.config import ZebraConfig
        from zebrapose_tpu.data import bop_io
        from zebrapose_tpu.data.pipeline import CropDatasetHost
        from zebrapose_tpu.eval.evaluate import make_eval_step
        from zebrapose_tpu.models.zebra_net import ZebraPoseNet
        from zebrapose_tpu.ops.pnp import PnPConfig

        cfg = ZebraConfig.from_dict({
            "bop_path": root, "dataset_name": "lmo",
            "test_folder": "test",
            "BoundingBox_CropSize_image": 256,
            "BoundingBox_CropSize_GT": 128,
            "divide_number_each_itration": 2,
            "number_of_itration": 16,
        })
        val = bop_io.get_dataset(root, "lmo", train=False,
                                 data_folder="test")
        ds = CropDatasetHost(
            val.dataset_dir, "test", *val.for_obj(1), is_train=False,
            crop_size_img=cfg.BoundingBox_CropSize_image,
            crop_size_gt=cfg.BoundingBox_CropSize_GT,
            padding_ratio=cfg.padding_ratio,
            resize_method=cfg.resize_method)
        lut = load_correspondence_lut(os.path.join(
            root, "lmo", "models_GT_color", "Class_CorresPoint000001.txt"))

        if npz_variables is not None:
            variables = jax.tree.map(jnp.asarray, npz_variables)
            ckpt_desc = (f"compact npz step {npz_meta.get('step')} "
                         f"best {npz_meta.get('best_score')}")
        else:
            dirs = [d for d in os.listdir(best_dir)
                    if d.startswith("step_")]
            payload = ocp.StandardCheckpointer().restore(
                os.path.join(best_dir, dirs[0]))
            variables = jax.tree.map(jnp.asarray, {
                "params": payload["params"],
                "batch_stats": payload["batch_stats"]})
            ckpt_desc = open(os.path.join(best_dir, "best_score.txt")) \
                .read().strip()

        model = ZebraPoseNet(
            binary_code_length=cfg.number_of_itration,
            base=cfg.divide_number_each_itration, variant="v2",
            resnet_layers=cfg.resnet_layer,
            concat=cfg.concat_encoder_decoder,
            output_kernel_size=cfg.output_kernel_size,
            dtype=jnp.bfloat16)
        eval_step = make_eval_step(
            lambda b, v: model.apply(v, b["image"], train=False),
            lut, crop_img=cfg.BoundingBox_CropSize_image,
            crop_gt=cfg.BoundingBox_CropSize_GT,
            base=cfg.divide_number_each_itration,
            n_bits=cfg.number_of_itration,
            resize_method=cfg.resize_method,
            loss_type=cfg.BinaryCode_Loss_Type,
            pnp_cfg=PnPConfig(n_hypotheses=128, max_points=2048),
            preprocess_gt=False)

        n = len(ds)
        idx = [i % n for i in range(batch_size)]
        raw = ds.collate(idx)
        feed = {k: jnp.asarray(raw[k]) for k in
                ("rgb", "label", "mask", "entire_mask", "roi_param",
                 "valid")}
        fb = jnp.asarray(raw["final_bbox"].astype(np.int32))
        K = jnp.asarray(raw["K"])
        key = jax.random.PRNGKey(7)

        out = eval_step(feed, fb, K, key, variables)   # compile + warm
        solved = float(np.asarray(out[2]).mean())
        # best-of-rounds: a first-ever compile in this process leaves it
        # degraded for many subsequent iterations (measured 4x on the
        # 1-core host); the fastest round is the steady-state number
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = eval_step(feed, fb, K, key, variables)
            float(jnp.sum(out[1]))                     # drain the queue
            dt = min(dt, (time.perf_counter() - t0) / iters)
        return {
            "crops_per_sec": round(batch_size / dt, 1),
            "batch": batch_size,
            "solved_frac": round(solved, 3),
            "ckpt": ckpt_desc,
            "note": ("production eval program (model's own mask head "
                     "gates the decode) on real rendered val frames "
                     "with the rehearsal-trained checkpoint")}
    except Exception as e:                      # pragma: no cover
        return {"note": f"trained-mask section failed: {e!r}"}


def _probe_device(timeout_s: float = 420.0) -> bool:
    """Fail fast if the device never answers (the axon tunnel can wedge:
    a killed client's hung program blocks the remote queue indefinitely,
    observed 2026-08-17). A tiny fetch runs in a daemon thread; if it
    does not return within the probe budget the bench reports an error
    JSON line instead of hanging the caller forever.

    Budget: 2 windows of timeout_s (14 min total). Healthy first contact
    has measured anywhere from 2 s to **310 s** on a QUIET host (backend
    init spikes; the 310 s was 2026-08-20 on an idle box — it would have
    false-failed the old 300 s window), and concurrent CPU load on this
    1-core host stretches it further — a 2x180 s budget false-failed two
    bench runs that ran alongside pytest (2026-08-20). A true wedge
    costs the full budget to report; a false "unreachable" (which also
    exits with the probe fetch in flight — itself a tunnel-wedge risk,
    CLAUDE.md) costs the round's headline number. Err patient."""
    import threading

    ok = threading.Event()

    def probe():
        import jax.numpy as jnp

        float(jnp.arange(4.0).sum())
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok.is_set():
        t.join(timeout_s)
    return ok.is_set()


def main():
    import jax
    import jax.numpy as jnp

    if not _probe_device():
        print(json.dumps({
            "metric": "full_pipeline_crops_per_sec_per_chip", "value": 0,
            "unit": "crops/s", "vs_baseline": None,
            "error": "device unreachable: a trivial fetch timed out "
                     "(axon tunnel wedged?); see CLAUDE.md",
            "last_measured": {
                "value": 1254.1, "unit": "crops/sec/chip",
                "date": "2026-08-21",
                "note": "most recent successful run of this same bench "
                        "on this chip (BENCH_r03.json / PERF.md); "
                        "reported for context only, NOT this run's "
                        "result"}}))
        return 1

    # persistent compilation cache: first-ever run pays the (tunnel-
    # dependent, multi-minute) XLA compile; subsequent runs start hot
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/zebrapose_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from zebrapose_tpu.data.pipeline import preprocess_batch
    from zebrapose_tpu.models.zebra_net import ZebraPoseNet
    from zebrapose_tpu.ops.binarize import code_from_logits
    from zebrapose_tpu.ops.pnp import PnPConfig, decode_to_pose_batch

    n_bits = 16
    rng = np.random.default_rng(0)

    model = ZebraPoseNet(binary_code_length=n_bits, variant="v2",
                         concat=True, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3), jnp.float32),
                           train=False)

    lut_points = jnp.asarray(
        rng.uniform(-40, 40, size=(2 ** n_bits, 3)).astype(np.float32))
    lut_valid = jnp.ones((2 ** n_bits,), bool)
    K = jnp.asarray(np.array([[572.4114, 0, 325.2611],
                              [0, 573.57043, 242.04899],
                              [0, 0, 1]], np.float32))
    pnp_cfg = PnPConfig(n_hypotheses=128, max_points=2048)

    def decode(out, masks, bboxes, key):
        codes = code_from_logits(out["code"].astype(jnp.float32))
        keys = jax.random.split(key, masks.shape[0])
        Ks = jnp.broadcast_to(K, (masks.shape[0], 3, 3))
        Rs, ts, ok, _ = decode_to_pose_batch(
            masks, codes, lut_points, lut_valid, bboxes, Ks, keys,
            bbox_size=128, cfg=pnp_cfg)
        # scalar reduction: fetching it forces full execution even on
        # platforms where block_until_ready is a no-op (axon tunnel)
        return Rs, ts, ok, jnp.sum(ts) + jnp.sum(ok)

    @jax.jit
    def model_only(variables, images, masks, bboxes, key):
        out = model.apply(variables, images, train=False)
        return decode(out, masks, bboxes, key)

    @jax.jit
    def full_pipeline(variables, raw, masks, bboxes, key):
        batch = preprocess_batch(raw, key, crop_img=256, crop_gt=128,
                                 is_train=False, include_gt=False)
        out = model.apply(variables, batch["image"], train=False)
        return decode(out, masks, bboxes, key)

    model_int8 = ZebraPoseNet(binary_code_length=n_bits, variant="v2",
                              concat=True, dtype=jnp.bfloat16, quant=True)

    @jax.jit
    def full_pipeline_int8(variables, raw, masks, bboxes, key):
        batch = preprocess_batch(raw, key, crop_img=256, crop_gt=128,
                                 is_train=False, include_gt=False)
        out = model_int8.apply(variables, batch["image"], train=False)
        return decode(out, masks, bboxes, key)

    results = {}
    int8_result = None
    for b in (32, 64, 128, 256):
        masks = jnp.asarray(_compact_mask(b))
        bboxes = jnp.asarray(np.tile(
            np.array([[200, 150, 128, 128]], np.int32), (b, 1)))
        key = jax.random.PRNGKey(1)

        images = jnp.asarray(
            rng.normal(size=(b, 256, 256, 3)).astype(np.float32))
        dt_model = _time_program(
            model_only, (variables, images, masks, bboxes, key))

        raw = {
            "rgb": jnp.asarray(rng.integers(
                0, 255, size=(b, IMG_H, IMG_W, 3)).astype(np.uint8)),
            "roi_param": jnp.asarray(np.tile(np.array(
                [[180, 120, 436, 376, 256]], np.int32), (b, 1))),
            "valid": jnp.ones((b,), jnp.float32),
        }
        dt_full = _time_program(
            full_pipeline, (variables, raw, masks, bboxes, key))

        results[b] = {"model_only": b / dt_model, "full": b / dt_full}

        if b == 256:   # int8 serving mode at the saturated batch only
            dt_int8 = _time_program(
                full_pipeline_int8, (variables, raw, masks, bboxes, key))
            int8_result = b / dt_int8

    best_b = max(results, key=lambda b: results[b]["full"])
    crops_per_sec = results[best_b]["full"]
    print(json.dumps({
        "metric": ("crops/sec/chip (480x640 preprocess + 256^2 enc-dec "
                   "+ decode + EPnP-RANSAC, compact masks)"),
        "value": round(crops_per_sec, 2),
        "unit": "crops/sec/chip",
        # no measured reference baseline exists (it pins no throughput
        # number and cannot run here) — vs_baseline is therefore null;
        # the 20 crops/s GPU-path ESTIMATE lives behind the label below
        "vs_baseline": None,
        "estimated_baseline": {
            "reference_crops_per_sec": REFERENCE_CROPS_PER_SEC_ESTIMATE,
            "estimated_speedup": round(
                crops_per_sec / REFERENCE_CROPS_PER_SEC_ESTIMATE, 2),
            "note": ("ESTIMATE, not a measurement: batch-1 torch "
                     "forward + per-pixel Python decode + CPU RANSAC")},
        "batch": best_b,
        "serving_stream": {
            "crops_per_sec": 57.9,
            "note": ("pipelined host-decode serving walk with "
                     "--roi_slice (host ships only the clamped bbox "
                     "bytes; bit-exact crops), measured 2026-08-18 by "
                     "scripts/serving_bench.py on this chip; 2.3x the "
                     "same-day full-frame walk (25.2), which is "
                     "tunnel-H2D-bound — see PERF.md serving section")},
        "per_batch": {str(b): {k: round(v, 1) for k, v in r.items()}
                      for b, r in results.items()},
        "int8_serving": {
            "crops_per_sec": round(int8_result, 1) if int8_result else None,
            "note": ("same full pipeline with conv compute on the int8 "
                     "MXU path (CLI --int8); accuracy gates: post---qat "
                     "int8-vs-bf16 ADD recall delta at 0.1d spans 0 to "
                     "-0.033 across three gates at two independently "
                     "trained ckpts (120-frame val, resolution 0.008; "
                     "scripts/int8_eval.py, VALIDATION.md round-4 "
                     "second-gate section)")},
        "trained_mask": _trained_mask_section(),
    }))


if __name__ == "__main__":
    raise SystemExit(main())
