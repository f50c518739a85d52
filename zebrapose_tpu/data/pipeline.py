"""Host dataset + on-device preprocessing pipeline.

Division of labor (vs the reference's CPU DataLoader workers doing imread,
imgaug, 4 cv2 warps and Python bit-decoding per sample,
`bop_dataset_pytorch.py:387-497`):

  * HOST (this file's `CropDatasetHost`): byte I/O only — cv2.imread of
    rgb / GT label / masks, integer bbox bookkeeping (pad / jitter /
    square / final), nothing per-pixel.
  * DEVICE (`preprocess_batch`, one jitted program): crop+resize of all
    four tensors (linear for rgb, nearest for GT/masks), GDR-Net color
    augmentation, ImageNet normalization, label RGB -> class id -> code
    planes. vmapped over the batch and fused by XLA.

Channel-order quirk preserved on purpose: the reference loads BGR with
cv2 and normalizes it with RGB ImageNet stats without swapping
(PIL .convert('RGB') on an ndarray is a no-op) — trained checkpoints
expect BGR-ordered channels, so we keep BGR end to end.
"""

from __future__ import annotations

import os
import queue
import threading
from functools import partial
from typing import Dict, Optional, Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from zebrapose_tpu.codec.surface_code import (
    class_id_to_code,
    rgb_to_class_id,
)
from zebrapose_tpu.models.zebra_net import normalize_image
from zebrapose_tpu.ops.augment import augment_batch
from zebrapose_tpu.ops.roi import (
    augment_bbox,
    extract_roi_affine,
    extract_roi_clipped,
    extract_roi_square,
    final_bbox,
    padding_bbox,
    square_bbox,
    warp_affine_params,
)


# ---------------------------------------------------------------------------
# Device-side preprocessing
# ---------------------------------------------------------------------------

def _roi(imgs, param, crop, method, interpolation):
    if method == "crop_square_resize":
        fn = lambda im, p: extract_roi_square(im, p, crop, interpolation)
    elif method == "crop_resize":
        fn = lambda im, p: extract_roi_clipped(im, p, crop, interpolation)
    elif method == "crop_resize_by_warp_affine":
        fn = lambda im, p: extract_roi_affine(im, p, crop, interpolation)
    else:
        raise NotImplementedError(method)
    return jax.vmap(fn)(imgs, param)


@partial(jax.jit, static_argnames=("crop_img", "crop_gt", "base", "n_bits",
                                   "is_train", "resize_method",
                                   "use_pepper_salt", "use_motion_blur",
                                   "include_gt"))
def preprocess_batch(raw: Dict[str, jnp.ndarray], key: jax.Array,
                     crop_img: int = 256, crop_gt: int = 128,
                     base: int = 2, n_bits: int = 16,
                     is_train: bool = True,
                     resize_method: str = "crop_square_resize",
                     use_pepper_salt: bool = False,
                     use_motion_blur: bool = False,
                     include_gt: bool = True
                     ) -> Dict[str, jnp.ndarray]:
    """raw: {"rgb" [N,H,W,3]u8 BGR, "label" [N,H,W,3]u8,
    "mask" [N,H,W]u8, "entire_mask" [N,H,W]u8, "roi_param"
    ([N,5]i32 square | [N,4]i32 clipped | [N,3]f32 affine),
    "valid" [N]f32 (0 for dummy/no-detection samples)}.

    Returns the model batch {"image", "mask", "entire_mask", "code"}.
    include_gt=False skips the label/mask crops entirely (test-time
    inference needs only "image"; the label-id decode + three nearest
    crops are pure waste there).
    """
    rgb = raw["rgb"].astype(jnp.float32)
    p = raw["roi_param"]
    roi_rgb = _roi(rgb, p, crop_img, resize_method, "linear")
    if is_train:
        roi_rgb = augment_batch(roi_rgb, key, use_pepper_salt,
                                use_motion_blur)
    image = normalize_image(roi_rgb / 255.0)

    valid = raw["valid"][:, None, None]
    if not include_gt:
        return {"image": image * valid[..., None]}

    label = raw["label"].astype(jnp.float32)
    roi_label = _roi(label, p, crop_gt, resize_method, "nearest")
    ids = rgb_to_class_id(jnp.round(roi_label).astype(jnp.int32))
    code = class_id_to_code(ids, base=base, n_digits=n_bits)

    def _mask_roi(m):
        r = _roi(m.astype(jnp.float32)[..., None], p, crop_gt,
                 resize_method, "nearest")
        return r[..., 0] / 255.0

    mask = _mask_roi(raw["mask"])
    entire = _mask_roi(raw["entire_mask"])

    return {
        "image": image * valid[..., None],
        "mask": mask * valid,
        "entire_mask": entire * valid,
        "code": code * valid[..., None],
    }


# ---------------------------------------------------------------------------
# Host dataset
# ---------------------------------------------------------------------------

class CropDatasetHost:
    """Host-side sample provider for one object.

    Mirrors bop_dataset_single_obj_pytorch(_v2) inputs/contract but emits
    raw full-resolution arrays + bbox params; the crop itself happens on
    device. `gt_dir_suffix` selects `<split>_GT` (v1 labels) vs
    `<split>_GT_v2` (symmetry-canonicalized labels).
    """

    def __init__(self, dataset_dir: str, data_folder: str,
                 rgb_files: Sequence[str],
                 mask_files: Sequence[Sequence[str]],
                 mask_visib_files: Sequence[Sequence[str]],
                 gts: Sequence[Optional[dict]],
                 gt_infos: Sequence[Optional[dict]],
                 cam_params: Sequence[dict],
                 is_train: bool,
                 crop_size_img: int = 256, crop_size_gt: int = 128,
                 padding_ratio: float = 1.5,
                 resize_method: str = "crop_square_resize",
                 gt_dir_suffix: str = "_GT_v2",
                 detect_bboxes: Optional[Sequence] = None,
                 detect_segmentations: Optional[Sequence] = None,
                 seed: int = 0,
                 cache_images: bool = False,
                 roi_slice: bool = False):
        self.dataset_dir = dataset_dir
        self.data_folder = data_folder
        self.rgb_files = list(rgb_files)
        self.mask_files = list(mask_files)
        self.mask_visib_files = list(mask_visib_files)
        self.gts = list(gts)
        self.gt_infos = list(gt_infos)
        self.cam_params = list(cam_params)
        self.is_train = is_train
        self.crop_size_img = crop_size_img
        self.crop_size_gt = crop_size_gt
        self.padding_ratio = padding_ratio
        self.resize_method = resize_method
        self.gt_dir_suffix = gt_dir_suffix
        self.detect_bboxes = detect_bboxes
        self.detect_segmentations = detect_segmentations
        self.rng = np.random.default_rng(seed)
        self._rng_lock = threading.Lock()
        # Opt-in decoded-image RAM cache: PNG decode dominates host
        # collate (329 ms/b32 at 480x640 on a 1-core host, vs a 105 ms
        # device step). Only enable when the split fits in RAM — ~2.4 MB
        # per 480x640 sample (rgb + label + 2 masks).
        self._cache: Optional[dict] = {} if cache_images else None
        self._cache_lock = threading.Lock()
        # Opt-in serving mode: ship only the ROI bytes to the device.
        # The host slices each frame's clamped square-bbox region into a
        # dataset-wide zero-padded buffer (pure byte copy + integer bbox
        # math — still no host pixel arithmetic) and shifts roi_param by
        # the slice origin. extract_roi_square's zero-read/validity
        # semantics make the resampled crop BIT-IDENTICAL to the
        # full-frame path (tests/test_roi_slice.py), while H2D traffic
        # drops from the full frame to ~the padded bbox (2-3x on 480x640
        # BOP scenes — the bottleneck of tunnel/low-bandwidth serving,
        # scripts/serving_bench.py).
        self.roi_slice = False
        self._slice_hw: Optional[tuple] = None
        self._forced_slice_hw: Optional[tuple] = None
        if roi_slice:
            self.enable_roi_slice()

    def __len__(self):
        return len(self.rgb_files)

    def _imread(self, path: str, flags: int = cv2.IMREAD_COLOR):
        if self._cache is None:
            return cv2.imread(path, flags)
        key = (path, flags)
        with self._cache_lock:
            hit = self._cache.get(key)
        if hit is not None:
            return hit
        img = cv2.imread(path, flags)
        if img is not None:
            with self._cache_lock:
                self._cache[key] = img
        return img

    def _gt_label_path(self, idx: int) -> str:
        rgb_fn = self.rgb_files[idx]
        scene_id = rgb_fn.split("/")[-3]
        name = os.path.basename(self.mask_visib_files[idx][0])
        return os.path.join(self.dataset_dir,
                            self.data_folder + self.gt_dir_suffix,
                            scene_id, name)

    def _roi_param(self, bbox, im_shape):
        """Integer/float bbox bookkeeping -> device roi param + final bbox."""
        h, w = im_shape[:2]
        if self.resize_method == "crop_square_resize":
            x1, y1, x2, y2, side = square_bbox(bbox)
            param = np.array([x1, y1, x2, y2, max(side, 1)], np.int32)
        elif self.resize_method == "crop_resize":
            fb = final_bbox(bbox, "crop_resize", w, h)
            param = np.array([fb[0], fb[1], max(fb[2], 1),
                              max(fb[3], 1)], np.int32)
        else:  # crop_resize_by_warp_affine
            cx, cy, scale = warp_affine_params(bbox, (h, w))
            param = np.array([cx, cy, max(scale, 1e-3)], np.float32)
        fb = final_bbox(bbox, self.resize_method, w, h)
        return param, fb.astype(np.int64)

    def get_pixels(self, idx: int) -> Dict[str, np.ndarray]:
        """Per-sample pixel data only (deterministic across calls —
        everything draw-dependent lives in get_params)."""
        rgb = self._imread(self.rgb_files[idx])
        if rgb is None:
            raise FileNotFoundError(self.rgb_files[idx])
        if rgb.ndim == 2:  # itodd gray
            rgb = np.stack([rgb] * 3, axis=-1)
        h, w = rgb.shape[:2]

        def _read_mask(path):
            m = self._imread(path, cv2.IMREAD_GRAYSCALE) \
                if path and os.path.exists(path) else None
            return m if m is not None else np.zeros((h, w), np.uint8)

        mask = _read_mask(self.mask_visib_files[idx][0])
        if (not self.is_train and self.detect_segmentations is not None
                and self.detect_segmentations[idx] is not None):
            # Mask-RCNN variant: detector RLE replaces the visible mask
            # at test time (bop_dataset_pytorch_mask_rcnn.py:270-287)
            from zebrapose_tpu.data.detections import decode_rle
            mask = decode_rle(self.detect_segmentations[idx]) * 255
        entire = _read_mask(self.mask_files[idx][0])
        gt_path = self._gt_label_path(idx)
        # exists-check first: GT-less entries (vivo/challenge) have empty
        # mask names -> a directory path here; cv2 warns loudly on those
        label = self._imread(gt_path) \
            if gt_path and os.path.isfile(gt_path) else None
        if label is None:
            label = np.zeros((h, w, 3), np.uint8)
        return {"rgb": rgb, "label": label, "mask": mask,
                "entire_mask": entire}

    def _eval_bbox(self, idx: int):
        """Deterministic test-time bbox (detection or GT) + padding.
        Factored out so the roi_slice buffer scan applies the exact
        bbox semantics get_params does."""
        valid = 1.0
        if self.detect_bboxes is not None:
            det = self.detect_bboxes[idx]
            if det is None:
                det = np.array([0, 0, 1, 1])
                valid = 0.0
            bbox = np.asarray(det)
        else:
            bbox = np.asarray(self.gt_infos[idx]["bbox_visib"])
        if np.all(np.isclose(bbox, -1)):
            bbox = np.array([0, 0, 1, 1])
            valid = 0.0
        return padding_bbox(bbox, self.padding_ratio), valid

    def get_params(self, idx: int,
                   im_shape: tuple) -> Dict[str, np.ndarray]:
        """Per-draw bookkeeping: pose/K plus the (train: freshly
        jittered) bbox -> roi param + final bbox. No pixel access."""
        gt = self.gts[idx]
        if gt is not None:
            R = np.asarray(gt["cam_R_m2c"], np.float64).reshape(3, 3)
            t = np.asarray(gt["cam_t_m2c"], np.float64).reshape(3)
        else:
            R = np.eye(3)
            t = np.zeros(3)
        K = np.asarray(self.cam_params[idx]["cam_K"],
                       np.float64).reshape(3, 3)

        if self.is_train:
            valid = 1.0
            bbox = np.asarray(self.gt_infos[idx]["bbox_visib"])
            # per-sample generator: get_raw runs on a thread pool and
            # numpy Generators are not thread-safe
            with self._rng_lock:
                sample_seed = int(self.rng.integers(0, 2 ** 63))
            bbox = augment_bbox(bbox, self.padding_ratio,
                                np.random.default_rng(sample_seed))
        else:
            bbox, valid = self._eval_bbox(idx)

        param, fb = self._roi_param(bbox, im_shape)
        return {"roi_param": param, "final_bbox": fb,
                "R": R.astype(np.float32), "t": t.astype(np.float32),
                "K": K.astype(np.float32), "valid": np.float32(valid)}

    def _slice_buffer_hw(self, im_h: int, im_w: int):
        """Dataset-wide static buffer dims for roi_slice: the max padded
        square side over every sample's deterministic eval bbox, rounded
        up to a multiple of 16 and capped at the frame dims (one shape
        -> one compiled executable per run). Cached; frames of differing
        sizes within one dataset are rejected (would need per-shape
        executables)."""
        if self._slice_hw is not None:
            hw, cap = self._slice_hw
            if cap != (im_h, im_w):
                raise ValueError(
                    f"roi_slice: mixed frame sizes in one dataset "
                    f"({cap} vs {(im_h, im_w)})")
            return hw
        max_side = 1
        for i in range(len(self)):
            bbox, _ = self._eval_bbox(i)
            max_side = max(max_side, int(square_bbox(bbox)[4]))
        side = -(-max_side // 16) * 16
        hw = (min(side, im_h), min(side, im_w))
        if self._forced_slice_hw is not None:
            fh, fw = self._forced_slice_hw
            if fh < hw[0] or fw < hw[1]:
                raise ValueError(
                    f"forced roi_slice buffer {self._forced_slice_hw} is "
                    f"smaller than this dataset needs ({hw}) — real "
                    f"pixels would be dropped")
            hw = (min(fh, im_h), min(fw, im_w))
        self._slice_hw = (hw, (im_h, im_w))
        return hw

    def natural_slice_hw(self) -> tuple:
        """The buffer dims this dataset would use on its own (reads one
        frame for the cap). Fleet serving takes the elementwise max over
        K objects' naturals and imposes it via set_slice_hw so the
        stacked lockstep batches share one shape."""
        img = self._imread(self.rgb_files[0])
        saved, self._slice_hw = self._slice_hw, None
        forced, self._forced_slice_hw = self._forced_slice_hw, None
        try:
            return self._slice_buffer_hw(img.shape[0], img.shape[1])
        finally:
            self._slice_hw, self._forced_slice_hw = saved, forced

    def set_slice_hw(self, hw: tuple) -> None:
        """Impose a shared roi_slice buffer size (e.g. the fleet max, or
        a serving blob's baked frame shape). Must cover this dataset's
        own natural size — checked on first use."""
        self._forced_slice_hw = (int(hw[0]), int(hw[1]))
        self._slice_hw = None

    def enable_roi_slice(self, hw: Optional[tuple] = None) -> None:
        """Turn on roi_slice after construction (serve-exported drivers
        flip it when the blob's metadata says the artifact was exported
        for sliced buffers), optionally imposing a buffer size."""
        if self.is_train:
            raise ValueError("roi_slice is a serving mode "
                             "(is_train=False only)")
        if self.resize_method != "crop_square_resize":
            raise NotImplementedError(
                "roi_slice supports crop_square_resize only")
        self.roi_slice = True
        if hw is not None:
            self.set_slice_hw(hw)

    def _slice_roi(self, out: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Byte-slice the clamped square-bbox region of every pixel
        array into the zero-padded dataset buffer and shift roi_param by
        the slice origin. Bit-exact vs the full-frame resample: inside
        extract_roi_square, real pixels keep identical tap coordinates
        relative to the shifted param, and every out-of-slice tap either
        reads buffer zeros or is killed by the validity gate — both
        equal the full-frame path's read-as-zero semantics."""
        im_h, im_w = out["rgb"].shape[:2]
        bh, bw = self._slice_buffer_hw(im_h, im_w)
        p = out["roi_param"]
        x1, y1, x2, y2 = int(p[0]), int(p[1]), int(p[2]), int(p[3])
        xs, ys = max(x1, 0), max(y1, 0)
        xe, ye = max(min(x2, im_w), xs), max(min(y2, im_h), ys)
        # a clamped extent can still exceed the buffer only when the
        # square outgrew the frame; the buffer is capped at frame dims,
        # so re-clamp the copy extent (the tail reads as zero — same as
        # the full-frame validity gate for those taps)
        ye, xe = min(ye, ys + bh), min(xe, xs + bw)
        for k in ("rgb", "label"):
            buf = np.zeros((bh, bw) + out[k].shape[2:], out[k].dtype)
            buf[:ye - ys, :xe - xs] = out[k][ys:ye, xs:xe]
            out[k] = buf
        for k in ("mask", "entire_mask"):
            buf = np.zeros((bh, bw), out[k].dtype)
            buf[:ye - ys, :xe - xs] = out[k][ys:ye, xs:xe]
            out[k] = buf
        out["roi_param"] = p - np.array([xs, ys, xs, ys, 0],
                                        p.dtype)
        return out

    def get_raw(self, idx: int) -> Dict[str, np.ndarray]:
        px = self.get_pixels(idx)
        out = dict(px)
        out.update(self.get_params(idx, px["rgb"].shape))
        if self.roi_slice:
            out = self._slice_roi(out)
        return out

    def collate(self, indices: Sequence[int],
                executor=None) -> Dict[str, np.ndarray]:
        if executor is not None:
            rows = list(executor.map(self.get_raw, indices))
        else:
            rows = [self.get_raw(i) for i in indices]
        return {k: np.stack([r[k] for r in rows]) for k in rows[0]}


class MixedBatchIterator:
    """Infinite mixed real+pbr batches (reference: two DataLoaders whose
    batches are concatenated each step, train_v2.py:228-244; split sizes
    from common_ops.get_batch_size) with background prefetch and a sample
    thread pool (the reference's num_workers; cv2.imread releases the
    GIL, so threads parallelize the byte I/O)."""

    def __init__(self, ds1: CropDatasetHost,
                 ds2: Optional[CropDatasetHost],
                 batch_size: int, second_dataset_ratio: float = 0.75,
                 seed: int = 0, prefetch: int = 2,
                 num_workers: int = 8):
        from concurrent.futures import ThreadPoolExecutor

        self.ds1, self.ds2 = ds1, ds2
        if ds2 is not None and len(ds2) > 0:
            self.n2 = int(batch_size * second_dataset_ratio)
        else:
            self.n2 = 0
            self.ds2 = None
        self.n1 = batch_size - self.n2
        self.rng = np.random.default_rng(seed)
        self._pool = ThreadPoolExecutor(max_workers=max(num_workers, 1)) \
            if num_workers > 0 else None
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _draw(self, ds, n):
        return self.rng.integers(0, len(ds), size=n)

    def _worker(self):
        while not self._stop.is_set():
            b1 = self.ds1.collate(self._draw(self.ds1, self.n1),
                                  executor=self._pool)
            if self.ds2 is not None:
                b2 = self.ds2.collate(self._draw(self.ds2, self.n2),
                                      executor=self._pool)
                b1 = {k: np.concatenate([b1[k], b2[k]]) for k in b1}
            while not self._stop.is_set():
                try:
                    self._q.put(b1, timeout=1.0)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        return self._q.get()

    def close(self):
        """Stop the prefetch thread BEFORE shutting the sample pool down
        (shutting the pool first made in-flight collate calls raise
        'cannot schedule new futures after shutdown' from the worker)."""
        self._stop.set()
        try:  # unblock a producer stuck on a full queue
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=10.0)
        if self._pool is not None:
            self._pool.shutdown(wait=False)


# ---------------------------------------------------------------------------
# Device-resident dataset cache (index-only training input)
# ---------------------------------------------------------------------------

class DeviceDatasetCache:
    """Full-resolution pixel data for one or more (concatenated)
    CropDatasetHosts, uploaded to device HBM ONCE; per train step only
    int32 indices + integer roi params cross the host-device link and
    batches are gathered on device (`gather_preprocess_batch`).

    Why: the train loop otherwise streams ~75 MB/step (b32 480x640 rgb +
    label + 2 masks). On tunneled platforms (axon) that stream is both
    the throughput ceiling (~40 MB/s measured) and a hard memory leak
    (the client never releases device_put staging buffers); on directly
    attached hosts it still burns PCIe for pixels that never change.
    Cost: ~2.4 MB HBM per 480x640 sample — a 1k-image real split is
    ~2.4 GB, so this is for per-object real/primesense splits, not 50k
    pbr trees (the streaming MixedBatchIterator remains the default).

    With `mesh`, arrays are uploaded replicated over it so a sharded
    index batch GSPMD-partitions the gather (and everything downstream)
    across data-parallel devices.
    """

    PIXEL_KEYS = ("rgb", "label", "mask", "entire_mask")

    def __init__(self, datasets: Sequence[CropDatasetHost], mesh=None):
        self.datasets = [d for d in datasets if d is not None]
        if not self.datasets:
            raise ValueError("need at least one dataset")
        self.offsets = [0]
        stacks: Dict[str, list] = {k: [] for k in self.PIXEL_KEYS}
        hw = None
        for ds in self.datasets:
            for i in range(len(ds)):
                px = ds.get_pixels(i)
                if hw is None:
                    hw = px["rgb"].shape[:2]
                elif px["rgb"].shape[:2] != hw:
                    raise ValueError(
                        f"mixed image sizes {hw} vs {px['rgb'].shape[:2]}"
                        " — the device cache needs one image geometry")
                for k in self.PIXEL_KEYS:
                    stacks[k].append(px[k])
            self.offsets.append(self.offsets[-1] + len(ds))
        self.image_hw = hw
        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            sharding = NamedSharding(mesh, PartitionSpec())
        self.arrays = {}
        for k in self.PIXEL_KEYS:
            arr = np.stack(stacks[k])
            self.arrays[k] = (jax.device_put(arr, sharding)
                              if sharding is not None
                              else jax.device_put(arr))
        del stacks

    def __len__(self):
        return self.offsets[-1]

    def params(self, flat_indices: Sequence[int]) -> Dict[str, np.ndarray]:
        """Host-side per-draw bookkeeping for concatenated indices."""
        import bisect
        rows = []
        for fi in flat_indices:
            k = bisect.bisect_right(self.offsets, int(fi)) - 1
            ds = self.datasets[k]
            rows.append(ds.get_params(int(fi) - self.offsets[k],
                                      self.image_hw))
        return {k: np.stack([r[k] for r in rows]) for k in rows[0]}


class CachedBatchIterator:
    """Mixed real+pbr batch draws against a DeviceDatasetCache: emits
    only indices + roi params (same split semantics as
    MixedBatchIterator; no worker threads — there are no bytes to read)."""

    def __init__(self, cache: DeviceDatasetCache, batch_size: int,
                 second_dataset_ratio: float = 0.75, seed: int = 0):
        self.cache = cache
        n_ds = len(cache.datasets)
        if n_ds > 1 and len(cache.datasets[1]) > 0:
            self.n2 = int(batch_size * second_dataset_ratio)
        else:
            self.n2 = 0
        self.n1 = batch_size - self.n2
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        o = self.cache.offsets
        idx = self.rng.integers(0, o[1], size=self.n1)
        if self.n2:
            idx2 = self.rng.integers(o[1], o[2], size=self.n2)
            idx = np.concatenate([idx, idx2])
        p = self.cache.params(idx)
        return {"idx": idx.astype(np.int32),
                "roi_param": p["roi_param"],
                "valid": p["valid"]}

    def close(self):
        pass


class DevicePrefetchIterator:
    """Wrap a host batch iterator so each batch is placed onto the mesh
    (shard_batch: device_put with the batch sharding) one step AHEAD in
    a background thread — the H2D copy of batch k+1 overlaps the device
    compute of batch k (flax.jax_utils.prefetch_to_device, recast for
    NamedSharding/GSPMD instead of pmap). For pbr-scale splits that
    can't live in HBM (DeviceDatasetCache) this hides the PCIe/link
    latency of the ~2.4 MB/sample raw-frame stream; it cannot raise the
    link's bandwidth ceiling, only remove the serialization.

    Yields feed dicts whose leaves are committed jax.Arrays; consumers
    must NOT re-shard them (`device_resident` marks this).
    """

    device_resident = True
    FEED_KEYS = ("rgb", "label", "mask", "entire_mask", "roi_param",
                 "valid")

    def __init__(self, inner, mesh, keys: Sequence[str] = FEED_KEYS,
                 depth: int = 2):
        from zebrapose_tpu.parallel.mesh import shard_batch

        self.inner = inner
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()

        def worker():
            try:
                while not self._stop.is_set():
                    raw = next(inner)
                    feed = {k: raw[k] for k in keys}
                    batch = shard_batch(mesh, feed)
                    while not self._stop.is_set():
                        try:
                            self._q.put(batch, timeout=1.0)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # propagate to the consumer —
                # a silently dead worker would hang __next__ forever
                self._q.put(e)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=10.0)
        if hasattr(self.inner, "close"):
            self.inner.close()


@partial(jax.jit, static_argnames=("crop_img", "crop_gt", "base", "n_bits",
                                   "resize_method", "use_pepper_salt",
                                   "use_motion_blur"))
def gather_preprocess_batch(cache_arrays: Dict[str, jnp.ndarray],
                            idx: jnp.ndarray, roi_param: jnp.ndarray,
                            valid: jnp.ndarray, key: jax.Array,
                            crop_img: int = 256, crop_gt: int = 128,
                            base: int = 2, n_bits: int = 16,
                            resize_method: str = "crop_square_resize",
                            use_pepper_salt: bool = False,
                            use_motion_blur: bool = False
                            ) -> Dict[str, jnp.ndarray]:
    """Device-side batch assembly from a DeviceDatasetCache: gather the
    drawn samples out of HBM, then the standard preprocess program."""
    raw = {k: jnp.take(cache_arrays[k], idx, axis=0)
           for k in DeviceDatasetCache.PIXEL_KEYS}
    raw["roi_param"] = roi_param
    raw["valid"] = valid
    return preprocess_batch(
        raw, key, crop_img=crop_img, crop_gt=crop_gt, base=base,
        n_bits=n_bits, is_train=True, resize_method=resize_method,
        use_pepper_salt=use_pepper_salt, use_motion_blur=use_motion_blur)
