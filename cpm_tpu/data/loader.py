"""Iteration-based, host-sharded train/eval loaders with fixed-shape batches.

Replaces the reference's sampler stack (SURVEY §2.6):
  * DistributedSampler (epoch-seeded shuffle + pad-divide + rank slice,
    pet/utils/data/samplers/distributed.py:7-63) -> per-host index slices;
  * GroupedBatchSampler (aspect-ratio buckets, grouped_batch_sampler.py)
    -> two orientation groups, batches drawn within a group;
  * IterationBasedBatchSampler (infinite re-iteration to MAX_ITER) ->
    epoch cycling inside the iterator;
  * BatchCollator + to_image_list -> fixed bucket padding into one NHWC
    array per batch (XLA compiles once per bucket shape).

TPU-first: every batch has one of a small set of static shapes — a
landscape bucket (short_max x long_max) and its portrait transpose —
and ground truth padded to TRAIN.MAX_GT_PER_IMAGE with masks.
"""

import threading
import queue as queue_mod
from typing import Iterator, Optional

import numpy as np

from cpm_tpu.data.coco import COCODataset
from cpm_tpu.data.transforms import (
    get_blob_scale_size,
    TestTransform,
    TrainTransform,
    get_resize_size,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_NATIVE = None


def _native():
    """The C++ image-op library, or None (PIL fallback)."""
    global _NATIVE
    if _NATIVE is None:
        try:
            from cpm_tpu import native

            native.get_lib()
            _NATIVE = native
        except Exception:
            _NATIVE = False
    return _NATIVE or None


def compute_buckets(scales, max_size, divisibility: int):
    """(short, long) padded bucket extents covering every train resize."""
    short = _round_up(max(scales), divisibility)
    long = _round_up(max_size, divisibility)
    return short, long


class TrainLoader:
    """Yields fixed-shape train batches forever (caller stops at MAX_ITER)."""

    def __init__(
        self,
        cfg,
        dataset: COCODataset,
        batch_size: int,
        *,
        rank: int = 0,
        world_size: int = 1,
        seed: int = 0,
        start_iter: int = 0,
        prefetch: int = 2,
    ):
        self.cfg = cfg
        self.dataset = dataset
        self.batch_size = batch_size
        self.rank = rank
        self.world_size = world_size
        self.seed = seed
        self.start_iter = start_iter
        # device_normalize: ship raw uint8 (1/4 the host->device bytes);
        # the model applies the input affine on chip (see
        # GeneralizedRCNN._normalize_uint8)
        self.device_normalize = bool(
            getattr(cfg.TPU, "DEVICE_NORMALIZE", False)
        )
        self.transform = TrainTransform(
            cfg, normalize=not self.device_normalize
        )
        self.max_gt = cfg.TRAIN.MAX_GT_BOXES
        self.divisibility = cfg.TRAIN.SIZE_DIVISIBILITY
        short, long = compute_buckets(
            cfg.TRAIN.SCALES, cfg.TRAIN.MAX_SIZE, self.divisibility
        )
        self.buckets = {
            "landscape": (short, long),
            "portrait": (long, short),
        }
        self.aspect = dataset.aspect_ratios()
        self.prefetch = prefetch
        # DATALOADER.SAMPLER_TRAIN selection (reference wires it at
        # rcnn/datasets/dataset.py:51-52): RepeatFactorTrainingSampler
        # repeats rare-category images per epoch; default is
        # DistributedSampler semantics. Repeat factors are fixed for the
        # whole run, computed once here (repeat_factor.py:62-65).
        self.sampler_train = str(
            getattr(cfg.DATALOADER, "SAMPLER_TRAIN", "DistributedSampler")
        )
        self._repeat_factors = None
        if self.sampler_train == "RepeatFactorTrainingSampler":
            from cpm_tpu.data.samplers import (
                repeat_factors_from_category_frequency,
            )

            rft = cfg.DATALOADER.RFTSAMPLER
            self._repeat_factors = repeat_factors_from_category_frequency(
                dataset,
                repeat_thresh=float(rft.REPEAT_THRESHOLD),
                pow_=float(rft.POW),
                max_repeat=float(rft.MAX_REPEAT_TIMES),
                min_repeat=float(rft.MIN_REPEAT_TIMES),
            )
        # native pthread decode pool: N workers decode/resize/normalize a
        # whole batch concurrently (the reference's DataLoader worker
        # processes, SURVEY §2.6); falls back to per-image PIL on error
        self.pool = None
        nat = _native()
        if nat is not None:
            n_workers = max(1, int(getattr(cfg.DATALOADER, "NUM_WORKERS", 4)))
            try:
                self.pool = nat.ImagePool(n_workers)
            except Exception:
                self.pool = None

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        """One epoch of per-rank dataset indices.

        DistributedSampler semantics (seeded shuffle, pad, strided rank
        slice) by default; RepeatFactorTrainingSampler (stochastic-ceil
        repetition + shuffle + contiguous rank slice, matching
        repeat_factor.py:131-155) when DATALOADER.SAMPLER_TRAIN selects
        it."""
        if self._repeat_factors is not None:
            from cpm_tpu.data.samplers import repeat_factor_indices

            idx = repeat_factor_indices(
                self._repeat_factors, self.seed + epoch
            )
            # reference subsamples contiguous per-rank slices of the
            # (already shuffled) repeated index list, TRUNCATING the
            # final < world_size remainder (repeat_factor.py:148-151
            # num_samples = int(len/replicas)) — deliberately NOT the
            # padded semantics of the DistributedSampler branch below
            per_rank = len(idx) // self.world_size
            return idx[self.rank * per_rank : (self.rank + 1) * per_rank]
        g = np.random.RandomState(self.seed + epoch)
        idx = g.permutation(len(self.dataset))
        total = (
            (len(idx) + self.world_size - 1) // self.world_size
        ) * self.world_size
        idx = np.concatenate([idx, idx[: total - len(idx)]])
        return idx[self.rank :: self.world_size]

    def _group_batches(self, indices: np.ndarray, epoch: int, carry=None):
        """Aspect-ratio-grouped batches (GroupedBatchSampler).

        The reference's GroupedBatchSampler(drop_uneven=False)
        (grouped_batch_sampler.py:93) keeps each group's tail as a
        short final batch. Fixed-shape TPU batches can't shrink, so the
        tail indices are instead carried into the same group's pool at
        the next epoch: no image is ever dropped, every batch stays
        full-size. Returns (batches, carry_out) where carry_out maps
        group -> leftover indices."""
        groups = {0: list((carry or {}).get(0, ())),
                  1: list((carry or {}).get(1, ()))}
        for i in indices:
            groups[int(self.aspect[i] >= 1)].append(i)
        batches = []
        carry_out = {0: [], 1: []}
        for k, g in groups.items():
            n_full = len(g) // self.batch_size
            for s in range(0, n_full * self.batch_size, self.batch_size):
                batches.append(g[s : s + self.batch_size])
            carry_out[k] = g[n_full * self.batch_size :]
        rng = np.random.RandomState(self.seed * 7919 + epoch)
        rng.shuffle(batches)
        return batches, carry_out

    def _load_one(self, i: int, rng: np.random.RandomState):
        """(normalized float image [nh, nw, 3], boxes, (nh, nw)) — native
        fused path when the C++ library is built, PIL otherwise."""
        boxes, labels = self.dataset.load_annotations(i)
        nat = _native()
        if nat is not None:
            info = self.dataset.get_img_info(i)
            oh, ow = info["height"], info["width"]
            shortest = self.transform.scales[
                rng.randint(len(self.transform.scales))
            ]
            nh, nw = get_resize_size((oh, ow), shortest, self.transform.max_size)
            try:
                with open(self.dataset.image_path(i), "rb") as f:
                    data = f.read()
                if self.device_normalize:
                    img, _ = nat.decode_resize_u8(
                        data, (nh, nw), (nh, nw), self.transform.to_bgr255
                    )
                else:
                    img, _ = nat.decode_resize_normalize(
                        data, (nh, nw), (nh, nw),
                        self.transform.pixel_means,
                        self.transform.pixel_stds,
                        self.transform.to_bgr255,
                    )
                b = boxes.copy()
                b[:, 0::2] *= nw / ow
                b[:, 1::2] *= nh / oh
                if rng.rand() < self.transform.flip_prob:
                    img = np.ascontiguousarray(img[:, ::-1])
                    fb = b.copy()
                    fb[:, 0] = nw - b[:, 2] - 1
                    fb[:, 2] = nw - b[:, 0] - 1
                    b = fb
                return img, b, labels, (nh, nw)
            except RuntimeError:
                pass  # undecodable by native lib -> PIL fallback
        img = self.dataset.load_image(i)
        img, boxes, size = self.transform(img, boxes, rng)
        return img, boxes, labels, size

    def _load_batch_pooled(self, batch_indices, rng: np.random.RandomState):
        """Decode the whole batch through the native worker pool.

        Returns a list of (img, boxes, labels, size) in batch order, or
        None to fall back to the sequential path."""
        plan = []
        for i in batch_indices:
            info = self.dataset.get_img_info(i)
            oh, ow = info["height"], info["width"]
            shortest = self.transform.scales[
                rng.randint(len(self.transform.scales))
            ]
            nh, nw = get_resize_size(
                (oh, ow), shortest, self.transform.max_size
            )
            flip = rng.rand() < self.transform.flip_prob
            plan.append((i, (oh, ow), (nh, nw), flip))
        max_h = max(p[2][0] for p in plan)
        max_w = max(p[2][1] for p in plan)
        try:
            for t, (i, _, (nh, nw), _) in enumerate(plan):
                if self.device_normalize:
                    self.pool.submit_u8(
                        t, self.dataset.image_path(i), (nh, nw),
                        (max_h, max_w), self.transform.to_bgr255,
                    )
                else:
                    self.pool.submit(
                        t, self.dataset.image_path(i), (nh, nw),
                        (max_h, max_w),
                        self.transform.pixel_means,
                        self.transform.pixel_stds,
                        self.transform.to_bgr255,
                    )
            decoded = [None] * len(plan)
            for _ in plan:
                if self.device_normalize:
                    t, img, _ = self.pool.wait_any_u8((max_h, max_w))
                else:
                    t, img, _ = self.pool.wait_any((max_h, max_w))
                decoded[t] = img
        except RuntimeError:
            return None  # a worker failed (e.g. undecodable file)
        out = []
        for (i, (oh, ow), (nh, nw), flip), img in zip(plan, decoded):
            img = img[:nh, :nw]
            boxes, labels = self.dataset.load_annotations(i)
            b = boxes.copy()
            b[:, 0::2] *= nw / ow
            b[:, 1::2] *= nh / oh
            if flip:
                img = np.ascontiguousarray(img[:, ::-1])
                fb = b.copy()
                fb[:, 0] = nw - b[:, 2] - 1
                fb[:, 2] = nw - b[:, 0] - 1
                b = fb
            out.append((img, b, labels, (nh, nw)))
        return out

    def _make_batch(self, batch_indices, rng: np.random.RandomState):
        images, sizes, all_boxes, all_labels = [], [], [], []
        landscape_votes = 0
        loaded = (
            self._load_batch_pooled(batch_indices, rng)
            if self.pool is not None
            else None
        )
        if loaded is None:
            loaded = [self._load_one(i, rng) for i in batch_indices]
        for img, boxes, labels, size in loaded:
            images.append(img)
            sizes.append(size)
            all_boxes.append(boxes)
            all_labels.append(labels)
            landscape_votes += int(img.shape[1] >= img.shape[0])
        bucket = (
            self.buckets["landscape"]
            if landscape_votes * 2 >= len(images)
            else self.buckets["portrait"]
        )
        bh, bw = bucket
        B = len(images)
        img_dtype = np.uint8 if self.device_normalize else np.float32
        out_images = np.zeros((B, bh, bw, 3), img_dtype)
        out_sizes = np.zeros((B, 2), np.int32)
        gt_boxes = np.zeros((B, self.max_gt, 4), np.float32)
        gt_labels = np.zeros((B, self.max_gt), np.int32)
        gt_mask = np.zeros((B, self.max_gt), bool)
        for b in range(B):
            h, w = images[b].shape[:2]
            h2, w2 = min(h, bh), min(w, bw)
            out_images[b, :h2, :w2] = images[b][:h2, :w2]
            out_sizes[b] = (h2, w2)
            k = min(len(all_boxes[b]), self.max_gt)
            gt_boxes[b, :k] = all_boxes[b][:k]
            gt_labels[b, :k] = all_labels[b][:k]
            gt_mask[b, :k] = True
        return dict(
            images=out_images,
            image_sizes=out_sizes,
            gt_boxes=gt_boxes,
            gt_labels=gt_labels,
            gt_mask=gt_mask,
        )

    def _raw_iter(self) -> Iterator[dict]:
        """Yields batches from iteration `start_iter` onward.

        Resume parity with the reference (IterationBasedBatchSampler
        restarted at scheduler.iteration, tools/rcnn/train_net.py:127):
        the epoch/batch position is fast-forwarded by replaying the
        cheap index math — never decoding an image — so a resumed run
        sees the identical batch stream an uninterrupted run would."""
        it = 0
        epoch = 0
        carry = None
        while True:
            indices = self._epoch_indices(epoch)
            batches, carry = self._group_batches(indices, epoch, carry)
            if not batches and not any(carry.values()):
                raise RuntimeError("TrainLoader: empty epoch (no images)")
            if it + len(batches) <= self.start_iter:
                it += len(batches)  # skip a fully-consumed epoch
                epoch += 1
                continue
            skip = max(0, self.start_iter - it)
            it += skip
            for batch_indices in batches[skip:]:
                rng = np.random.RandomState(
                    (self.seed * 1_000_003 + it * 97 + self.rank) % (2**31)
                )
                yield self._make_batch(batch_indices, rng)
                it += 1
            epoch += 1

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch <= 0:
            yield from self._raw_iter()
            return
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for item in self._raw_iter():
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item


class TestLoader:
    """Eval batches of TEST.IMS_PER_GPU images (reference default 1;
    batching >1 groups same-orientation images into one padded bucket for
    throughput — the model's test path is fully batched)."""

    def __init__(
        self,
        cfg,
        dataset: COCODataset,
        *,
        start: int = 0,
        end: Optional[int] = None,
        scale: Optional[int] = None,
        max_size: Optional[int] = None,
        hflip: bool = False,
        batch_size: Optional[int] = None,
    ):
        self.cfg = cfg
        self.dataset = dataset
        self.start = start
        self.end = len(dataset) if end is None else end
        self.device_normalize = bool(
            getattr(cfg.TPU, "DEVICE_NORMALIZE", False)
        )
        self.transform = TestTransform(
            cfg, scale=scale, max_size=max_size,
            normalize=not self.device_normalize,
        )
        self.divisibility = cfg.TEST.SIZE_DIVISIBILITY
        scale_v = scale if scale is not None else cfg.TEST.SCALE
        max_v = max_size if max_size is not None else cfg.TEST.MAX_SIZE
        short = _round_up(scale_v, self.divisibility)
        long = _round_up(max_v, self.divisibility)
        self.buckets = {"landscape": (short, long), "portrait": (long, short)}
        self.hflip = hflip
        self.batch_size = (
            int(batch_size)
            if batch_size is not None
            else max(1, int(getattr(cfg.TEST, "IMS_PER_GPU", 1)))
        )

    def __len__(self):
        return self.end - self.start

    def _load_native(self, i: int):
        nat = _native()
        if nat is None:
            return None
        if self.hflip:
            # reference TTA flips the RAW image before resizing
            # (test.py:342-343); the native fused op resizes first, so
            # a post-resize flip would differ sub-pixel under the cv2
            # mapping. Route TTA flip passes through the python path,
            # which flips raw then resizes.
            return None
        info = self.dataset.get_img_info(i)
        oh, ow = info["height"], info["width"]
        interp = self.transform.backend  # 'cv2' (eval parity) or 'pil'
        if interp == "cv2":
            im_scale, (nh, nw) = get_blob_scale_size(
                (oh, ow), self.transform.scale, self.transform.max_size
            )
            scale_xy = (im_scale, im_scale)
        else:
            nh, nw = get_resize_size(
                (oh, ow), self.transform.scale, self.transform.max_size
            )
            scale_xy = (1.0, 1.0)
        bucket = (
            self.buckets["landscape"] if nw >= nh else self.buckets["portrait"]
        )
        try:
            with open(self.dataset.image_path(i), "rb") as f:
                data = f.read()
            if self.device_normalize:
                img, _ = nat.decode_resize_u8(
                    data, (nh, nw), bucket, self.transform.to_bgr255,
                    interp=interp, scale_xy=scale_xy,
                )
            else:
                img, _ = nat.decode_resize_normalize(
                    data, (nh, nw), bucket,
                    self.transform.pixel_means, self.transform.pixel_stds,
                    self.transform.to_bgr255,
                    interp=interp, scale_xy=scale_xy,
                )
        except RuntimeError:
            return None
        return img, (nh, nw), (oh, ow)

    def _load_one_test(self, i: int):
        """(padded img [bh, bw, 3], (nh, nw), meta dict, bucket key)"""
        native_out = self._load_native(i)
        if native_out is not None:
            img, (nh, nw), (orig_h, orig_w) = native_out
            scale_hw = (nh / orig_h, nw / orig_w)
        else:
            raw = self.dataset.load_image(i)
            if self.hflip:
                raw = np.ascontiguousarray(raw[:, ::-1])
            orig_h, orig_w = raw.shape[:2]
            norm, (nh, nw), scale_hw = self.transform(raw)
            bucket = (
                self.buckets["landscape"]
                if nw >= nh
                else self.buckets["portrait"]
            )
            bh, bw = bucket
            img = np.zeros(
                (bh, bw, 3),
                np.uint8 if self.device_normalize else np.float32,
            )
            img[:nh, :nw] = norm[:bh, :bw]
        key = "landscape" if nw >= nh else "portrait"
        meta = dict(
            index=i,
            image_id=self.dataset.id_to_img_map[i],
            orig_size=(orig_h, orig_w),
            scale_hw=scale_hw,
        )
        return img, (nh, nw), meta, key

    def _emit(self, buf):
        """buf: list of (img, (nh, nw), meta). Pads partial batches by
        repeating the last image; `count` marks the real images."""
        count = len(buf)
        while len(buf) < self.batch_size:
            buf.append(buf[-1])
        images = np.stack([b[0] for b in buf])
        sizes = np.array([b[1] for b in buf], np.int32)
        out = dict(
            images=images,
            image_sizes=sizes,
            meta=[b[2] for b in buf[:count]],
            count=count,
        )
        if self.batch_size == 1:
            out.update(buf[0][2])  # per-image compat keys
        return out

    def __iter__(self):
        # per-orientation buffers: all TTA passes of one image share its
        # aspect ratio, so parallel TestLoaders group identically and
        # zip(*loaders) stays aligned across passes
        buffers = {"landscape": [], "portrait": []}
        order = []  # flush order so iteration stays deterministic
        for i in range(self.start, self.end):
            img, size, meta, key = self._load_one_test(i)
            buffers[key].append((img, size, meta))
            if len(buffers[key]) == self.batch_size:
                yield self._emit(buffers[key])
                buffers[key] = []
            if key not in order:
                order.append(key)
        for key in order:
            if buffers[key]:
                yield self._emit(buffers[key])
