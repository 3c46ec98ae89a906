"""Inference engine: run a model over a dataset and COCO-evaluate.

Parity with /root/reference/pet/rcnn/core/test_engine.py (test_net, test)
+ rcnn/datasets/evaluation.py (post_processing / prepare_box_results /
evaluation): per image — forward at TEST.SCALE, rescale boxes to original
coordinates, convert to COCO xywh results with json category ids, then
COCOeval (here the in-repo COCOEvaluator).

TTA (TEST.BBOX_AUG): per-pass detections are mapped to original image
coordinates, concatenated, then filtered ONCE by the module-level
filter_results equivalent (im_detect_bbox, core/test.py:44-48: re-filter
runs for non-grid models always and for grid models when BBOX_AUG is on;
filter_results:433-509 reads the FAST_RCNN.* thresholds for every family
and applies ml_nms, or per-class soft-NMS / box-voting when
TEST.SOFT_NMS / TEST.BBOX_VOTE are enabled, then caps to
DETECTIONS_PER_IMG). The merged set has a fixed size (passes x K padded
detections), so the merge filter is one jitted program.

The per-image forward is jitted once per (bucket shape); the detection
post-processing back to original coordinates is host-side numpy (cheap).
"""

import json
import os
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.data.loader import TestLoader
from cpm_tpu.modeling.model import build_model
from cpm_tpu.ops.nms import box_ml_voting, ml_soft_nms, multiclass_nms


def detections_to_coco(
    dets_np: Dict[str, np.ndarray],
    image_id: int,
    scale_hw,
    contiguous_to_json: Dict[int, int],
) -> List[dict]:
    """One image's Detections -> COCO result dicts (evaluation.py:110-150).

    Boxes are unscaled to original image coords and converted xyxy->xywh
    with the TO_REMOVE=1 convention (bounding_box.py convert)."""
    boxes = dets_np["boxes"]
    scores = dets_np["scores"]
    labels = dets_np["labels"]
    mask = dets_np["mask"]
    sh, sw = scale_hw
    out = []
    for i in range(len(boxes)):
        if not mask[i]:
            continue
        if int(labels[i]) not in contiguous_to_json:
            # a model with more classes than the dataset (e.g. the
            # 81-class parity trunk eval'd on the 8-class synthetic set)
            # can emit labels the dataset never defines; COCOeval can't
            # score them and the reference-side eval drops them the same
            # way (tools/parity_experiment.py)
            continue
        x1, y1, x2, y2 = boxes[i]
        x1, x2 = x1 / sw, x2 / sw
        y1, y2 = y1 / sh, y2 / sh
        w = max(x2 - x1 + 1.0, 0.0)
        h = max(y2 - y1 + 1.0, 0.0)
        out.append(
            dict(
                image_id=int(image_id),
                category_id=int(contiguous_to_json[int(labels[i])]),
                bbox=[float(x1), float(y1), float(w), float(h)],
                score=float(scores[i]),
            )
        )
    return out


def make_forward_fn(cfg, model, params):
    """Jitted eval forward, compiled per input shape bucket. Runs in
    TPU.COMPUTE_DTYPE (bf16 on TPU) with f32 box arithmetic inside.

    Params are passed as a jit ARGUMENT (donating them to the closure
    would bake ~100MB of literals into the HLO: slow compiles, and
    tunneled PJRT backends reject the oversized compile request)."""
    from cpm_tpu.utils.amp import cast_floating_to, cast_images, compute_dtype

    cdtype = compute_dtype(cfg)
    cast_params = jax.device_put(cast_floating_to(params, cdtype))

    @jax.jit
    def forward_impl(p, images, image_sizes):
        return model.apply(
            {"params": p}, cast_images(images, cdtype), image_sizes,
            train=False,
        )

    def forward(images, image_sizes):
        return forward_impl(cast_params, images, image_sizes)

    return forward


@partial(
    jax.jit,
    static_argnames=(
        "score_thresh", "nms_thresh", "detections_per_img",
        "use_soft_nms", "soft_nms_sigma", "soft_nms_method",
        "use_box_voting", "vote_thresh", "vote_scoring_method", "vote_beta",
    ),
)
def _merged_filter(
    boxes, scores, labels, mask, *,
    score_thresh, nms_thresh, detections_per_img,
    use_soft_nms=False, soft_nms_sigma=0.5, soft_nms_method="linear",
    use_box_voting=False, vote_thresh=0.8, vote_scoring_method="ID",
    vote_beta=1.0,
):
    """filter_results (core/test.py:433-509) over a flat labeled set.

    boxes [N,4], scores [N], labels [N] (1..C-1), mask [N]. Returns
    fixed-size (boxes, scores, labels, valid) of detections_per_img.
    """
    valid = mask & (scores > score_thresh)
    if use_soft_nms:
        idx, new_scores, keep = ml_soft_nms(
            boxes, scores, labels, detections_per_img,
            sigma=soft_nms_sigma, overlap_thresh=nms_thresh,
            score_thresh=1e-4, method=soft_nms_method, mask=valid,
        )
        out_boxes = boxes[idx]
        out_scores = new_scores
        out_labels = labels[idx]
    else:
        idx, keep = multiclass_nms(
            boxes, scores, labels, nms_thresh, detections_per_img, mask=valid
        )
        out_boxes = boxes[idx]
        out_scores = jnp.where(keep, scores[idx], 0.0)
        out_labels = labels[idx]
    if use_box_voting:
        voted, vscores = box_ml_voting(
            out_boxes, out_scores, out_labels,
            boxes, scores, labels,
            vote_thresh, scoring_method=vote_scoring_method, beta=vote_beta,
            top_mask=keep, pool_mask=valid,
        )
        out_boxes = jnp.where(keep[:, None], voted, out_boxes)
        out_scores = jnp.where(keep, vscores, 0.0)
    return out_boxes, out_scores, out_labels, keep


def merge_tta_detections(cfg, per_pass_dets: List[Dict[str, np.ndarray]]):
    """Concat per-pass detections (already in a common coordinate frame)
    and run the single post-merge filter (core/test.py:46-48)."""
    boxes = np.concatenate([d["boxes"] for d in per_pass_dets], axis=0)
    scores = np.concatenate([d["scores"] for d in per_pass_dets], axis=0)
    labels = np.concatenate([d["labels"] for d in per_pass_dets], axis=0)
    mask = np.concatenate([d["mask"] for d in per_pass_dets], axis=0)
    t = cfg.TEST
    out_boxes, out_scores, out_labels, keep = _merged_filter(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.asarray(labels), jnp.asarray(mask),
        score_thresh=cfg.FAST_RCNN.SCORE_THRESH,
        nms_thresh=cfg.FAST_RCNN.NMS,
        detections_per_img=cfg.FAST_RCNN.DETECTIONS_PER_IMG,
        use_soft_nms=t.SOFT_NMS.ENABLED,
        soft_nms_sigma=t.SOFT_NMS.SIGMA,
        soft_nms_method=t.SOFT_NMS.METHOD,
        use_box_voting=t.BBOX_VOTE.ENABLED,
        vote_thresh=t.BBOX_VOTE.VOTE_TH,
        vote_scoring_method=t.BBOX_VOTE.SCORING_METHOD,
        vote_beta=t.BBOX_VOTE.SCORING_METHOD_BETA,
    )
    return dict(
        boxes=np.asarray(out_boxes),
        scores=np.asarray(out_scores),
        labels=np.asarray(out_labels),
        mask=np.asarray(keep),
    )


def _unflip_dets(dets_np, resized_w):
    """Map h-flipped detections back (BoxList.transpose TO_REMOVE=1)."""
    b = dets_np["boxes"].copy()
    x1 = resized_w - dets_np["boxes"][:, 2] - 1
    x2 = resized_w - dets_np["boxes"][:, 0] - 1
    b[:, 0], b[:, 2] = x1, x2
    out = dict(dets_np)
    out["boxes"] = b
    return out


def run_inference_on_dataset(
    cfg,
    model,
    params,
    dataset,
    *,
    start: int = 0,
    end: Optional[int] = None,
    progress_every: int = 100,
    logger=print,
) -> List[dict]:
    """Returns COCO-format result dicts for images [start, end)."""
    forward = make_forward_fn(cfg, model, params)
    results: List[dict] = []

    passes = [dict(scale=None, max_size=None, hflip=False)]
    if cfg.TEST.BBOX_AUG.ENABLED:
        if cfg.TEST.BBOX_AUG.H_FLIP:
            passes.append(dict(scale=None, max_size=None, hflip=True))
        for s in cfg.TEST.BBOX_AUG.SCALES:
            passes.append(
                dict(scale=s, max_size=cfg.TEST.BBOX_AUG.MAX_SIZE, hflip=False)
            )
            if cfg.TEST.BBOX_AUG.H_FLIP:
                passes.append(
                    dict(
                        scale=s, max_size=cfg.TEST.BBOX_AUG.MAX_SIZE,
                        hflip=True,
                    )
                )

    loaders = [
        TestLoader(
            cfg, dataset, start=start, end=end,
            scale=p["scale"], max_size=p["max_size"], hflip=p["hflip"],
        )
        for p in passes
    ]

    c2j = dataset.contiguous_category_id_to_json_id
    tta = len(passes) > 1
    n_done = 0

    # eval-time visualization hook (reference test_engine.py:171-187:
    # cfg.VIS.ENABLED dumps annotated images under $CKPT/vis/)
    vis_dir = None
    class_names = None
    if cfg.VIS.ENABLED:
        vis_dir = os.path.join(cfg.CKPT, "vis")
        os.makedirs(vis_dir, exist_ok=True)
        class_names = [""] * (max(c2j, default=0) + 1)
        for cont, jid in c2j.items():
            cat = getattr(dataset.coco, "cats", {}).get(jid, {})
            class_names[cont] = cat.get("name", str(jid))

    def _vis_one(dets_np, meta):
        """Draw final detections (original image coords) over the raw
        image and write $CKPT/vis/<file_name>."""
        from cpm_tpu.utils.vis import save_vis

        image = dataset.load_image(meta["index"])
        file_name = os.path.basename(
            dataset.get_img_info(meta["index"]).get(
                "file_name", f"{meta['image_id']}.jpg"
            )
        )
        keep = dets_np["mask"].astype(bool)
        save_vis(
            image,
            dets_np["boxes"][keep],
            dets_np["scores"][keep],
            dets_np["labels"][keep],
            os.path.join(vis_dir, file_name),
            class_names=class_names,
            score_thresh=cfg.VIS.VIS_TH,
            num_classes=cfg.MODEL.NUM_CLASSES,
        )

    def dispatch(items):
        """Enqueue all passes' forwards (async jax dispatch) — the chip
        works on this image while the host post-processes the previous
        one (replaces the reference's synchronous per-image loop,
        test_engine.py:137-169, with software pipelining)."""
        return [
            (forward(item["images"], item["image_sizes"]), item)
            for item in items
        ]

    def collect(pending):
        count = pending[0][1]["count"]
        # ONE device->host transfer per (pass, batch): per-array indexed
        # reads would cost a full host round trip each (4 arrays x images
        # x passes), which dominates wall time on high-latency transports
        fetched = [
            (
                jax.device_get(
                    (dets.boxes, dets.scores, dets.labels, dets.mask)
                ),
                item,
            )
            for dets, item in pending
        ]
        for j in range(count):
            per_pass: List[Dict[str, np.ndarray]] = []
            for p, ((fb, fs, fl, fm), item) in zip(passes, fetched):
                meta = item["meta"][j]
                dets_np = dict(
                    boxes=np.array(fb[j]),
                    scores=np.array(fs[j]),
                    labels=np.array(fl[j]),
                    mask=np.array(fm[j]),
                )
                if p["hflip"]:
                    dets_np = _unflip_dets(
                        dets_np, int(item["image_sizes"][j, 1])
                    )
                if tta:
                    # map to original image coords: all passes share a frame
                    sh, sw = meta["scale_hw"]
                    b = dets_np["boxes"].copy()
                    b[:, 0::2] /= sw
                    b[:, 1::2] /= sh
                    dets_np["boxes"] = b
                per_pass.append((dets_np, meta))
            if tta:
                merged = merge_tta_detections(cfg, [d for d, _ in per_pass])
                results.extend(
                    detections_to_coco(
                        merged, per_pass[0][1]["image_id"], (1.0, 1.0), c2j
                    )
                )
                if vis_dir is not None:
                    _vis_one(merged, per_pass[0][1])
            else:
                dets_np, meta = per_pass[0]
                results.extend(
                    detections_to_coco(
                        dets_np, meta["image_id"], meta["scale_hw"], c2j
                    )
                )
                if vis_dir is not None:
                    sh, sw = meta["scale_hw"]
                    orig = dict(dets_np)
                    b = dets_np["boxes"].copy()
                    b[:, 0::2] /= sw
                    b[:, 1::2] /= sh
                    orig["boxes"] = b
                    _vis_one(orig, meta)

    pending = None
    for items in zip(*loaders):
        dispatched = dispatch(items)
        if pending is not None:
            collect(pending)
            n_done += pending[0][1]["count"]
            if progress_every and n_done % progress_every < pending[0][1]["count"]:
                logger(f"inference: {n_done}/{len(loaders[0])} images")
        pending = dispatched
    if pending is not None:
        collect(pending)
        n_done += pending[0][1]["count"]
    return results


def shard_ranges(n_images: int, n_shards: int) -> List[tuple]:
    """Split [0, n_images) into n_shards contiguous ranges
    (multi_gpu_test_net_on_dataset, test_engine.py:60-100)."""
    n_shards = max(1, min(n_shards, n_images)) if n_images else 1
    per = (n_images + n_shards - 1) // n_shards
    return [
        (i * per, min((i + 1) * per, n_images))
        for i in range(n_shards)
        if i * per < n_images
    ]


def evaluate_results(cfg, dataset, results, output_dir: Optional[str] = None):
    """COCO-evaluate and optionally persist bbox.json (evaluation.py:95-106)."""
    from cpm_tpu.evaluation.coco_eval import COCOEvaluator

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "bbox.json"), "w") as f:
            json.dump(results, f)
    evaluator = COCOEvaluator(dataset.coco)
    stats = evaluator.evaluate(
        results, img_ids=[dataset.id_to_img_map[i] for i in range(len(dataset))]
    )
    # Regression guard (reference evaluation.py:104, dormant there;
    # config-driven here). Log-only, like the reference.
    from cpm_tpu.evaluation.coco_eval import check_expected_results

    check_expected_results(
        stats,
        cfg.TEST.EXPECTED_RESULTS,
        cfg.TEST.EXPECTED_RESULTS_SIGMA_TOL,
    )
    return stats
