"""Inference engine: run a model over a dataset and COCO-evaluate.

Parity with /root/reference/pet/rcnn/core/test_engine.py (test_net, test)
+ rcnn/datasets/evaluation.py (post_processing / prepare_box_results /
evaluation): per image — forward at TEST.SCALE, rescale boxes to original
coordinates, convert to COCO xywh results with json category ids, then
COCOeval (here the in-repo COCOEvaluator).

TTA (TEST.BBOX_AUG): h-flip and multi-scale passes are merged by simple
concatenation of per-pass detections (im_detect_bbox, core/test.py:13-49;
grid models skip re-filtering, :46-47).

The per-image forward is jitted once per (bucket shape); the detection
post-processing back to original coordinates is host-side numpy (cheap).
"""

import json
import os
from typing import Dict, List, Optional

import jax
import numpy as np

from cpm_tpu.data.loader import TestLoader
from cpm_tpu.modeling.model import build_model


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
    """Jitted eval forward, compiled per input shape bucket."""

    @jax.jit
    def forward(images, image_sizes):
        return model.apply({"params": params}, images, image_sizes, train=False)

    return forward


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
    n_done = 0
    for items in zip(*loaders):
        per_image: List[dict] = []
        for p, item in zip(passes, items):
            dets = forward(item["images"], item["image_sizes"])
            dets_np = dict(
                boxes=np.asarray(dets.boxes[0]),
                scores=np.asarray(dets.scores[0]),
                labels=np.asarray(dets.labels[0]),
                mask=np.asarray(dets.mask[0]),
            )
            if p["hflip"]:
                dets_np = _unflip_dets(
                    dets_np, int(item["image_sizes"][0, 1])
                )
            per_image.extend(
                detections_to_coco(
                    dets_np,
                    item["image_id"],
                    item["scale_hw"],
                    c2j,
                )
            )
        results.extend(per_image)
        n_done += 1
        if progress_every and n_done % progress_every == 0:
            logger(f"inference: {n_done}/{len(loaders[0])} images")
    return results


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
    return stats
