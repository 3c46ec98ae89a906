"""Flagship-width pooler-backend A/B on the chip (VERDICT r3 weak #1).

The tiny-config A/B (tools/ab_deviations.py) quantified the bf16
pallas-pooler deviation only at tiny width. This tool measures it at the
flagship operating point WITHOUT needing a trained full-width
checkpoint: the fullsize-parity recipe's sharpened random-init weights
(tests/test_model_parity_fullsize.py — R-50 trunk, 81 classes, 1000
proposals, CMM+ISM+RSM, well-separated logits so survivor sets are not
decided by sub-1e-6 ties) produce hundreds of confident detections per
image, and the question "does the pallas bf16 pooler shift detections?"
is a question about identical-weight eval composition, not about mAP.

Three legs, identical weights, bf16 compute (the TPU default):
  gather      — pure-XLA pooler
  pallas      — the default TPU kernel
  pallas_f32  — pallas + TPU.EVAL_POOLER_DTYPE=float32

Reports per-leg detection counts and pairwise rank-matched max box /
score deltas at 512x768 (the fullsize test's geometry).

Run: python tools/ab_flagship_pooler.py [--images 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cpm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from tests.test_model_parity import _set_path
    from tests.test_model_parity_fullsize import (
        FULLSIZE_DELTAS,
        IMG_H,
        IMG_W,
        _images,
    )
    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.modeling.model import build_model
    from cpm_tpu.utils.amp import cast_floating_to, compute_dtype

    def make_cfg(kernel, pool_dtype):
        cfg = get_default_cfg()
        for path, value in FULLSIZE_DELTAS:
            _set_path(cfg, path, value)
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg.TPU.POOLER_KERNEL = kernel
        cfg.TPU.EVAL_POOLER_DTYPE = pool_dtype
        return cfg

    # one shared random-init param set, sharpened like the fullsize test
    cfg0 = make_cfg("gather", "compute")
    model0 = build_model(cfg0)
    from cpm_tpu.data.synthetic import synthetic_batch

    seed_batch = synthetic_batch(
        batch_size=1, height=IMG_H, width=IMG_W, num_classes=81, seed=0
    )
    variables = model0.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.asarray(seed_batch["images"]),
        jnp.asarray(seed_batch["image_sizes"]),
        gt=dict(
            boxes=jnp.asarray(seed_batch["gt_boxes"]),
            labels=jnp.asarray(seed_batch["gt_labels"]),
            mask=jnp.asarray(seed_batch["gt_mask"]),
        ),
        train=True,
    )
    params = variables["params"]

    sharpened = []

    def sharpen(tree, path=""):
        out = {}
        for k, v in tree.items():
            p = f"{path}/{k}"
            if isinstance(v, dict):
                out[k] = sharpen(v, p)
                continue
            arr = v
            if k == "kernel" and (
                "cls_score" in path or "objectness" in path
            ):
                arr = arr * 60.0
                sharpened.append(p + " *60")
            elif k == "deconv2_kernel":
                arr = arr * 30.0
                sharpened.append(p + " *30")
            elif k == "bias" and (
                "iou_fc2" in path or "iou_pred" in path
            ):
                arr = arr + 2.0
                sharpened.append(p + " +2")
            out[k] = arr
        return out

    params = sharpen(params)
    print(f"sharpened {len(sharpened)} leaves:", *sharpened, sep="\n  ")

    imgs = _images()[: args.images]
    legs = {
        "gather": ("gather", "compute"),
        "pallas": ("pallas", "compute"),
        "pallas_f32": ("pallas", "float32"),
        # both poolers forced to true f32 on the same bf16-quantized
        # features: isolates kernel-vs-gather arithmetic with the bf16
        # pooling noise of BOTH baselines removed (the pallas f32 path
        # runs HIGHEST-precision MXU passes as of round 5)
        "gather_f32": ("gather", "float32"),
    }
    dets = {}
    for name, (kernel, pdt) in legs.items():
        cfg = make_cfg(kernel, pdt)
        model = build_model(cfg)
        cdtype = compute_dtype(cfg)
        eval_params = cast_floating_to(params, cdtype)

        @jax.jit
        def fwd(p, im, sz):
            return model.apply(
                {"params": p}, im.astype(cdtype), sz, train=False
            )

        t0 = time.time()
        rows = []
        for img in imgs:
            d = fwd(
                eval_params,
                jnp.asarray(img.transpose(1, 2, 0)[None]),
                jnp.asarray([[IMG_H, IMG_W]]),
            )
            m = np.asarray(d.mask[0])
            rows.append(dict(
                boxes=np.asarray(d.boxes[0], np.float32)[m],
                scores=np.asarray(d.scores[0], np.float32)[m],
                labels=np.asarray(d.labels[0], np.int32)[m],
            ))
        dets[name] = rows
        n = sum(len(r["boxes"]) for r in rows)
        print(f"{name}: {n} detections over {len(imgs)} images "
              f"({time.time() - t0:.0f}s incl compile)", flush=True)

    def pair(a, b):
        """Nearest-neighbor SET match within (image, label): with the
        detection buffer saturated by near-tie sharpened-random scores,
        rank matching measures rank permutations (score deltas ~1e-4
        reorder hundreds of similar boxes), not numerical drift — the
        fullsize parity test's set-match is the right metric."""
        nn_max = score_d = 0.0
        count_mismatch = 0
        n_pairs = 0
        within = 0
        for ra, rb in zip(dets[a], dets[b]):
            if len(ra["boxes"]) != len(rb["boxes"]):
                count_mismatch += 1
            for lbl in np.unique(ra["labels"]):
                ba = ra["boxes"][ra["labels"] == lbl]
                bb = rb["boxes"][rb["labels"] == lbl]
                sa = np.sort(ra["scores"][ra["labels"] == lbl])
                sb = np.sort(rb["scores"][rb["labels"] == lbl])
                if not len(ba) or not len(bb):
                    continue
                d = np.abs(ba[:, None, :] - bb[None, :, :]).max(-1)
                nn = d.min(1)
                nn_max = max(nn_max, float(nn.max()))
                within += int((nn < 0.5).sum())
                n_pairs += len(ba)
                k = min(len(sa), len(sb))
                score_d = max(
                    score_d, float(np.abs(sa[-k:] - sb[-k:]).max())
                )
        return dict(
            max_nn_box_px=round(nn_max, 3),
            frac_within_half_px=round(within / max(n_pairs, 1), 4),
            max_score_delta_sorted=round(score_d, 5),
            images_with_count_mismatch=count_mismatch,
            dets=n_pairs,
        )

    report = {
        "pallas_vs_gather": pair("gather", "pallas"),
        "pallas_f32_vs_gather": pair("gather", "pallas_f32"),
        "pallas_f32_vs_pallas": pair("pallas", "pallas_f32"),
        "pallas_f32_vs_gather_f32": pair("gather_f32", "pallas_f32"),
        "geometry": f"{IMG_H}x{IMG_W}, R-50 width, 81 classes, "
                    f"1000 proposals, bf16 compute",
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
