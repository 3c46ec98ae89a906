"""A/B the accuracy-affecting TPU deviations on a trained checkpoint.

Measures, with the tiny-CPM torch checkpoint trained by
tools/parity_experiment.py (imported into the JAX model):

  1. TPU.POOLER_KERNEL pallas vs gather: full eval over the synthetic
     dataset with each backend; reports per-metric COCOeval deltas and
     the max per-detection box/score difference. (The Pallas kernel is
     exact for window-fitting rois and routes overflowing rois through
     the gather path, so residual deltas are bf16/accumulation-order
     noise.)
  2. The window-overflow rate: fraction of eval-time pooled rois whose
     source cells exceed the WIN-cell window, measured over every
     pooler call of the eval run.

TPU.APPROX_TOPK needs no eval A/B anymore: inference always uses exact
lax.top_k (cpm_tpu/modeling/model.py — approx_max_k is train-only).

Run on the TPU chip: python tools/ab_deviations.py
"""

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests"),
)

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/cpm_parity_ref.pt")
    ap.add_argument("--out", default="docs/AB_DEVIATIONS.md")
    ap.add_argument("--platform", default="",
                    help="jax platform to eval on; default '' unpins the "
                         "cpu pin that importing parity_experiment set, "
                         "letting jax pick the chip (its platform "
                         "registers as 'axon' here, not 'tpu', so an "
                         "explicit name would miss it)")
    args = ap.parse_args()

    import torch

    import jax

    from parity_experiment import load_dataset, our_cfg

    # parity_experiment pins jax_platforms=cpu at import time for its own
    # reproducibility; this tool's whole point is the on-chip kernel, so
    # re-pin (or unpin) before the first backend touch.
    jax.config.update("jax_platforms", args.platform or None)
    from cpm_tpu.engine.test import run_inference_on_dataset
    from cpm_tpu.evaluation.coco_eval import COCOEvaluator
    from cpm_tpu.modeling.model import build_model
    from cpm_tpu.utils.weight_import import import_cpm_checkpoint

    if not os.path.exists(args.ckpt):
        print(f"checkpoint {args.ckpt} missing — run "
              "tools/parity_experiment.py first")
        return

    sd = {
        k: v.numpy()
        for k, v in torch.load(args.ckpt, weights_only=True).items()
    }
    dataset = load_dataset()
    backend = jax.default_backend()

    results = {}
    stats = {}
    for kernel in ("gather", "pallas"):
        cfg = our_cfg()
        cfg.TPU.POOLER_KERNEL = kernel
        cfg.TPU.COMPUTE_DTYPE = (
            "bfloat16" if backend == "tpu" else "float32"
        )
        params = import_cpm_checkpoint(sd, cfg)
        model = build_model(cfg)
        res = run_inference_on_dataset(
            cfg, model, params, dataset, progress_every=0
        )
        results[kernel] = res
        img_ids = [dataset.id_to_img_map[i] for i in range(len(dataset))]
        with contextlib.redirect_stdout(io.StringIO()):
            stats[kernel] = COCOEvaluator(dataset.coco).evaluate(
                res, img_ids=img_ids
            )
        print(f"{kernel}: {len(res)} dets, AP {stats[kernel]['AP']:.4f}")

    # per-detection deltas (match by image/category/rank)
    def key(r):
        return (r["image_id"], r["category_id"])

    by = {}
    for k in ("gather", "pallas"):
        for r in sorted(results[k], key=lambda r: -r["score"]):
            by.setdefault(key(r), {}).setdefault(k, []).append(r)
    box_d, score_d, n_pairs = 0.0, 0.0, 0
    for v in by.values():
        a = v.get("gather", [])
        b = v.get("pallas", [])
        for ra, rb in zip(a, b):
            box_d = max(
                box_d,
                max(abs(x - y) for x, y in zip(ra["bbox"], rb["bbox"])),
            )
            score_d = max(score_d, abs(ra["score"] - rb["score"]))
            n_pairs += 1

    # overflow audit over eval-time roi sets
    from cpm_tpu.ops import pooler as P
    from cpm_tpu.ops.pallas.multilevel_pallas import window_overflow_mask

    overflow = dict(total=0, over=0)
    orig_call = P.Pooler.__call__

    def _accumulate(n_valid, n_over):
        overflow["total"] += int(n_valid)
        overflow["over"] += int(n_over)

    def audited(self, features, rois, roi_mask=None):
        # runs under jit — counts leave the trace via debug.callback
        if len(features) > 1:
            import jax as _jax
            import jax.numpy as jnp

            levels = P.assign_fpn_levels(
                rois[:, 1:5], self.k_min, self.k_max,
                self.canonical_scale, self.canonical_level,
            )
            over = window_overflow_mask(
                features, rois, levels - self.k_min, self.output_size,
                self.scales, self.sampling_ratio,
            )
            valid = (
                roi_mask.astype(bool)
                if roi_mask is not None
                else jnp.ones(over.shape[0], bool)
            )
            _jax.debug.callback(
                _accumulate,
                jnp.sum(valid.astype(jnp.int32)),
                jnp.sum((over & valid).astype(jnp.int32)),
            )
        return orig_call(self, features, rois, roi_mask)

    P.Pooler.__call__ = audited
    try:
        cfg = our_cfg()
        cfg.TPU.POOLER_KERNEL = "gather"
        cfg.TPU.COMPUTE_DTYPE = "float32"
        params = import_cpm_checkpoint(sd, cfg)
        model = build_model(cfg)
        # the audit leg needs jax.debug.callback, which tunneled TPU
        # backends don't support — pin it to the host CPU backend
        with jax.default_device(jax.devices("cpu")[0]):
            run_inference_on_dataset(
                cfg, model, params, dataset, progress_every=0
            )
    finally:
        P.Pooler.__call__ = orig_call

    rate = overflow["over"] / max(overflow["total"], 1)
    lines = [
        "# A/B of TPU-specific deviations (trained tiny-CPM checkpoint)",
        "",
        f"Backend: {backend}. Checkpoint: tools/parity_experiment.py "
        f"({args.ckpt}).",
        "",
        "## TPU.POOLER_KERNEL: pallas vs gather (full eval)",
        "",
        "| metric | gather | pallas | delta |",
        "|---|---|---|---|",
    ]
    for k in ("AP", "AP50", "AP75", "AR100"):
        g, p = stats["gather"][k], stats["pallas"][k]
        lines.append(f"| {k} | {g:.4f} | {p:.4f} | {p - g:+.4f} |")
    lines += [
        "",
        f"Per-detection (rank-matched, {n_pairs} pairs): max box delta "
        f"{box_d:.4f} px, max score delta {score_d:.5f}.",
        "",
        "## Pallas window-overflow rate (eval roi sets)",
        "",
        f"{overflow['over']} / {overflow['total']} pooled rois "
        f"({rate:.3%}) exceed the WIN-cell window. Overflowing rois are "
        "routed through the exact gather path (cpm_tpu/ops/pooler.py "
        "OVERFLOW_CAP), so this rate measures fallback traffic, not "
        "error.",
        "",
        "## TPU.APPROX_TOPK",
        "",
        "Inference always uses exact lax.top_k "
        "(cpm_tpu/modeling/model.py); approx_max_k applies only to the "
        "train-time proposal pre-NMS ranking, where the sampled-proposal "
        "distribution, not any single ranking, drives learning.",
    ]
    # carry forward the one-off adversarial-distribution audit recorded
    # in the existing doc (delimited block) — it is not re-measured here
    if os.path.exists(args.out):
        with open(args.out) as f:
            old = f.read()
        beg = old.find("<!-- adversarial-audit:begin")
        end = old.find("<!-- adversarial-audit:end -->")
        if beg != -1 and end != -1:
            block = old[beg:end + len("<!-- adversarial-audit:end -->")]
            lines += ["", block]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")
    print(json.dumps(dict(
        ap_gather=stats["gather"]["AP"], ap_pallas=stats["pallas"]["AP"],
        max_box_delta=box_d, max_score_delta=score_d,
        overflow_rate=rate,
    )))


if __name__ == "__main__":
    main()
