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

    # A/B legs: each deviation toggled against the default-path baseline.
    #   gather      — pure-XLA pooler, cv2 eval resize (the new default)
    #   pallas      — the default TPU pooler kernel
    #   pallas_f32  — pallas + TPU.EVAL_POOLER_DTYPE=float32 (the knob
    #                 that retires the bf16 pooler tie-flip)
    #   resize_pil  — gather + legacy PIL-antialias eval resize (the
    #                 retired deviation, kept to quantify its AP impact)
    import time as _time

    legs = {
        "gather": dict(TPU_POOLER="gather"),
        "pallas": dict(TPU_POOLER="pallas"),
        "pallas_f32": dict(TPU_POOLER="pallas", POOL_DTYPE="float32"),
        "resize_pil": dict(TPU_POOLER="gather", RESIZE="pil"),
    }
    results = {}
    stats = {}
    wall = {}
    for name, leg in legs.items():
        cfg = our_cfg()
        cfg.TPU.POOLER_KERNEL = leg["TPU_POOLER"]
        cfg.TPU.EVAL_POOLER_DTYPE = leg.get("POOL_DTYPE", "compute")
        cfg.TPU.EVAL_RESIZE = leg.get("RESIZE", "cv2")
        cfg.TPU.COMPUTE_DTYPE = (
            "bfloat16" if backend == "tpu" else "float32"
        )
        params = import_cpm_checkpoint(sd, cfg)
        model = build_model(cfg)
        t0 = _time.time()
        res = run_inference_on_dataset(
            cfg, model, params, dataset, progress_every=0
        )
        wall[name] = (_time.time() - t0) / max(len(dataset), 1)
        results[name] = res
        img_ids = [dataset.id_to_img_map[i] for i in range(len(dataset))]
        with contextlib.redirect_stdout(io.StringIO()):
            stats[name] = COCOEvaluator(dataset.coco).evaluate(
                res, img_ids=img_ids
            )
        print(f"{name}: {len(res)} dets, AP {stats[name]['AP']:.4f}, "
              f"{wall[name] * 1e3:.0f} ms/img (incl host)")

    # per-detection deltas (match by image/category/rank)
    def key(r):
        return (r["image_id"], r["category_id"])

    def pair_delta(a_name, b_name):
        by = {}
        for k in (a_name, b_name):
            for r in sorted(results[k], key=lambda r: -r["score"]):
                by.setdefault(key(r), {}).setdefault(k, []).append(r)
        box_d, score_d, n_pairs = 0.0, 0.0, 0
        for v in by.values():
            a = v.get(a_name, [])
            b = v.get(b_name, [])
            for ra, rb in zip(a, b):
                box_d = max(
                    box_d,
                    max(abs(x - y) for x, y in zip(ra["bbox"], rb["bbox"])),
                )
                score_d = max(score_d, abs(ra["score"] - rb["score"]))
                n_pairs += 1
        return box_d, score_d, n_pairs

    box_d, score_d, n_pairs = pair_delta("gather", "pallas")
    f32_box_d, f32_score_d, f32_pairs = pair_delta("gather", "pallas_f32")
    rs_box_d, rs_score_d, rs_pairs = pair_delta("gather", "resize_pil")

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
        "## TPU.EVAL_POOLER_DTYPE=float32 (pallas, f32 accumulation)",
        "",
        "| metric | gather | pallas_f32 | delta |",
        "|---|---|---|---|",
    ]
    for k in ("AP", "AP50", "AP75", "AR100"):
        g, p = stats["gather"][k], stats["pallas_f32"][k]
        lines.append(f"| {k} | {g:.4f} | {p:.4f} | {p - g:+.4f} |")
    lines += [
        "",
        f"Per-detection ({f32_pairs} pairs): max box delta "
        f"{f32_box_d:.4f} px, max score delta {f32_score_d:.5f}. "
        f"Eval wall: compute-dtype {wall['pallas'] * 1e3:.0f} ms/img vs "
        f"f32-pool {wall['pallas_f32'] * 1e3:.0f} ms/img.",
        "",
        "## TPU.EVAL_RESIZE: cv2 (reference-exact, default) vs legacy pil",
        "",
        "| metric | cv2 | pil | delta (pil - cv2) |",
        "|---|---|---|---|",
    ]
    for k in ("AP", "AP50", "AP75", "AR100"):
        g, p = stats["gather"][k], stats["resize_pil"][k]
        lines.append(f"| {k} | {g:.4f} | {p:.4f} | {p - g:+.4f} |")
    lines += [
        "",
        f"Per-detection ({rs_pairs} pairs): max box delta "
        f"{rs_box_d:.4f} px, max score delta {rs_score_d:.5f}. The cv2 "
        "semantics (INTER_LINEAR on the f32 image at one isotropic "
        "im_scale, cvRound dsize — reference test.py:339-360) are now "
        "the eval default; the PIL-antialias eval resize deviation is "
        "RETIRED (tests/test_cv2_resize.py oracles the implementation "
        "against real cv2).",
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
