"""Gradient parity: same init, same batch — compare per-parameter grads.

The lockstep overlay (tools/parity_experiment.py) proves the LOSSES
match with identical weights; independent self-training still lags the
reference's trajectory (docs/PARITY_MAP.md). The remaining suspects are
(a) gradients and (b) initialization. This tool isolates (a): build the
reference torch Generalized_RCNN at its own init, import those exact
weights into our model, run one forward+backward on the same batch on
both sides, and map the torch grads through the same (linear:
transpose / permute / channel-swap) importer used for weights. Any
systematic gradient error — a wrong stop_gradient, a loss normalization
off by a batch factor, a detached branch — shows up as a per-parameter
cosine/norm-ratio mismatch.

Frozen params (AffineChannel everywhere, stem+layer1 under FREEZE_AT=2;
reference freezes by requires_grad, we freeze by optimizer label
solver/optimizer.py:33) are skipped — torch has no grads there.

Usage: JAX_PLATFORMS=cpu python tools/grad_parity.py [--step N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)

import numpy as np


def flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", type=int, default=0,
                    help="which deterministic batch to use")
    ap.add_argument("--ckpt", default=None,
                    help="optional torch checkpoint to start from "
                         "instead of the seed-0 init (e.g. "
                         "/tmp/cpm_parity_ref.pt for a trained point)")
    args = ap.parse_args()

    import torch

    from parity_experiment import (build_reference, jax_inputs,
                                   load_dataset, make_batches, our_cfg,
                                   torch_inputs)

    ref = build_reference()
    if args.ckpt:
        ref.load_state_dict(torch.load(args.ckpt, weights_only=True))
        print(f"loaded {args.ckpt}")
    cfg = our_cfg()
    dataset = load_dataset()
    batch = make_batches(dataset, args.step + 1)[args.step]

    # ---- torch forward+backward ----
    imlist, targets = torch_inputs(batch)
    out = ref(imlist, targets=targets)
    ref_losses = {k: float(v) for k, v in out["losses"].items()}
    total = sum(out["losses"].values())
    total.backward()

    # grads keyed like the state dict; frozen/unused params -> zeros so
    # the importer's key expectations are met
    grad_sd = {}
    named = dict(ref.named_parameters())
    for k, v in ref.state_dict().items():
        p = named.get(k)
        g = p.grad if (p is not None and p.grad is not None) else None
        grad_sd[k] = (g if g is not None else torch.zeros_like(v)) \
            .detach().numpy().copy()

    import jax
    import jax.numpy as jnp

    from cpm_tpu.modeling.model import build_model
    from cpm_tpu.solver.optimizer import classify_param
    from cpm_tpu.utils.weight_import import import_cpm_checkpoint

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = import_cpm_checkpoint(sd, cfg)
    # importer transforms are linear (transpose/permute/channel-swap;
    # fold_bn is identity here: reference affines carry no running
    # stats), so pushing the grad state-dict through it maps torch
    # grads into our param layout exactly.
    ref_grads = import_cpm_checkpoint(grad_sd, cfg)

    model = build_model(cfg)
    im, sz, gt = jax_inputs(batch)

    def total_loss(p):
        losses = model.apply(
            {"params": p}, im, sz, gt=gt, train=True,
            rngs={"sample": jax.random.PRNGKey(0)},
        )
        return sum(losses.values()), losses

    (tot, our_losses), grads = jax.jit(
        jax.value_and_grad(total_loss, has_aux=True)
    )(params)

    print("losses (ref | ours):")
    for k in sorted(ref_losses):
        o = float(our_losses.get(k, float("nan")))
        print(f"  {k:28s} {ref_losses[k]:10.6f} | {o:10.6f}")
    print(f"  {'TOTAL':28s} {sum(ref_losses.values()):10.6f} | "
          f"{float(tot):10.6f}")

    ours_flat = dict(flatten(jax.tree.map(np.asarray, grads)))
    refs_flat = dict(flatten(ref_grads))
    freeze_at = int(cfg.BACKBONE.RESNET.FREEZE_AT)

    rows = []
    for path, og in ours_flat.items():
        label = classify_param(list(path), freeze_at)
        if label == "frozen":
            continue
        rg = refs_flat.get(path)
        if rg is None:
            rows.append((path, None, None, None))
            continue
        og = np.asarray(og, np.float64).ravel()
        rg = np.asarray(rg, np.float64).ravel()
        no, nr = np.linalg.norm(og), np.linalg.norm(rg)
        cos = float(og @ rg / (no * nr)) if no > 0 and nr > 0 else (
            1.0 if no == nr else 0.0)
        ratio = float(no / nr) if nr > 0 else (np.inf if no > 0 else 1.0)
        rows.append((path, cos, ratio, (no, nr)))

    bad = [r for r in rows if r[1] is None or r[1] < 0.999
           or not (0.99 < r[2] < 1.01)]
    bad.sort(key=lambda r: (r[1] if r[1] is not None else -2))
    print(f"\ncompared {len(rows)} param tensors "
          f"({len(rows) - len(bad)} match at cos>0.999, "
          f"norm ratio within 1%)")
    if bad:
        print("worst mismatches (cos, |ours|/|ref|, norms):")
        for path, cos, ratio, norms in bad[:40]:
            name = "/".join(path)
            if cos is None:
                print(f"  {name:60s} MISSING on ref side")
            else:
                print(f"  {name:60s} cos={cos:+.4f} ratio={ratio:8.4f} "
                      f"(|o|={norms[0]:.3e} |r|={norms[1]:.3e})")
    else:
        print("ALL GRADIENTS MATCH.")


if __name__ == "__main__":
    main()
