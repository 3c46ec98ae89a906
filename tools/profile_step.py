#!/usr/bin/env python
"""Attribute CPM train-step time across pipeline stages on the real chip.

Times progressively larger jitted slices of the flagship train config
(R-50-FPN CPM, batch 2, 832x1344) so the per-stage cost is the difference
between consecutive rows. Run: python tools/profile_step.py [--tiny]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def timed(name, fn, *args, iters=4):
    import jax

    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    steady = (time.time() - t0) / iters
    print(f"{name:44s} compile {compile_s:7.1f}s   steady {steady*1e3:9.1f} ms")
    return steady


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--height", type=int, default=832)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--part", default="all")
    ap.add_argument("--dtype", default=None, help="override TPU.COMPUTE_DTYPE")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cpm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from __graft_entry__ import _flagship_cfg
    from cpm_tpu.data.synthetic import synthetic_batch
    from cpm_tpu.engine.train import (
        batch_gt,
        create_train_state,
        make_train_step,
    )
    from cpm_tpu.modeling.model import _roi_scales
    from cpm_tpu.solver import build_optimizer, make_lr_fn

    cfg = _flagship_cfg(tiny=False)
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 2000
    if args.dtype:
        cfg.TPU.COMPUTE_DTYPE = args.dtype
    print("compute dtype:", cfg.TPU.COMPUTE_DTYPE)

    batch = synthetic_batch(
        batch_size=args.batch, height=args.height, width=args.width,
        max_gt=32, num_classes=81, seed=0,
    )
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    params = state.params
    print(f"batch {args.batch} @ {args.height}x{args.width}")

    images, sizes = batch["images"], batch["image_sizes"]
    gt = batch_gt(batch)
    rng = jax.random.PRNGKey(7)

    def bound(p):
        return model.bind({"params": p}, rngs={"sample": rng})

    want = args.part

    if want in ("all", "backbone"):
        @jax.jit
        def backbone_fwd(p, images):
            return bound(p)._features(images)

        timed("backbone+fpn fwd", backbone_fwd, params, images)

    if want in ("all", "rpn"):
        @jax.jit
        def rpn_fwd(p, images, sizes):
            m = bound(p)
            feats = m._features(images)
            objectness, box_reg = m.rpn_head(feats)
            return objectness, box_reg

        timed("backbone+fpn+rpn-head fwd", rpn_fwd, params, images, sizes)

        @jax.jit
        def rpn_select(p, images, sizes, gt):
            m = bound(p)
            c = m.cfg
            feats = m._features(images)
            objectness, box_reg = m.rpn_head(feats)
            layout = m._anchor_layout(feats)
            from cpm_tpu.modeling.rpn import select_proposals

            return select_proposals(
                layout, objectness, box_reg, sizes,
                gt_boxes=gt["boxes"], gt_mask=gt["mask"],
                pre_nms_top_n=c.RPN.PRE_NMS_TOP_N_TRAIN,
                post_nms_top_n=c.RPN.POST_NMS_TOP_N_TRAIN,
                nms_thresh=c.RPN.NMS_THRESH,
                min_size=c.RPN.MIN_SIZE,
                fpn_post_nms_top_n=c.RPN.FPN_POST_NMS_TOP_N_TRAIN,
                fpn_post_nms_per_batch=c.RPN.FPN_POST_NMS_PER_BATCH,
                is_train=True,
                box_coder=m.rpn_box_coder,
            )

        timed("... + proposal selection", rpn_select, params, images, sizes, gt)

    if want in ("all", "fwd"):
        @jax.jit
        def full_fwd(p, images, sizes, gt):
            losses = model.apply(
                {"params": p}, images, sizes, gt=gt, train=True,
                rngs={"sample": rng},
            )
            return sum(losses.values())

        timed("full train fwd (loss)", full_fwd, params, images, sizes, gt)

    if want in ("head",):
        # bisect the RoI head: cls branch, grid cascade, rescore
        @jax.jit
        def feats_and_props(p, images, sizes, gt):
            m = bound(p)
            c = m.cfg
            feats = m._features(images)
            objectness, box_reg = m.rpn_head(feats)
            layout = m._anchor_layout(feats)
            from cpm_tpu.modeling.rpn import select_proposals

            props, _, pmask = select_proposals(
                layout,
                [jax.lax.stop_gradient(o) for o in objectness],
                [jax.lax.stop_gradient(b) for b in box_reg],
                sizes,
                gt_boxes=gt["boxes"], gt_mask=gt["mask"],
                pre_nms_top_n=c.RPN.PRE_NMS_TOP_N_TRAIN,
                post_nms_top_n=c.RPN.POST_NMS_TOP_N_TRAIN,
                nms_thresh=c.RPN.NMS_THRESH,
                min_size=c.RPN.MIN_SIZE,
                fpn_post_nms_top_n=c.RPN.FPN_POST_NMS_TOP_N_TRAIN,
                fpn_post_nms_per_batch=c.RPN.FPN_POST_NMS_PER_BATCH,
                is_train=True,
                box_coder=m.rpn_box_coder,
            )
            return feats, props, pmask

        feats, props, pmask = feats_and_props(params, images, sizes, gt)
        jax.block_until_ready(feats)

        def head_slice(which):
            def fn(p, feats, props, pmask, gt):
                m = bound(p)
                h = m.roi_head
                n_lvl = (
                    m.cfg.FPN.ROI_MAX_LEVEL - m.cfg.FPN.ROI_MIN_LEVEL + 1
                )
                roi_feats = [f for f in feats[:n_lvl]]
                sampled, loss_cls = h._train_cls(
                    roi_feats, props, pmask, gt
                )
                if which == "cls":
                    return loss_cls
                gb, gm, lg = h._train_cascade(feats, sampled, gt, sizes)
                if which == "cascade":
                    return lg
                return h._train_rescore(roi_feats, sampled, gb, gm, gt)

            return jax.jit(fn)

        timed("head: cls branch", head_slice("cls"),
              params, feats, props, pmask, gt)
        timed("head: cls+grid cascade", head_slice("cascade"),
              params, feats, props, pmask, gt)
        timed("head: cls+cascade+rescore", head_slice("rescore"),
              params, feats, props, pmask, gt)

    if want in ("headgrad",):
        feats, props, pmask = None, None, None

        def grad_slice(which):
            def fn(p, images, sizes, gt):
                def loss(p):
                    m = bound(p)
                    c = m.cfg
                    from cpm_tpu.modeling.rpn import select_proposals

                    fs = m._features(images)
                    objectness, box_reg = m.rpn_head(fs)
                    layout = m._anchor_layout(fs)
                    pr, _, pm = select_proposals(
                        layout,
                        [jax.lax.stop_gradient(o) for o in objectness],
                        [jax.lax.stop_gradient(b) for b in box_reg],
                        sizes,
                        gt_boxes=gt["boxes"], gt_mask=gt["mask"],
                        pre_nms_top_n=c.RPN.PRE_NMS_TOP_N_TRAIN,
                        post_nms_top_n=c.RPN.POST_NMS_TOP_N_TRAIN,
                        nms_thresh=c.RPN.NMS_THRESH,
                        min_size=c.RPN.MIN_SIZE,
                        fpn_post_nms_top_n=c.RPN.FPN_POST_NMS_TOP_N_TRAIN,
                        fpn_post_nms_per_batch=c.RPN.FPN_POST_NMS_PER_BATCH,
                        is_train=True,
                        box_coder=m.rpn_box_coder,
                    )
                    h = m.roi_head
                    n_lvl = c.FPN.ROI_MAX_LEVEL - c.FPN.ROI_MIN_LEVEL + 1
                    roi_feats = [f for f in fs[:n_lvl]]
                    if which == "backbone":
                        return sum(jnp.sum(f) for f in fs)
                    sampled, lc = h._train_cls(roi_feats, pr, pm, gt)
                    if which == "cls":
                        return sum(lc.values())
                    gb, gm, lg = h._train_cascade(fs, sampled, gt, sizes)
                    if which == "cascade":
                        return sum(lc.values()) + sum(lg.values())
                    lr_ = h._train_rescore(roi_feats, sampled, gb, gm, gt)
                    return (
                        sum(lc.values()) + sum(lg.values())
                        + sum(lr_.values())
                    )

                g = jax.grad(loss)(p)
                return jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
                    g, 0.0,
                )

            return jax.jit(fn)

        for which in ("backbone", "cls", "cascade", "rescore"):
            timed(f"grad: {which}", grad_slice(which),
                  params, images, sizes, gt, iters=2)

    if want in ("rpngrad",):
        from cpm_tpu.modeling.rpn import rpn_losses

        def fn(p, images, sizes, gt):
            def loss(p):
                m = bound(p)
                c = m.cfg
                fs = m._features(images)
                objectness, box_reg = m.rpn_head(fs)
                layout = m._anchor_layout(fs)
                lo, lb = rpn_losses(
                    layout, objectness, box_reg, sizes,
                    gt["boxes"], gt["mask"], jax.random.PRNGKey(3),
                    box_coder=m.rpn_box_coder,
                )
                return lo + lb

            g = jax.grad(loss)(p)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
                g, 0.0,
            )

        timed("grad: rpn losses", jax.jit(fn), params, images, sizes, gt,
              iters=2)

    if want in ("stepgrad", "stepopt"):
        from cpm_tpu.engine.train import batch_gt as _bgt
        from cpm_tpu.utils.amp import cast_floating_to, compute_dtype

        cdtype = compute_dtype(cfg)
        rng2 = jax.random.PRNGKey(11)

        def loss_fn(p, batch):
            pc = cast_floating_to(p, cdtype)
            losses = model.apply(
                {"params": pc}, batch["images"].astype(cdtype),
                batch["image_sizes"], gt=_bgt(batch), train=True,
                rngs={"sample": rng2},
            )
            return sum(jax.tree_util.tree_leaves(losses))

        def grad_only(p, batch):
            _, g = jax.value_and_grad(loss_fn)(p, batch)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
                g, 0.0,
            )

        if want == "stepgrad":
            timed("train-loss grad (no optimizer)", jax.jit(grad_only),
                  params, batch, iters=2)
        else:
            from cpm_tpu.solver import build_optimizer, make_lr_fn

            tx2 = build_optimizer(cfg, params, make_lr_fn(cfg.SOLVER))
            opt_state = tx2.init(params)

            def with_opt(p, os_, batch):
                _, g = jax.value_and_grad(loss_fn)(p, batch)
                updates, new_os = tx2.update(g, os_, p)
                newp = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
                return jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
                    newp, 0.0,
                ), new_os

            timed("train-loss grad + optimizer", jax.jit(with_opt),
                  params, opt_state, batch, iters=2)

    if want in ("all", "step"):
        train_step = jax.jit(make_train_step(cfg, model, tx))
        t0 = time.time()
        s2, metrics = train_step(state, batch)
        jax.block_until_ready(metrics)
        print(f"{'full train step (fwd+bwd+sgd)':44s} compile {time.time()-t0:7.1f}s")
        t0 = time.time()
        iters = 4
        for _ in range(iters):
            state, metrics = train_step(state, batch)
        jax.block_until_ready(metrics)
        steady = (time.time() - t0) / iters
        print(f"{'full train step (fwd+bwd+sgd)':44s} steady  {steady*1e3:9.1f} ms "
              f"= {args.batch/steady:.3f} img/s")


if __name__ == "__main__":
    main()
