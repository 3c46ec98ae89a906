"""CPM Grid-Cascade R-CNN end-to-end smoke tests (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpm_tpu.config import get_default_cfg
from cpm_tpu.modeling.model import build_model


def _cpm_cfg(stage_num=2, iou_helper=True, rescore=True, cascade=True):
    cfg = get_default_cfg()
    cfg.MODEL.FPN_ON = True
    cfg.MODEL.FASTER_RCNN = False
    cfg.MODEL.GRID_ON = True
    cfg.MODEL.NUM_CLASSES = 5
    cfg.BACKBONE.RESNET.LAYERS = (1, 1, 1, 1)
    cfg.BACKBONE.RESNET.BASE_PLANES = 8
    cfg.FPN.DIM = 32
    cfg.FAST_RCNN.MLP_HEAD.MLP_DIM = 64
    cfg.GRID_RCNN.MLP_HEAD.MLP_DIM = 64
    cfg.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 64
    cfg.RPN.POST_NMS_TOP_N_TRAIN = 32
    cfg.RPN.FPN_POST_NMS_TOP_N_TRAIN = 48
    cfg.RPN.PRE_NMS_TOP_N_TEST = 32
    cfg.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.RPN.FPN_POST_NMS_TOP_N_TEST = 24
    g = cfg.GRID_RCNN
    g.CASCADE_MAPPING_ON = cascade
    g.IOU_HELPER = iou_helper
    g.IOU_HELPER_MERGE = True
    g.RESCORE_ON = rescore
    g.BATCH_SIZE_PER_IMAGE = 32
    g.MAX_SAMPLE_NUM_GRID = 8
    g.TEST_MAX_DETECTIONS = 16
    g.GRID_HEAD.NUM_CONVS = 2
    g.GRID_HEAD.POINT_FEAT_CHANNELS = 8
    o = g.CASCADE_MAPPING_OPTION
    o.STAGE_NUM = stage_num
    o.TEST_STAGE = stage_num
    o.STAGE_WEIGHTS = [1.0, 0.5, 0.25][:stage_num]
    o.STAGE_MAPPING_RATIO = [1.0, 0.5, 0.25][:stage_num]
    o.FG_IOU_THRESHOLD = [0.5, 0.6, 0.7][:stage_num]
    o.BG_IOU_THRESHOLD = [0.5, 0.6, 0.7][:stage_num]
    o.GRID_NUM = [9, 9, 9][:stage_num]
    return cfg


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    image_sizes = jnp.array([[64, 64], [56, 48]])
    gt = dict(
        boxes=jnp.array(
            [
                [[4, 4, 34, 34], [10, 12, 44, 44], [0, 0, 0, 0]],
                [[8, 8, 30, 30], [0, 0, 0, 0], [0, 0, 0, 0]],
            ],
            jnp.float32,
        ),
        labels=jnp.array([[1, 3, 0], [2, 0, 0]], jnp.int32),
        mask=jnp.array([[True, True, False], [True, False, False]]),
    )
    return images, image_sizes, gt


def test_cpm_train_losses_and_grads(batch):
    images, image_sizes, gt = batch
    cfg = _cpm_cfg()
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, image_sizes, gt=gt, train=True,
    )
    losses = model.apply(
        variables, images, image_sizes, gt=gt, train=True,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    expect = {
        "loss_objectness", "loss_rpn_box_reg", "loss_classifier",
        "loss_grid_1", "loss_grid_2", "loss_iou_2", "loss_rescore",
    }
    assert set(losses) == expect, set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    def loss_fn(params):
        out = model.apply(
            {"params": params}, images, image_sizes, gt=gt, train=True,
            rngs={"sample": jax.random.PRNGKey(2)},
        )
        return sum(out.values())

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # grid head params must receive gradient
    gh = grads["roi_head"]["grid_head_0"]
    total = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(gh)
    )
    assert total > 0


def test_cpm_eval_detections(batch):
    images, image_sizes, gt = batch
    cfg = _cpm_cfg()
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, image_sizes, gt=gt, train=True,
    )
    dets = model.apply(variables, images, image_sizes, train=False)
    assert dets.boxes.shape == (2, 16, 4)
    assert dets.scores.shape == (2, 16)
    # all valid boxes inside their image
    for b in range(2):
        bb = np.asarray(dets.boxes[b][np.asarray(dets.mask[b])])
        if len(bb):
            assert (bb[:, 2] <= float(image_sizes[b, 1])).all()
            assert (bb[:, 3] <= float(image_sizes[b, 0])).all()


def test_single_stage_grid_rcnn(batch):
    images, image_sizes, gt = batch
    cfg = _cpm_cfg(cascade=False, iou_helper=False, rescore=False)
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        images, image_sizes, gt=gt, train=True,
    )
    losses = model.apply(
        variables, images, image_sizes, gt=gt, train=True,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    assert "loss_grid_1" in losses and "loss_classifier" in losses
    assert "loss_rescore" not in losses
    dets = model.apply(variables, images, image_sizes, train=False)
    assert dets.boxes.shape == (2, 16, 4)


def test_test_stage_below_stage_num_skips_ism(batch):
    """TEST_STAGE < STAGE_NUM runs only the first TEST_STAGE grid decodes
    and never applies ISM — matching the reference, where the loop breaks
    after the post-processor of stage TEST_STAGE-1
    (grid_cascade_rcnn.py:175-186) and ISM fires only in the stage
    STAGE_NUM-1 post-processor (inference.py:172)."""
    images, image_sizes, gt = batch
    cfg3 = _cpm_cfg(stage_num=3, iou_helper=True, rescore=False)
    model3 = build_model(cfg3)
    variables = jax.jit(
        lambda: model3.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            images, image_sizes, gt=gt, train=True,
        )
    )()

    cfg2 = _cpm_cfg(stage_num=3, iou_helper=True, rescore=False)
    cfg2.GRID_RCNN.CASCADE_MAPPING_OPTION.TEST_STAGE = 2
    model2 = build_model(cfg2)  # same params, fewer test stages

    dets3 = model3.apply(variables, images, image_sizes, train=False)
    dets2 = model2.apply(variables, images, image_sizes, train=False)

    # the cls branch alone (no grid refinement) gives the pre-ISM scores
    cfg0 = _cpm_cfg(stage_num=3, iou_helper=True, rescore=False)
    cfg0.GRID_RCNN.CASCADE_MAPPING_OPTION.TEST_STAGE = 0
    dets0 = build_model(cfg0).apply(variables, images, image_sizes,
                                    train=False)

    # TEST_STAGE=2: boxes refined (differ from cls-stage boxes) but ISM
    # never fires -> scores identical to the cls-stage scores
    np.testing.assert_allclose(
        np.asarray(dets2.scores), np.asarray(dets0.scores), rtol=1e-6
    )
    assert not np.allclose(
        np.asarray(dets2.boxes)[np.asarray(dets2.mask)],
        np.asarray(dets0.boxes)[np.asarray(dets0.mask)],
    )
    # TEST_STAGE=3 (== STAGE_NUM): ISM multiplies scores -> they change
    assert not np.allclose(
        np.asarray(dets3.scores), np.asarray(dets0.scores)
    )


def test_tower_buckets_match_unbucketed(batch):
    """Bucketed grid towers (nn.switch over static slice sizes, with
    remat'd branches) are a pure shape optimization.

    Two pins, matched to what each can measure sharply:

    1. Losses bucketed-vs-unbucketed at rtol 1e-3. Grad-level
       comparison between those two paths is NOT meaningful at tight
       tolerances: per-channel GroupNorm after every tower conv makes
       conv biases exact null directions and projects kernel grads
       onto near-cancelling residuals, where the two compilations'
       reduction-order drift is amplified ~1000x by 1/sigma (measured:
       up to 6e-2 abs on a 4.5e-2-norm leaf, while the global grad
       rel-L2 stays 4e-3). A real bucketing bug (wrong slice, leaked
       padding) moves the masked losses by whole percents.
    2. Grads remat-vs-no-remat on the SAME bucketed graph at 1e-5:
       remat is mathematically the identity, the forward graphs are
       identical, and the measured drift is 9e-8 global — so this pin
       is tight and directly validates the nn.remat(branch) wiring
       (wrong residuals/rng threading would blow it up wholesale).
    """
    images, image_sizes, gt = batch
    import cpm_tpu.modeling.roi_heads.grid_cascade_head as gch

    def run(buckets, remat=True, want_grads=True):
        orig_remat = gch.nn.remat
        if not remat:
            gch.nn.remat = lambda f, **kw: f
        try:
            cfg = _cpm_cfg()
            cfg.TPU.TOWER_BUCKETS = buckets
            model = build_model(cfg)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "sample": jax.random.PRNGKey(1)},
                images, image_sizes, gt=gt, train=True,
            )

            def loss_fn(params):
                out = model.apply(
                    {"params": params}, images, image_sizes, gt=gt,
                    train=True, rngs={"sample": jax.random.PRNGKey(2)},
                )
                return sum(out.values()), out

            if not want_grads:
                _, losses = loss_fn(variables["params"])
                return losses, None
            (_, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(variables["params"])
            return losses, grads
        finally:
            gch.nn.remat = orig_remat

    # S = MAX_SAMPLE_NUM_GRID = 8 here, so (2, 4) exercises the switch
    # (k_list = [2, 4, 8]) while () runs the plain full-S path
    losses_b, grads_b = run((2, 4), remat=True)
    losses_nr, grads_nr = run((2, 4), remat=False)
    losses_u, _ = run((), want_grads=False)

    assert set(losses_b) == set(losses_u)
    for k in losses_u:
        np.testing.assert_allclose(
            float(losses_b[k]), float(losses_u[k]), rtol=1e-3, atol=1e-6,
            err_msg=k,
        )

    flat_b = jax.tree_util.tree_leaves_with_path(grads_b)
    flat_nr = dict(
        (jax.tree_util.keystr(p), g)
        for p, g in jax.tree_util.tree_leaves_with_path(grads_nr)
    )
    for k in losses_b:
        np.testing.assert_allclose(
            float(losses_b[k]), float(losses_nr[k]), rtol=1e-6, atol=1e-8,
            err_msg=f"remat changed forward {k}",
        )
    for p, g in flat_b:
        a = np.asarray(g, np.float64)
        b = np.asarray(flat_nr[jax.tree_util.keystr(p)], np.float64)
        diff = np.linalg.norm(a - b)
        rel = diff / (np.linalg.norm(b) + 1e-8)
        assert rel < 1e-4 or diff < 1e-5, (
            f"remat grad drift {jax.tree_util.keystr(p)}: "
            f"rel L2 {rel:.2e}, abs {diff:.2e}"
        )
