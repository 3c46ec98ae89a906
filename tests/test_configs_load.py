"""Every shipped config must merge cleanly, build, and trace a full train
step (forward + backward) end-to-end.

Tracing via jax.eval_shape exercises the entire program the way jit does —
every module wires up, every shape checks out, gradients flow — without
paying XLA compile time for 60 configs on the CPU test rig. Real execution
of the flagship CPM step is covered by test_end_to_end.py and
test_multichip.py.
"""

import glob
import os

import jax
import pytest

from cpm_tpu.config import get_default_cfg, merge_cfg_from_file, merge_cfg_from_list
from cpm_tpu.data.synthetic import synthetic_batch
from cpm_tpu.modeling.model import build_model

CFGS = sorted(glob.glob("cfgs/**/*.yaml", recursive=True))

# ids must be unique: many reference configs share a basename across dirs
_IDS = [os.path.relpath(p, "cfgs").replace("/", ":") for p in CFGS]


def _tiny_overrides(cfg):
    """Shrink widths/counts so tracing is fast; leaves the config's model
    topology (stages, flags, heads) untouched."""
    cfg.MODEL.NUM_CLASSES = 5
    cfg.BACKBONE.RESNET.LAYERS = (1, 1, 1, 1)
    cfg.BACKBONE.RESNET.BASE_PLANES = 8
    cfg.BACKBONE.RESNEXT.LAYERS = (1, 1, 1, 1)
    cfg.FPN.DIM = 16
    cfg.FAST_RCNN.MLP_HEAD.MLP_DIM = 32  # cascade heads read FAST_RCNN.*
    cfg.GRID_RCNN.MLP_HEAD.MLP_DIM = 32
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 32
    cfg.RPN.POST_NMS_TOP_N_TRAIN = 16
    cfg.RPN.FPN_POST_NMS_TOP_N_TRAIN = 24
    cfg.RPN.PRE_NMS_TOP_N_TEST = 16
    cfg.RPN.POST_NMS_TOP_N_TEST = 8
    cfg.RPN.FPN_POST_NMS_TOP_N_TEST = 12
    cfg.FAST_RCNN.BATCH_SIZE_PER_IMAGE = 16
    cfg.FAST_RCNN.DETECTIONS_PER_IMG = 8
    cfg.GRID_RCNN.BATCH_SIZE_PER_IMAGE = 16
    cfg.GRID_RCNN.MAX_SAMPLE_NUM_GRID = 4
    cfg.GRID_RCNN.TEST_MAX_DETECTIONS = 8
    cfg.GRID_RCNN.GRID_HEAD.NUM_CONVS = 2
    cfg.GRID_RCNN.GRID_HEAD.POINT_FEAT_CHANNELS = 4
    return cfg


def _model_signature(cfg):
    """Keys that change the traced program (solver/data/ckpt don't)."""
    import json

    def section(s):
        def conv(v):
            if isinstance(v, dict):
                return {k: conv(x) for k, x in sorted(v.items())}
            if isinstance(v, (list, tuple)):
                return [conv(x) for x in v]
            return v

        return conv(dict(getattr(cfg, s)))

    return json.dumps(
        {
            s: section(s)
            for s in (
                "MODEL", "BACKBONE", "FPN", "RPN",
                "FAST_RCNN", "GRID_RCNN", "CASCADE_RCNN",
            )
        },
        sort_keys=True,
    )


@pytest.mark.parametrize("path", CFGS, ids=_IDS)
def test_config_merges_and_builds(path):
    cfg = get_default_cfg()
    merge_cfg_from_file(path, target=cfg)
    model = build_model(cfg)
    assert model is not None


def _trace_train_step(cfg):
    model = build_model(cfg)
    batch = synthetic_batch(
        batch_size=1, height=64, width=64, max_gt=3,
        num_classes=cfg.MODEL.NUM_CLASSES, seed=0,
    )
    gt = dict(
        boxes=batch["gt_boxes"], labels=batch["gt_labels"],
        mask=batch["gt_mask"],
    )
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}

    def init_and_grad():
        variables = model.init(
            rngs, batch["images"], batch["image_sizes"], gt=gt, train=True
        )

        def loss_fn(p):
            losses = model.apply(
                {"params": p}, batch["images"], batch["image_sizes"],
                gt=gt, train=True, rngs={"sample": jax.random.PRNGKey(2)},
            )
            return sum(jax.tree_util.tree_leaves(losses))

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        return variables["params"], loss, grads

    params, loss, grads = jax.eval_shape(init_and_grad)
    assert loss.shape == ()
    # every param receives a gradient of its own shape
    jax.tree_util.tree_map(
        lambda p, g: (p.shape, p.dtype) == (g.shape, g.dtype) or
        pytest.fail(f"grad mismatch {p.shape} vs {g.shape}"),
        params, grads,
    )


def test_every_config_topology_traces_train_step():
    """Trace fwd+bwd once per unique model topology across all configs
    (many configs differ only in solver/schedule/dataset keys)."""
    seen = {}
    for path in CFGS:
        cfg = get_default_cfg()
        merge_cfg_from_file(path, target=cfg)
        _tiny_overrides(cfg)
        sig = _model_signature(cfg)
        seen.setdefault(sig, path)
    failures = []
    for sig, path in seen.items():
        cfg = get_default_cfg()
        merge_cfg_from_file(path, target=cfg)
        _tiny_overrides(cfg)
        try:
            _trace_train_step(cfg)
        except Exception as e:  # noqa: BLE001 — collect all, report once
            failures.append(f"{path}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


def test_reference_config_family_complete():
    """All 55 reference YAMLs exist at their reference-relative paths."""
    ref = sorted(
        os.path.relpath(p, "/root/reference/cfgs")
        for p in glob.glob("/root/reference/cfgs/**/*.yaml", recursive=True)
    )
    assert len(ref) == 55
    missing = [r for r in ref if not os.path.exists(os.path.join("cfgs", r))]
    assert not missing, f"missing reference configs: {missing}"


def test_cli_opts_override():
    cfg = get_default_cfg()
    merge_cfg_from_list(
        ["SOLVER.BASE_LR", "0.01", "MODEL.GRID_ON", "True"], target=cfg
    )
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.MODEL.GRID_ON is True
