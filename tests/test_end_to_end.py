"""Full-pipeline integration test: synthetic COCO on disk -> TrainLoader ->
jitted train steps -> checkpoint save/restore -> inference engine ->
COCOEvaluator. Uses the tiny Fast R-CNN config for speed."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from cpm_tpu.config import get_default_cfg
from cpm_tpu.data import catalog
from cpm_tpu.data.coco import COCODataset, build_dataset
from cpm_tpu.data.loader import TestLoader, TrainLoader
from cpm_tpu.engine.checkpoint import CheckPointer
from cpm_tpu.engine.test import evaluate_results, run_inference_on_dataset
from cpm_tpu.engine.train import (
    create_train_state,
    jit_train_step,
    make_train_step,
)
from cpm_tpu.parallel.mesh import make_mesh, shard_batch


def _make_coco_dir(tmp_path, n_images=8):
    """Tiny on-disk COCO dataset: colored rectangles on black."""
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        h, w = 60 + 4 * (i % 3), 80 - 4 * (i % 2)
        arr = np.zeros((h, w, 3), np.uint8)
        n_obj = rng.randint(1, 4)
        for _ in range(n_obj):
            x1 = rng.randint(0, w - 20)
            y1 = rng.randint(0, h - 20)
            bw = rng.randint(10, min(20, w - x1))
            bh = rng.randint(10, min(20, h - y1))
            cat = int(rng.randint(1, 4))
            arr[y1 : y1 + bh, x1 : x1 + bw] = [80 * cat, 40 * cat, 255 - 60 * cat]
            annotations.append(
                dict(
                    id=ann_id, image_id=i + 1, category_id=cat,
                    bbox=[float(x1), float(y1), float(bw), float(bh)],
                    area=float(bw * bh), iscrowd=0,
                )
            )
            ann_id += 1
        fname = f"{i:06d}.jpg"
        Image.fromarray(arr).save(img_dir / fname)
        images.append(dict(id=i + 1, file_name=fname, width=w, height=h))
    ann = dict(
        images=images,
        annotations=annotations,
        categories=[dict(id=c, name=f"c{c}") for c in (1, 2, 3)],
    )
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps(ann))
    return str(img_dir), str(ann_file)


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    cfg = get_default_cfg()
    cfg.MODEL.FPN_ON = True
    cfg.MODEL.FASTER_RCNN = True
    cfg.MODEL.NUM_CLASSES = 4
    cfg.BACKBONE.RESNET.LAYERS = (1, 1, 1, 1)
    cfg.BACKBONE.RESNET.BASE_PLANES = 8
    cfg.FPN.DIM = 32
    cfg.FAST_RCNN.MLP_HEAD.MLP_DIM = 64
    cfg.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 64
    cfg.RPN.POST_NMS_TOP_N_TRAIN = 32
    cfg.RPN.FPN_POST_NMS_TOP_N_TRAIN = 48
    cfg.RPN.PRE_NMS_TOP_N_TEST = 32
    cfg.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.RPN.FPN_POST_NMS_TOP_N_TEST = 24
    cfg.FAST_RCNN.ROI_XFORM_RESOLUTION = (7, 7)
    cfg.FAST_RCNN.BATCH_SIZE_PER_IMAGE = 16
    cfg.FAST_RCNN.DETECTIONS_PER_IMG = 8
    cfg.TRAIN.SCALES = (64,)
    cfg.TRAIN.MAX_SIZE = 96
    cfg.TRAIN.MAX_GT_BOXES = 8
    cfg.TEST.SCALE = 64
    cfg.TEST.MAX_SIZE = 96
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.WARM_UP_ITERS = 1
    return cfg


def test_full_pipeline(tiny_cfg, tmp_path):
    cfg = tiny_cfg
    img_dir, ann_file = _make_coco_dir(tmp_path)
    catalog.register("tiny_synth", img_dir, ann_file)
    cfg.DATA_DIR = ""
    # catalog.register stores absolute paths; get_* joins DATA_DIR
    dataset = COCODataset(ann_file, img_dir)
    assert len(dataset) == 8
    assert dataset.aspect_ratios().shape == (8,)

    loader = TrainLoader(cfg, dataset, batch_size=2, prefetch=0)
    it = iter(loader)
    batch = next(it)
    assert batch["images"].ndim == 4
    assert batch["gt_boxes"].shape[1] == 8

    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    mesh = make_mesh(1)
    step = jit_train_step(make_train_step(cfg, model, tx), mesh)
    losses = []
    with mesh:
        for i, b in zip(range(3), it):
            state, metrics = step(state, shard_batch(b, mesh))
            losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3

    # checkpoint round trip
    ckpt = CheckPointer(str(tmp_path / "ckpt"), auto_resume=False)
    ckpt.save(state, step=3)
    restored = ckpt.load(state)
    assert restored is not None
    np.testing.assert_array_equal(
        np.asarray(restored.step), np.asarray(state.step)
    )
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    r0 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(r0))

    # inference + evaluation end to end
    results = run_inference_on_dataset(
        cfg, model, state.params, dataset, progress_every=0
    )
    assert isinstance(results, list)
    stats = evaluate_results(
        cfg, dataset, results, output_dir=str(tmp_path / "test_out")
    )
    assert "AP" in stats and "AP50" in stats
    assert os.path.exists(tmp_path / "test_out" / "bbox.json")


def test_test_loader_shapes(tiny_cfg, tmp_path):
    img_dir, ann_file = _make_coco_dir(tmp_path, n_images=3)
    dataset = COCODataset(ann_file, img_dir)
    loader = TestLoader(tiny_cfg, dataset)
    items = list(loader)
    assert len(items) == 3
    for item in items:
        assert item["images"].shape[0] == 1
        h, w = item["images"].shape[1:3]
        assert h % 32 == 0 and w % 32 == 0


def test_sharded_inference_equals_unsharded(tiny_cfg, tmp_path):
    """Range-sharded eval (the parent/child orchestration of
    tools/test_net.py --shards, replacing pet/utils/subprocess.py:12-95)
    must merge to exactly the unsharded results."""
    from cpm_tpu.engine.test import shard_ranges

    cfg = tiny_cfg
    img_dir, ann_file = _make_coco_dir(tmp_path, n_images=6)
    dataset = COCODataset(ann_file, img_dir)
    loader = TrainLoader(cfg, dataset, batch_size=2, prefetch=0)
    batch = next(iter(loader))
    model, _, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)

    full = run_inference_on_dataset(
        cfg, model, state.params, dataset, progress_every=0
    )
    ranges = shard_ranges(len(dataset), 3)
    assert ranges == [(0, 2), (2, 4), (4, 6)]
    merged = []
    for s, e in ranges:
        merged.extend(
            run_inference_on_dataset(
                cfg, model, state.params, dataset, start=s, end=e,
                progress_every=0,
            )
        )
    assert merged == full
    # degenerate shard counts
    assert shard_ranges(6, 1) == [(0, 6)]
    assert shard_ranges(2, 5) == [(0, 1), (1, 2)]


def test_batched_eval_equals_batch1(tiny_cfg, tmp_path):
    """TEST.IMS_PER_GPU=3 must produce exactly the batch-1 results (the
    model's test path treats images independently; the last partial batch
    is padded and the padding dropped)."""
    cfg = tiny_cfg
    img_dir, ann_file = _make_coco_dir(tmp_path, n_images=7)
    dataset = COCODataset(ann_file, img_dir)
    loader = TrainLoader(cfg, dataset, batch_size=2, prefetch=0)
    batch = next(iter(loader))
    model, _, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)

    single = run_inference_on_dataset(
        cfg, model, state.params, dataset, progress_every=0
    )
    import copy

    cfg_b = copy.deepcopy(cfg)
    cfg_b.TEST.IMS_PER_GPU = 3
    batched = run_inference_on_dataset(
        cfg_b, model, state.params, dataset, progress_every=0
    )

    def norm(results):
        return sorted(
            (r["image_id"], r["category_id"],
             tuple(round(v, 3) for v in r["bbox"]), round(r["score"], 5))
            for r in results
        )

    assert norm(batched) == norm(single)


def test_synthetic_dataset_materializes(tmp_path):
    """build_dataset('coco_debug_synthetic') self-materializes on disk."""
    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.data import catalog
    from cpm_tpu.data.coco import build_dataset
    from cpm_tpu.data.synthetic_coco import SYNTHETIC_NAME

    cfg = get_default_cfg()
    cfg.DATA_DIR = str(tmp_path)
    # fresh registration per test run
    catalog._CATALOG.pop(SYNTHETIC_NAME, None)
    ds = build_dataset(cfg, (SYNTHETIC_NAME,), is_train=True)[0]
    assert len(ds) > 0
    img = ds.load_image(0)
    assert img.ndim == 3 and img.dtype == np.uint8
    boxes, labels = ds.load_annotations(0)
    assert len(boxes) > 0 and (labels >= 1).all()
    # idempotent: second build reuses the on-disk copy
    ds2 = build_dataset(cfg, (SYNTHETIC_NAME,), is_train=True)[0]
    assert len(ds2) == len(ds)


def test_vis_hook_writes_images(tiny_cfg, tmp_path):
    """cfg.VIS.ENABLED dumps annotated images under $CKPT/vis/ during
    inference (reference test_engine.py:171-187)."""
    import copy

    from cpm_tpu.modeling.model import build_model

    cfg = copy.deepcopy(tiny_cfg)
    cfg.VIS.ENABLED = True
    cfg.VIS.VIS_TH = 0.0
    cfg.CKPT = str(tmp_path / "vis_ckpt")
    img_dir, ann_file = _make_coco_dir(tmp_path, n_images=3)
    dataset = COCODataset(ann_file, img_dir)

    model = build_model(cfg)
    item = next(iter(TestLoader(cfg, dataset)))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        item["images"], item["image_sizes"], train=False,
    )
    run_inference_on_dataset(
        cfg, model, variables["params"], dataset, progress_every=0
    )
    vis_dir = os.path.join(cfg.CKPT, "vis")
    files = sorted(os.listdir(vis_dir))
    assert len(files) == 3
    for f in files:
        im = Image.open(os.path.join(vis_dir, f))
        assert im.size[0] > 0
