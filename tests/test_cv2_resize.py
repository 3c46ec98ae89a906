"""Eval-time resize parity: cv2 INTER_LINEAR semantics.

The reference's eval path resizes with cv2 INTER_LINEAR on the float32
image at one isotropic im_scale (/root/reference/pet/rcnn/core/test.py:
339-360 get_blob). These tests oracle our pure-numpy fallback
(cpm_tpu.data.transforms.cv2_linear_resize) and the native C++ kernel
(cpm_tpu/native/imageops.cpp resize_cv2_linear) against the real cv2,
which is importable in this environment.
"""

import io

import numpy as np
import pytest
from PIL import Image

from cpm_tpu.data.transforms import (
    TestTransform,
    cv2_linear_resize,
    get_blob_scale_size,
    normalize_image,
)

cv2 = pytest.importorskip("cv2")


SHAPES = [(480, 640), (427, 640), (612, 612), (333, 500), (3, 5), (7, 7)]
SCALES = [800 / 480, 1333 / 640, 0.37, 1.73, 1.0, 2.0, 5 / 3]


def _rand(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(
        np.float32
    )


def test_numpy_matches_cv2_generic():
    worst = 0.0
    for h, w in SHAPES:
        img = _rand(h, w, h * w)
        for s in SCALES:
            ref = cv2.resize(
                img, None, None, fx=s, fy=s,
                interpolation=cv2.INTER_LINEAR,
            )
            mine = cv2_linear_resize(img, s, s)
            assert ref.shape == mine.shape, (h, w, s)
            worst = max(worst, float(np.abs(ref - mine).max()))
    # fp-noise only (SIMD/FMA ordering); well below u8 quantization
    assert worst < 0.05, worst


def test_numpy_matches_cv2_exact_half():
    """scale exactly 0.5 hits cv2's silent INTER_AREA fast path,
    including count-normalized tail blocks on odd dims."""
    for h, w in [(480, 640), (427, 640), (801, 1200), (5, 7), (5, 5)]:
        img = _rand(h, w, seed=h + w)
        ref = cv2.resize(
            img, None, None, fx=0.5, fy=0.5,
            interpolation=cv2.INTER_LINEAR,
        )
        mine = cv2_linear_resize(img, 0.5, 0.5)
        assert ref.shape == mine.shape, (h, w)
        np.testing.assert_allclose(ref, mine, atol=1e-3)


def test_numpy_anisotropic():
    img = _rand(50, 70, seed=9)
    ref = cv2.resize(
        img, None, None, fx=1.3, fy=0.8, interpolation=cv2.INTER_LINEAR
    )
    mine = cv2_linear_resize(img, 1.3, 0.8)
    assert ref.shape == mine.shape
    np.testing.assert_allclose(ref, mine, atol=0.05)


def test_get_blob_geometry_matches_reference():
    """im_scale + dsize exactly as the reference computes them
    (test.py:345-354) — including the cvRound half-to-even dsize."""
    for h, w in [(480, 640), (640, 427), (612, 612), (1024, 683),
                 (159, 1000), (333, 500)]:
        # reference formula
        size_min, size_max = min(h, w), max(h, w)
        im_scale = 800.0 / size_min
        if np.round(im_scale * size_max) > 1333:
            im_scale = 1333.0 / size_max
        ref_out = cv2.resize(
            _rand(h, w, seed=1), None, None, fx=im_scale, fy=im_scale,
            interpolation=cv2.INTER_LINEAR,
        )
        s, (nh, nw) = get_blob_scale_size((h, w), 800, 1333)
        assert s == im_scale
        assert (nh, nw) == ref_out.shape[:2], (h, w)


def test_cvround_half_to_even():
    # 5x7 at 0.5: cvRound(2.5)=2, cvRound(3.5)=4
    _, (nh, nw) = get_blob_scale_size((10, 14), 5, 10000)
    ref = cv2.resize(
        _rand(10, 14, seed=2), None, None, fx=0.5, fy=0.5,
        interpolation=cv2.INTER_LINEAR,
    )
    assert (nh, nw) == ref.shape[:2]


def test_test_transform_cv2_backend():
    from cpm_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    cfg.TEST.SCALE = 100
    cfg.TEST.MAX_SIZE = 160
    t = TestTransform(cfg, backend="cv2")
    assert t.backend == "cv2"
    img = np.random.RandomState(3).randint(0, 256, (80, 120, 3), np.uint8)
    out, (nh, nw), scale_hw = t(img)
    s, (eh, ew) = get_blob_scale_size((80, 120), 100, 160)
    assert (nh, nw) == (eh, ew)
    want = normalize_image(
        cv2.resize(
            img.astype(np.float32), None, None, fx=s, fy=s,
            interpolation=cv2.INTER_LINEAR,
        ),
        cfg.PIXEL_MEANS, cfg.PIXEL_STDS, cfg.TO_BGR255,
    )
    np.testing.assert_allclose(out, want, atol=0.05)
    assert t.resolve_size((80, 120)) == (nh, nw)


def test_default_cfg_uses_cv2_eval_resize():
    from cpm_tpu.config import get_default_cfg

    assert get_default_cfg().TPU.EVAL_RESIZE == "cv2"


def test_native_cv2_interp_matches_numpy():
    native = pytest.importorskip("cpm_tpu.native")
    try:
        native.get_lib()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (48, 64, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")  # lossless
    data = buf.getvalue()
    s = 37 / 48  # resized to cvRound sizes
    nh, nw = int(round(48 * s)), int(round(64 * s))
    out, (oh, ow) = native.decode_resize_normalize(
        data, (nh, nw), (nh, nw), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
        True, interp="cv2", scale_xy=(s, s),
    )
    assert (oh, ow) == (48, 64)
    want = cv2_linear_resize(arr.astype(np.float32)[:, :, ::-1], s, s)
    np.testing.assert_allclose(out, want, atol=0.05)
    # and against the real cv2
    ref = cv2.resize(
        arr.astype(np.float32)[:, :, ::-1], None, None, fx=s, fy=s,
        interpolation=cv2.INTER_LINEAR,
    )
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_native_cv2_area2x(tmp_path):
    native = pytest.importorskip("cpm_tpu.native")
    try:
        native.get_lib()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    rng = np.random.RandomState(8)
    arr = rng.randint(0, 256, (31, 45, 3), np.uint8)  # odd dims: tails
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    nh, nw = int(round(31 * 0.5)), int(round(45 * 0.5))
    out, _ = native.decode_resize_normalize(
        buf.getvalue(), (nh, nw), (nh, nw), (0.0, 0.0, 0.0),
        (1.0, 1.0, 1.0), True, interp="cv2", scale_xy=(0.5, 0.5),
    )
    ref = cv2.resize(
        arr.astype(np.float32)[:, :, ::-1], None, None, fx=0.5, fy=0.5,
        interpolation=cv2.INTER_LINEAR,
    )
    assert out.shape[:2] == ref.shape[:2]
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_eval_loader_native_matches_python_fallback(tmp_path, monkeypatch):
    """TestLoader's native path and PIL-fallback path agree under the
    cv2 backend (both produce the reference resize)."""
    native = pytest.importorskip("cpm_tpu.native")
    try:
        native.get_lib()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    import json

    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.data import loader as loader_mod
    from cpm_tpu.data.coco import COCODataset

    rng = np.random.RandomState(11)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    images, anns = [], []
    for i, (h, w) in enumerate([(60, 90), (90, 60)]):
        arr = rng.randint(0, 256, (h, w, 3), np.uint8)
        name = f"im{i}.png"
        Image.fromarray(arr).save(imgdir / name)
        images.append(dict(id=i + 1, file_name=name, height=h, width=w))
        anns.append(dict(
            id=i + 1, image_id=i + 1, category_id=1,
            bbox=[5, 5, 20, 20], area=400, iscrowd=0,
        ))
    ann = dict(
        images=images, annotations=anns,
        categories=[dict(id=1, name="thing")],
    )
    annfile = tmp_path / "ann.json"
    annfile.write_text(json.dumps(ann))

    cfg = get_default_cfg()
    cfg.TEST.SCALE = 48
    cfg.TEST.MAX_SIZE = 80
    cfg.TPU.DEVICE_NORMALIZE = False  # f32: exact comparison
    ds = COCODataset(str(annfile), str(imgdir))

    out = {}
    for force_pil in (False, True):
        if force_pil:
            monkeypatch.setattr(loader_mod, "_NATIVE", False)
        else:
            monkeypatch.setattr(loader_mod, "_NATIVE", None)
        tl = loader_mod.TestLoader(cfg, ds)
        items = [tl._load_one_test(i) for i in range(2)]
        out[force_pil] = items
    for (img_a, sz_a, meta_a, key_a), (img_b, sz_b, meta_b, key_b) in zip(
        out[False], out[True]
    ):
        assert sz_a == sz_b and key_a == key_b
        assert meta_a["scale_hw"] == pytest.approx(meta_b["scale_hw"])
        np.testing.assert_allclose(img_a, img_b, atol=0.05)
