"""ColorJitter parity tests.

The reference's T.ColorJitter (pet/utils/data/transforms/transforms.py:78-93)
delegates to torchvision 0.6 ColorJitter, whose PIL backend is
ImageEnhance.Brightness/Contrast/Color and an HSV-roundtrip hue shift.
cpm_tpu implements the same PIL calls; these tests pin the formulas against
an independent numpy oracle (PIL blend = round-half-up linear interpolation)
and check the sampling/composition contract.
"""

import numpy as np
import pytest

from cpm_tpu.data.transforms import (
    ColorJitter,
    TrainTransform,
    adjust_brightness,
    adjust_contrast,
    adjust_hue,
    adjust_saturation,
)


def _img(seed=0, h=37, w=53):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3), dtype=np.uint8
    )


def _l_gray(img):
    # PIL 'L' conversion: ITU-R 601-2, truncating to int
    f = img.astype(np.float64)
    return f[..., 0] * 299 / 1000 + f[..., 1] * 587 / 1000 + f[..., 2] * 114 / 1000


def _blend(a, b, alpha):
    # PIL Image.blend / ImageEnhance: a + alpha*(b-a), round-half-up
    out = a.astype(np.float64) + alpha * (
        b.astype(np.float64) - a.astype(np.float64)
    )
    return np.clip(np.floor(out + 0.5), 0, 255)


def test_identity_factors():
    img = _img()
    assert np.array_equal(adjust_brightness(img, 1.0), img)
    assert np.array_equal(adjust_contrast(img, 1.0), img)
    assert np.array_equal(adjust_saturation(img, 1.0), img)
    # hue at 0 is a lossy uint8 HSV roundtrip even in torchvision 0.6
    # (ColorJitter skips the op entirely when HUE==0, as does ours)
    d = np.abs(adjust_hue(img, 0.0).astype(int) - img.astype(int))
    assert d.max() <= 8


def test_brightness_oracle():
    img = _img(1)
    for f in (0.0, 0.37, 0.5, 1.5, 2.0):
        got = adjust_brightness(img, f).astype(np.float64)
        want = _blend(np.zeros_like(img), img, f)
        assert np.abs(got - want).max() <= 1.0, f


def test_contrast_oracle():
    img = _img(2)
    # PIL Contrast blends with the rounded mean of the L image
    mean = int(_l_gray(img).astype(np.uint8).mean() + 0.5)
    for f in (0.5, 1.3):
        got = adjust_contrast(img, f).astype(np.float64)
        want = _blend(np.full_like(img, mean), img, f)
        assert np.abs(got - want).max() <= 2.0, f


def test_saturation_oracle():
    img = _img(3)
    gray = _l_gray(img).astype(np.uint8)[..., None].repeat(3, -1)
    for f in (0.4, 1.6):
        got = adjust_saturation(img, f).astype(np.float64)
        want = _blend(gray, img, f)
        assert np.abs(got - want).max() <= 2.0, f


def test_hue_wraps_and_bounds():
    img = _img(4)
    # full-wrap shift: factor +-0.5 both land ~opposite hues; valid output
    a = adjust_hue(img, 0.49)
    b = adjust_hue(img, -0.5)
    assert a.shape == img.shape and a.dtype == np.uint8
    assert b.shape == img.shape
    with pytest.raises(ValueError):
        adjust_hue(img, 0.6)
    # hue shift preserves V (max channel) for saturated pixels
    hsv_v = img.max(-1)
    got_v = adjust_hue(img, 0.2).max(-1)
    assert np.abs(got_v.astype(int) - hsv_v.astype(int)).max() <= 2


def test_jitter_disabled_is_identity():
    cj = ColorJitter(0.0, 0.0, 0.0, 0.0)
    img = _img(5)
    assert cj(img, np.random.RandomState(0)) is img
    assert not cj.enabled


def test_jitter_factor_ranges():
    # with tiny ranges the output stays near the input; with big ranges
    # it moves (sanity on the uniform sampling)
    img = _img(6)
    small = ColorJitter(1e-4, 1e-4, 1e-4, 1e-4)
    out = small(img, np.random.RandomState(1))
    # <=8: the hue HSV roundtrip quantization floor (see identity test)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8
    big = ColorJitter(0.8, 0.8, 0.8, 0.4)
    outs = [big(img, np.random.RandomState(s)) for s in range(3)]
    assert any(np.abs(o.astype(int) - img.astype(int)).mean() > 5 for o in outs)
    # different seeds -> different draws (random order + factors)
    assert not np.array_equal(outs[0], outs[1])


def test_train_transform_applies_jitter():
    from cpm_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    cfg.TRAIN.SCALES = (64,)
    cfg.TRAIN.MAX_SIZE = 128
    cfg.TRAIN.BRIGHTNESS = 0.9
    tf = TrainTransform(cfg, normalize=False)
    assert tf.color_jitter.enabled
    img = _img(7, 64, 96)
    boxes = np.asarray([[4.0, 4.0, 30.0, 30.0]], np.float32)
    rng = np.random.RandomState(0)
    out1, _, _ = tf(img, boxes, rng)
    # same pipeline with jitter off differs (brightness 0.9 range)
    cfg2 = get_default_cfg()
    cfg2.TRAIN.SCALES = (64,)
    cfg2.TRAIN.MAX_SIZE = 128
    tf2 = TrainTransform(cfg2, normalize=False)
    moved = False
    for seed in range(4):
        a, _, _ = tf(img, boxes, np.random.RandomState(seed))
        b, _, _ = tf2(img, boxes, np.random.RandomState(seed))
        if not np.array_equal(a, b):
            moved = True
    assert moved
