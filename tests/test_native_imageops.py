"""Native C++ image ops vs the PIL reference path."""

import io
import os

import numpy as np
import pytest
from PIL import Image

native = pytest.importorskip("cpm_tpu.native")
try:
    native.get_lib()
except Exception as e:  # build failure -> skip, loader falls back to PIL
    pytest.skip(f"native build unavailable: {e}", allow_module_level=True)

from cpm_tpu.data.transforms import normalize_image


def _jpeg_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _png_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


MEANS = (102.9801, 115.9465, 122.7717)


def test_decode_matches_pil_no_resize():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (40, 60, 3), np.uint8)
    data = _png_bytes(arr)  # lossless: exact decode comparison
    out, (oh, ow) = native.decode_resize_normalize(
        data, (40, 60), (64, 64), MEANS
    )
    assert (oh, ow) == (40, 60)
    want = normalize_image(arr, MEANS)
    np.testing.assert_allclose(out[:40, :60], want, atol=1e-3)
    assert np.all(out[40:] == 0) and np.all(out[:, 60:] == 0)


def test_resize_matches_pil_bilinear():
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
    data = _png_bytes(arr)
    out, _ = native.decode_resize_normalize(
        data, (24, 32), (32, 32), MEANS
    )
    pil = np.asarray(
        Image.fromarray(arr).resize((32, 24), Image.BILINEAR)
    )
    want = normalize_image(pil, MEANS)
    # antialias bilinear should match PIL closely
    np.testing.assert_allclose(out[:24, :32], want, atol=1.5)


def test_jpeg_roundtrip_close():
    rng = np.random.RandomState(2)
    arr = rng.randint(60, 200, (32, 32, 3), np.uint8)
    arr[:, :16] = [200, 50, 30]  # coherent block, jpeg-friendly
    data = _jpeg_bytes(arr)
    out, (oh, ow) = native.decode_resize_normalize(
        data, (32, 32), (32, 32), (0.0, 0.0, 0.0)
    )
    assert (oh, ow) == (32, 32)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    want = normalize_image(pil, (0.0, 0.0, 0.0))
    # both decode the same jpeg; allow small libjpeg version differences
    assert np.mean(np.abs(out - want)) < 3.0


def test_pool_prefetch(tmp_path):
    rng = np.random.RandomState(3)
    paths = []
    arrays = []
    for i in range(6):
        arr = rng.randint(0, 255, (40, 40, 3), np.uint8)
        p = tmp_path / f"{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        arrays.append(arr)
    pool = native.ImagePool(n_workers=2)
    for i, p in enumerate(paths):
        pool.submit(i, p, (40, 40), (64, 64), MEANS)
    seen = {}
    for _ in paths:
        tid, out, (oh, ow) = pool.wait_any((64, 64))
        assert (oh, ow) == (40, 40)
        seen[int(tid)] = out
    pool.close()
    assert sorted(seen) == list(range(6))
    for i in range(6):
        want = normalize_image(arrays[i], MEANS)
        np.testing.assert_allclose(seen[i][:40, :40], want, atol=1e-3)


def test_decode_resize_u8_matches_float_affine():
    """uint8 path (device normalization) == float path up to the u8
    rounding after resize."""
    rng = np.random.RandomState(4)
    arr = rng.randint(0, 255, (40, 60, 3), np.uint8)
    data = _png_bytes(arr)
    u8, (oh, ow) = native.decode_resize_u8(data, (20, 30), (32, 32), True)
    assert u8.dtype == np.uint8 and (oh, ow) == (40, 60)
    f32, _ = native.decode_resize_normalize(
        data, (20, 30), (32, 32), MEANS, (1.0, 1.0, 1.0), True
    )
    # device-side affine: (u8 - mean) / std
    affine = u8.astype(np.float32) - np.asarray(MEANS, np.float32)
    # valid region matches up to 0.5 quantization; padding stays zeroed in
    # u8 but equals -mean/std in the float path only inside normalize --
    # both paths zero the padding BEFORE normalize, so compare valid only
    assert np.max(np.abs(affine[:20, :30] - f32[:20, :30])) <= 0.5 + 1e-4
    assert not u8[20:, :].any() and not u8[:, 30:].any()


def test_pool_u8_mode(tmp_path):
    rng = np.random.RandomState(5)
    paths, arrays = [], []
    for i in range(4):
        arr = rng.randint(0, 255, (24, 24, 3), np.uint8)
        p = tmp_path / f"u8_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        arrays.append(arr)
    pool = native.ImagePool(n_workers=2)
    for i, p in enumerate(paths):
        pool.submit_u8(i, p, (24, 24), (32, 32), True)
    seen = {}
    for _ in paths:
        tid, out, (oh, ow) = pool.wait_any_u8((32, 32))
        assert out.dtype == np.uint8 and (oh, ow) == (24, 24)
        seen[int(tid)] = out
    pool.close()
    for i in range(4):
        np.testing.assert_array_equal(
            seen[i][:24, :24], arrays[i][:, :, ::-1]
        )
