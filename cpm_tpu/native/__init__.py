"""Native (C++) data-path library: build + ctypes bindings.

Builds cpm_tpu/native/imageops.cpp into _imageops.so on first use (g++,
libjpeg, libpng, pthreads) and exposes:

  * decode_resize_normalize(path_or_bytes, ...) -> (padded float32 image,
    (orig_h, orig_w)) — the fused host-side image op;
  * ImagePool — a worker-pool prefetcher (submit paths, collect finished
    padded tensors), the native replacement for the reference's
    DataLoader worker processes.

All callers must tolerate ImportError/OSError and fall back to the PIL
path (cpm_tpu/data/transforms.py).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "imageops.cpp")
_SO = os.path.join(_DIR, "_imageops.so")

_lib = None
_lock = threading.Lock()


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO, "-ljpeg", "-lpng", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.imgops_decode_resize_normalize.restype = ctypes.c_int
        lib.imgops_decode_resize_normalize.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.imgops_decode_resize_u8.restype = ctypes.c_int
        lib.imgops_decode_resize_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.pool_create.restype = ctypes.c_void_p
        lib.pool_create.argtypes = [ctypes.c_int]
        lib.pool_submit.restype = None
        lib.pool_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ]
        lib.pool_wait_any.restype = ctypes.c_int64
        lib.pool_wait_any.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.pool_submit_u8.restype = None
        lib.pool_submit_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ]
        lib.pool_wait_any_u8.restype = ctypes.c_int64
        lib.pool_wait_any_u8.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.pool_destroy.restype = None
        lib.pool_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _interp_code(interp: str) -> int:
    """'pil' (triangle/antialias, train parity) -> 0;
    'cv2' (INTER_LINEAR, eval parity per reference test.py:353-354) -> 1."""
    if interp == "pil":
        return 0
    if interp == "cv2":
        return 1
    raise ValueError(f"unknown interp {interp!r}")


def decode_resize_normalize(
    data: bytes,
    resized_hw,
    padded_hw,
    pixel_means,
    pixel_stds=(1.0, 1.0, 1.0),
    to_bgr255: bool = True,
    interp: str = "pil",
    scale_xy=(1.0, 1.0),
):
    """Fused decode+resize+normalize+pad. Returns (image [ph,pw,3] f32,
    (orig_h, orig_w)). Raises RuntimeError on decode failure.

    interp='cv2' uses the reference's eval-time cv2 INTER_LINEAR mapping;
    scale_xy = (fx, fy) resize factors (cv2 maps dst->src through 1/f,
    which is not exactly dsize/ssize)."""
    lib = get_lib()
    rh, rw = resized_hw
    ph, pw = padded_hw
    out = np.zeros((ph, pw, 3), np.float32)
    mean = np.asarray(pixel_means, np.float32)
    std = np.asarray(pixel_stds, np.float32)
    oh = ctypes.c_int(0)
    ow = ctypes.c_int(0)
    fx, fy = scale_xy
    rc = lib.imgops_decode_resize_normalize(
        data, len(data), rh, rw, ph, pw, _fptr(mean), _fptr(std),
        1 if to_bgr255 else 0, _interp_code(interp),
        1.0 / float(fx), 1.0 / float(fy), _fptr(out), ctypes.byref(oh),
        ctypes.byref(ow),
    )
    if rc != 0:
        raise RuntimeError(f"native image decode failed (rc={rc})")
    return out, (oh.value, ow.value)


def decode_resize_u8(data: bytes, resized_hw, padded_hw, to_bgr255=True,
                     interp: str = "pil", scale_xy=(1.0, 1.0)):
    """Fused decode+resize+pad to uint8, channel order per to_bgr255 (no
    normalization — the model applies the input affine on device). Returns
    (image [ph,pw,3] u8, (orig_h, orig_w))."""
    lib = get_lib()
    rh, rw = resized_hw
    ph, pw = padded_hw
    out = np.zeros((ph, pw, 3), np.uint8)
    oh = ctypes.c_int(0)
    ow = ctypes.c_int(0)
    fx, fy = scale_xy
    rc = lib.imgops_decode_resize_u8(
        data, len(data), rh, rw, ph, pw, 1 if to_bgr255 else 0,
        _interp_code(interp), 1.0 / float(fx), 1.0 / float(fy),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(oh), ctypes.byref(ow),
    )
    if rc != 0:
        raise RuntimeError(f"native image decode failed (rc={rc})")
    return out, (oh.value, ow.value)


class ImagePool:
    """Worker-pool prefetcher over the native library. One pool carries a
    single task mode — either submit/wait_any (float32, host-normalized)
    or submit_u8/wait_any_u8 (uint8, device-normalized)."""

    def __init__(self, n_workers: int = 4):
        self.lib = get_lib()
        self.pool = self.lib.pool_create(n_workers)

    def submit(
        self, task_id: int, path: str, resized_hw, padded_hw,
        pixel_means, pixel_stds=(1.0, 1.0, 1.0), to_bgr255: bool = True,
        interp: str = "pil", scale_xy=(1.0, 1.0),
    ):
        mean = np.asarray(pixel_means, np.float32)
        std = np.asarray(pixel_stds, np.float32)
        rh, rw = resized_hw
        ph, pw = padded_hw
        fx, fy = scale_xy
        self.lib.pool_submit(
            self.pool, task_id, path.encode(), rh, rw, ph, pw,
            _fptr(mean), _fptr(std), 1 if to_bgr255 else 0,
            _interp_code(interp), 1.0 / float(fx), 1.0 / float(fy),
        )

    def submit_u8(self, task_id: int, path: str, resized_hw, padded_hw,
                  to_bgr255: bool = True, interp: str = "pil",
                  scale_xy=(1.0, 1.0)):
        rh, rw = resized_hw
        ph, pw = padded_hw
        fx, fy = scale_xy
        self.lib.pool_submit_u8(
            self.pool, task_id, path.encode(), rh, rw, ph, pw,
            1 if to_bgr255 else 0, _interp_code(interp),
            1.0 / float(fx), 1.0 / float(fy),
        )

    def wait_any_u8(self, padded_hw):
        ph, pw = padded_hw
        out = np.zeros((ph, pw, 3), np.uint8)
        status = ctypes.c_int(-1)
        oh = ctypes.c_int(0)
        ow = ctypes.c_int(0)
        task_id = self.lib.pool_wait_any_u8(
            self.pool, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(status), ctypes.byref(oh), ctypes.byref(ow),
        )
        if status.value != 0:
            raise RuntimeError(
                f"native prefetch failed for task {task_id} "
                f"(status={status.value})"
            )
        return task_id, out, (oh.value, ow.value)

    def wait_any(self, padded_hw):
        ph, pw = padded_hw
        out = np.zeros((ph, pw, 3), np.float32)
        status = ctypes.c_int(-1)
        oh = ctypes.c_int(0)
        ow = ctypes.c_int(0)
        task_id = self.lib.pool_wait_any(
            self.pool, _fptr(out), ctypes.byref(status), ctypes.byref(oh),
            ctypes.byref(ow),
        )
        if status.value != 0:
            raise RuntimeError(
                f"native prefetch failed for task {task_id} "
                f"(status={status.value})"
            )
        return task_id, out, (oh.value, ow.value)

    def close(self):
        if self.pool:
            self.lib.pool_destroy(self.pool)
            self.pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
