"""Shared helper: make the reference tree (/root/reference/pet, PyTorch)
importable on CPU by stubbing its apex / torchvision / compiled-_C deps.
Used by the oracle tests that drive the reference's own implementations.

The stubs are REAL numerical implementations where the reference's
inference path needs them (torchvision nms, _C.ml_nms,
_C.roi_align_forward), so the whole reference Generalized_RCNN runs on
CPU as a numerical oracle. Semantics pinned to the kernels:
  * nms: torchvision.ops.nms — greedy by descending score, standard IoU,
    suppress at IoU > threshold, returns kept original indices in score
    order.
  * ml_nms (csrc/NMS/ml_nms.cu:12-26,92-145): same, but only same-label
    pairs suppress; optional topk truncation.
  * roi_align_forward (csrc/ROIAlign/ROIAlign_cpu.cpp): bilinear with the
    (-1, size) out-of-bounds zeroing and [0, size-1] clamp, adaptive
    ceil(roi/bin) grid when sampling_ratio == 0, optional half-pixel
    `aligned` offset.
"""

import sys
import types

import numpy as np


def _torch():
    import torch

    return torch


def ref_nms(boxes, scores, iou_threshold):
    """torchvision.ops.nms semantics on CPU torch tensors."""
    torch = _torch()
    if boxes.numel() == 0:
        return torch.zeros((0,), dtype=torch.long)
    b = boxes.detach().cpu().numpy().astype(np.float64)
    s = scores.detach().cpu().numpy().astype(np.float64)
    order = np.argsort(-s, kind="stable")
    keep = []
    suppressed = np.zeros(len(b), bool)
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order])
        yy1 = np.maximum(y1[i], y1[order])
        xx2 = np.minimum(x2[i], x2[order])
        yy2 = np.minimum(y2[i], y2[order])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / np.maximum(areas[i] + areas[order] - inter, 1e-12)
        suppressed[order[iou > iou_threshold]] = True
    return torch.as_tensor(np.asarray(keep, np.int64))


def ref_ml_nms(dets, scores, labels, iou_threshold, topk=0):
    """_C.ml_nms semantics (label-aware greedy NMS, topk truncation)."""
    torch = _torch()
    if dets.numel() == 0:
        return torch.zeros((0,), dtype=torch.long)
    b = dets.detach().cpu().numpy().astype(np.float64)
    s = scores.detach().cpu().numpy().astype(np.float64)
    l = labels.detach().cpu().numpy()
    order = np.argsort(-s, kind="stable")
    keep = []
    suppressed = np.zeros(len(b), bool)
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if topk and len(keep) == topk:
            break
        same = l[order] == l[i]
        xx1 = np.maximum(x1[i], x1[order])
        yy1 = np.maximum(y1[i], y1[order])
        xx2 = np.minimum(x2[i], x2[order])
        yy2 = np.minimum(y2[i], y2[order])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / np.maximum(areas[i] + areas[order] - inter, 1e-12)
        suppressed[order[(iou > iou_threshold) & same]] = True
    return torch.as_tensor(np.asarray(keep, np.int64))


def ref_roi_align_forward(
    input, rois, spatial_scale, ph, pw, sampling_ratio, aligned,
    interpolation_method=0,
):
    """_C.roi_align_forward on CPU torch tensors (bilinear only).

    input [N, C, H, W]; rois [R, 5] (batch_idx, x1, y1, x2, y2).
    Returns [R, C, ph, pw].
    """
    torch = _torch()
    assert interpolation_method == 0, "nearest not needed by the oracle"
    N, C, H, W = input.shape
    R = rois.shape[0]
    out = torch.zeros((R, C, ph, pw), dtype=input.dtype)
    if R == 0:
        return out
    feat = input.permute(0, 2, 3, 1).contiguous()  # [N, H, W, C]
    roi = rois.detach().to(torch.float32)
    off = 0.5 if aligned else 0.0
    bidx = roi[:, 0].long()
    x1 = roi[:, 1] * spatial_scale - off
    y1 = roi[:, 2] * spatial_scale - off
    x2 = roi[:, 3] * spatial_scale - off
    y2 = roi[:, 4] * spatial_scale - off
    rw = x2 - x1
    rh = y2 - y1
    if not aligned:
        rw = rw.clamp(min=1.0)
        rh = rh.clamp(min=1.0)
    bw = rw / pw
    bh = rh / ph
    if sampling_ratio > 0:
        gh = torch.full((R,), sampling_ratio, dtype=torch.long)
        gw = torch.full((R,), sampling_ratio, dtype=torch.long)
    else:
        gh = torch.ceil(rh / ph).long().clamp(min=1)
        gw = torch.ceil(rw / pw).long().clamp(min=1)

    def _axis_terms(coord, size):
        oob = (coord < -1.0) | (coord > size)
        c = coord.clamp(0.0, size - 1.0)
        lo = c.floor()
        hi = (lo + 1).clamp(max=size - 1)
        whi = c - lo
        return lo.long(), hi.long(), 1.0 - whi, whi, oob

    # vectorize per (gh, gw) group
    for key in {(int(a), int(b)) for a, b in zip(gh.tolist(), gw.tolist())}:
        kh, kw = key
        sel = torch.nonzero((gh == kh) & (gw == kw), as_tuple=True)[0]
        Rg = len(sel)
        py = torch.arange(ph, dtype=torch.float32)
        px = torch.arange(pw, dtype=torch.float32)
        iy = (torch.arange(kh, dtype=torch.float32) + 0.5) / kh
        ix = (torch.arange(kw, dtype=torch.float32) + 0.5) / kw
        # [Rg, ph*kh], [Rg, pw*kw]
        ys = y1[sel, None] + (
            py[:, None] + iy[None, :]
        ).reshape(-1)[None, :] * bh[sel, None]
        xs = x1[sel, None] + (
            px[:, None] + ix[None, :]
        ).reshape(-1)[None, :] * bw[sel, None]
        y0, y1i, wy0, wy1, yo = _axis_terms(ys, H)
        x0, x1i, wx0, wx1, xo = _axis_terms(xs, W)
        bsel = bidx[sel][:, None, None]
        v = (
            feat[bsel, y0[:, :, None], x0[:, None, :]]
            * (wy0[:, :, None] * wx0[:, None, :])[..., None]
            + feat[bsel, y0[:, :, None], x1i[:, None, :]]
            * (wy0[:, :, None] * wx1[:, None, :])[..., None]
            + feat[bsel, y1i[:, :, None], x0[:, None, :]]
            * (wy1[:, :, None] * wx0[:, None, :])[..., None]
            + feat[bsel, y1i[:, :, None], x1i[:, None, :]]
            * (wy1[:, :, None] * wx1[:, None, :])[..., None]
        )  # [Rg, ph*kh, pw*kw, C]
        oob = yo[:, :, None] | xo[:, None, :]
        v = v * (~oob[..., None]).to(v.dtype)
        v = v.reshape(Rg, ph, kh, pw, kw, C).mean(dim=(2, 4))
        out[sel] = v.permute(0, 3, 1, 2).to(out.dtype)
    return out


def ref_roi_align_backward(
    grad_output, rois, spatial_scale, ph, pw, bs, ch, h, w,
    sampling_ratio, aligned, interpolation_method=0,
):
    """_C.roi_align_backward: bilinear-weight scatter-add of grad_output
    (the deterministic CPU analogue of ROIAlign_cuda.cu:259's atomics).

    grad_output [R, C, ph, pw]; returns grad_input [bs, ch, h, w].
    """
    torch = _torch()
    assert interpolation_method == 0
    grad_in = torch.zeros((bs, h, w, ch), dtype=torch.float32)
    R = rois.shape[0]
    if R == 0:
        return grad_in.permute(0, 3, 1, 2).contiguous()
    roi = rois.detach().to(torch.float32)
    off = 0.5 if aligned else 0.0
    bidx = roi[:, 0].long()
    x1 = roi[:, 1] * spatial_scale - off
    y1 = roi[:, 2] * spatial_scale - off
    x2 = roi[:, 3] * spatial_scale - off
    y2 = roi[:, 4] * spatial_scale - off
    rw = x2 - x1
    rh = y2 - y1
    if not aligned:
        rw = rw.clamp(min=1.0)
        rh = rh.clamp(min=1.0)
    bw = rw / pw
    bh = rh / ph
    if sampling_ratio > 0:
        gh = torch.full((R,), sampling_ratio, dtype=torch.long)
        gw = torch.full((R,), sampling_ratio, dtype=torch.long)
    else:
        gh = torch.ceil(rh / ph).long().clamp(min=1)
        gw = torch.ceil(rw / pw).long().clamp(min=1)

    def _axis_terms(coord, size):
        oob = (coord < -1.0) | (coord > size)
        c = coord.clamp(0.0, size - 1.0)
        lo = c.floor()
        hi = (lo + 1).clamp(max=size - 1)
        whi = c - lo
        return lo.long(), hi.long(), 1.0 - whi, whi, oob

    go = grad_output.detach().to(torch.float32).permute(0, 2, 3, 1)
    for key in {(int(a), int(b)) for a, b in zip(gh.tolist(), gw.tolist())}:
        kh, kw = key
        sel = torch.nonzero((gh == kh) & (gw == kw), as_tuple=True)[0]
        Rg = len(sel)
        py = torch.arange(ph, dtype=torch.float32)
        px = torch.arange(pw, dtype=torch.float32)
        iy = (torch.arange(kh, dtype=torch.float32) + 0.5) / kh
        ix = (torch.arange(kw, dtype=torch.float32) + 0.5) / kw
        ys = y1[sel, None] + (
            py[:, None] + iy[None, :]
        ).reshape(-1)[None, :] * bh[sel, None]
        xs = x1[sel, None] + (
            px[:, None] + ix[None, :]
        ).reshape(-1)[None, :] * bw[sel, None]
        y0, y1i, wy0, wy1, yo = _axis_terms(ys, h)
        x0, x1i, wx0, wx1, xo = _axis_terms(xs, w)
        # per-sample grad: grad_output[r, :, py, px] / (kh*kw), tiled
        # over the kh/kw sample grid
        g = go[sel]  # [Rg, ph, pw, C]
        g = g[:, :, None, :, None, :].expand(Rg, ph, kh, pw, kw, ch)
        g = g.reshape(Rg, ph * kh, pw * kw, ch) / float(kh * kw)
        ok = ~(yo[:, :, None] | xo[:, None, :])
        g = g * ok[..., None].to(g.dtype)
        b3 = bidx[sel][:, None, None].expand(Rg, ph * kh, pw * kw)
        for yi, wy in ((y0, wy0), (y1i, wy1)):
            for xi, wx in ((x0, wx0), (x1i, wx1)):
                vals = g * (wy[:, :, None] * wx[:, None, :])[..., None]
                grad_in.index_put_(
                    (b3, yi[:, :, None].expand_as(b3),
                     xi[:, None, :].expand_as(b3)),
                    vals, accumulate=True,
                )
    return grad_in.permute(0, 3, 1, 2).contiguous()


def install_reference_stubs():
    import os

    if not os.path.isdir("/root/reference/pet"):
        import pytest

        pytest.skip(
            "reference tree /root/reference/pet not present — "
            "oracle tests only run where the upstream checkout exists",
            allow_module_level=True,
        )
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # the 2019-era reference uses numpy scalar aliases removed in 1.24
    for alias, builtin in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, alias):
            setattr(np, alias, builtin)
    # hard .cuda() calls on the grid target path
    # (grid_cascade_rcnn/loss.py:175,257) become no-ops on CPU-only torch
    torch = _torch()
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
    if "apex" not in sys.modules:
        apex = types.ModuleType("apex")
        amp = types.ModuleType("apex.amp")
        amp.float_function = lambda f: f
        amp.half_function = lambda f: f
        apex.amp = amp
        sys.modules["apex"] = apex
        sys.modules["apex.amp"] = amp
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvo = types.ModuleType("torchvision.ops")
        tvo.nms = ref_nms
        tv.ops = tvo
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tvo
    if "pet.lib.ops._C" not in sys.modules:

        class _CModule(types.ModuleType):
            roi_align_forward = staticmethod(ref_roi_align_forward)
            roi_align_backward = staticmethod(ref_roi_align_backward)
            ml_nms = staticmethod(ref_ml_nms)

            def __getattr__(self, name):
                if name.startswith("__"):
                    # inspect.getmodule walks sys.modules and probes
                    # __file__/__loader__ etc — returning a callable here
                    # crashes it
                    raise AttributeError(name)

                def missing(*a, **k):
                    raise NotImplementedError(name)

                return missing

        sys.modules["pet.lib.ops._C"] = _CModule("pet.lib.ops._C")
