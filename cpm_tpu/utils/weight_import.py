"""Torch -> JAX pretrained backbone weight importer.

Replaces the reference's pretrain loading path
(/root/reference/pet/utils/checkpointer.py:62-122 +
align_and_update_state_dicts:180-227): loads a torch ResNet/ResNeXt
state dict (caffe-style `resnet50_caffe.pth` or torchvision), folds
BatchNorm statistics into the frozen AffineChannel (scale, bias) params
(net.py:114-125 convert_bn2affine), converts conv kernels OIHW -> HWIO,
and optionally swaps conv1 input channels RGB<->BGR
(checkpointer.py:74-80, cfg.MODEL.CONV1_RGB2BGR).

The name mapping is explicit (our module tree is known), not suffix
matching — same capability, deterministic result.
"""

import os
from typing import Dict

import numpy as np


def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def vgg16_reducedfc_name_mapping() -> Dict[str, str]:
    """Donor-key rename map for SSD-style ``vgg16_reducedfc.pth``
    pretrain checkpoints.

    Same key set as the reference's literal VGG16_NAME_MAPPING
    (/root/reference/pet/utils/checkpointer.py:241-272), derived here
    from the VGG16-D layout instead of spelled out: the donor state
    dict uses bare ``nn.Sequential`` indices (convs at 0..28, plus the
    reduced-fc extras at 31/33); the target model splits the trunk
    after conv4_3 into ``features1`` (donor indices preserved) and
    ``features2`` (indices rebased by the 23 layers before the split),
    with the reduced fc6/fc7 becoming ``conv6``/``conv7``.
    """
    conv_idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    mapping = {}
    for i in conv_idx:
        tgt = f"features1.{i}" if i <= 21 else f"features2.{i - 23}"
        for p in ("weight", "bias"):
            mapping[f"{i}.{p}"] = f"{tgt}.{p}"
    for i, tgt in ((31, "conv6"), (33, "conv7")):
        for p in ("weight", "bias"):
            mapping[f"{i}.{p}"] = f"{tgt}.{p}"
    return mapping


def apply_pretrain_name_mapping(
    sd: Dict[str, np.ndarray], weights_path: str
) -> Dict[str, np.ndarray]:
    """Rename donor keys for known pretrain formats before alignment.

    Mirrors CheckPointer.weight_mapping
    (/root/reference/pet/utils/checkpointer.py:59-72): triggered by the
    checkpoint filename containing ``vgg16_reducedfc``, and strict —
    every donor key must be in the map, exactly as the reference's
    ``mapping[old_name]`` lookup is.
    """
    if "vgg16_reducedfc" not in os.path.basename(str(weights_path)):
        return sd
    mapping = vgg16_reducedfc_name_mapping()
    return {mapping[k]: v for k, v in sd.items()}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict):
        for key in ("model", "state_dict"):
            if key in sd and isinstance(sd[key], dict):
                sd = sd[key]
                break
    out = {
        k[len("module.") :] if k.startswith("module.") else k: _to_np(v)
        for k, v in sd.items()
    }
    return apply_pretrain_name_mapping(out, path)


def fold_bn(sd: Dict[str, np.ndarray], prefix: str, eps: float = 1e-5):
    """(scale, bias) for a BN/affine module named `prefix`."""
    w = sd[f"{prefix}.weight"].astype(np.float64)
    b = sd[f"{prefix}.bias"].astype(np.float64)
    if f"{prefix}.running_mean" in sd:
        mean = sd[f"{prefix}.running_mean"].astype(np.float64)
        var = sd[f"{prefix}.running_var"].astype(np.float64)
        std = np.sqrt(var + eps)
        scale = w / std
        bias = b - mean * scale
    else:  # already-affine caffe export
        scale, bias = w, b
    return scale.astype(np.float32), bias.astype(np.float32)


def conv_to_hwio(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def import_resnet_backbone(
    path: str,
    layers=(3, 4, 6, 3),
    conv1_rgb2bgr: bool = False,
    bn_eps: float = 1e-5,
) -> Dict:
    """Returns the flax param subtree for ResNetBody (NHWC, frozen-BN)."""
    return import_resnet_backbone_sd(
        load_torch_state_dict(path), layers, conv1_rgb2bgr, bn_eps
    )


def merge_backbone_into_params(params: Dict, backbone: Dict) -> Dict:
    """Replace matching leaves of params['backbone'] with imported arrays,
    preserving everything else. Shapes must agree."""
    import jax

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"imported key {path}/{k} not in model params")
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{path}/{k}")
            else:
                cur = np.asarray(dst[k])
                if cur.shape != v.shape:
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"model {cur.shape} vs import {v.shape}"
                    )
                out[k] = v.astype(cur.dtype)
        return out

    new_params = dict(params)
    new_params["backbone"] = merge(params["backbone"], backbone, "backbone")
    return new_params


# ---------------------------------------------------------------------------
# FPN / RPN / CPM head importers (full-model checkpoints)
#
# Reference module attribute names (what a CPM checkpoint's keys look like):
#   Generalized_RCNN: Conv_Body.* / Conv_Body_FPN.* / RPN.head.* /
#   Grid_Cascade_RCNN.{Head_cls, Output_cls, Head_grid_<s>, Output_grid_<s>,
#   Head_rescore, Output_rescore}  (model_builder.py:32-57,
#   grid_cascade_rcnn.py:24-48, rpn/rpn.py:26-66).
# ---------------------------------------------------------------------------


def _conv(sd, name):
    out = {"kernel": conv_to_hwio(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _fc(sd, name):
    """torch Linear [out, in] -> flax Dense kernel [in, out]."""
    out = {"kernel": np.transpose(sd[f"{name}.weight"], (1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _fc_after_pool(sd, name, pool_hw):
    """torch Linear applied to an NCHW-flattened pooled feature -> flax
    Dense applied to our NHWC flatten.

    The reference flattens [R, C, H, W] channel-major (`x.view(R, -1)`,
    e.g. mlp_heads.py fc6, outputs.py iou_fc1); our heads flatten the
    NHWC pooled tensor spatial-major. The kernel's input rows must be
    permuted (C, H, W) -> (H, W, C) or imported weights silently produce
    garbage — caught by
    tests/test_weight_parity.py::test_grid_head_and_output_activation_parity.
    """
    w = sd[f"{name}.weight"]  # [out, C*H*W]
    h, wdim = pool_hw
    cin = w.shape[1] // (h * wdim)
    assert cin * h * wdim == w.shape[1], (w.shape, pool_hw)
    k = w.reshape(w.shape[0], cin, h, wdim)
    k = np.transpose(k, (2, 3, 1, 0)).reshape(h * wdim * cin, w.shape[0])
    out = {"kernel": np.ascontiguousarray(k)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _gn(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _stage_conv(sd, name):
    """Bottleneck stage conv importer that understands deform packs.

    Plain Conv2d -> {"kernel"}. DeformConvPack / ModulatedDeformConvPack
    (X-101-DCN configs; reference deform_conv.py:472-558 registers the
    main weight as `weight` plus a conv_offset[/‑mask] child Conv2d) ->
    {"weight", "conv_offset"/"conv_offset_mask"} matching
    cpm_tpu.ops.deform_conv, whose main param is named "weight" (not
    "kernel") to stay outside the USE_WS standardization rule.
    """
    for off_name in ("conv_offset", "conv_offset_mask"):
        if f"{name}.{off_name}.weight" in sd:
            return {
                "weight": conv_to_hwio(sd[f"{name}.weight"]),
                off_name: _conv(sd, f"{name}.{off_name}"),
            }
    return {"kernel": conv_to_hwio(sd[f"{name}.weight"])}


def deconv_to_grouped_kernel(w: np.ndarray, groups: int) -> np.ndarray:
    """torch ConvTranspose2d weight [Cin, Cout/g, kH, kW] -> the kernel
    layout of cpm_tpu grouped_deconv: [kH, kW, Cin/g, Cout] (UNflipped —
    grouped_deconv flips spatially itself).

    Output channel o (global) of group go=o//(Cout/g) contracts input
    channels [go*Cin/g, (go+1)*Cin/g); torch stores them as
    w[go*Cin/g + ci, o % (Cout/g)].
    """
    cin, cout_g, kh, kw = w.shape
    cout = cout_g * groups
    cin_g = cin // groups
    out = np.zeros((kh, kw, cin_g, cout), w.dtype)
    for o in range(cout):
        go, oc = divmod(o, cout_g)
        for ci in range(cin_g):
            out[:, :, ci, o] = w[go * cin_g + ci, oc]
    return out


def import_fpn(sd, prefix: str = "") -> Dict:
    """fpn (FPN.py:14-111): p5_in/p5_out + fpn_in.{i}/fpn_out.{i}."""
    out = {
        "p5_in": _conv(sd, f"{prefix}p5_in"),
        "p5_out": _conv(sd, f"{prefix}p5_out"),
    }
    i = 0
    while f"{prefix}fpn_in.{i}.weight" in sd:
        out[f"fpn_in_{i}"] = _conv(sd, f"{prefix}fpn_in.{i}")
        out[f"fpn_out_{i}"] = _conv(sd, f"{prefix}fpn_out.{i}")
        i += 1
    return out


def import_rpn_head(sd, prefix: str = "RPN.head.") -> Dict:
    """RPNHead (rpn/rpn.py:26-28)."""
    return {
        "conv": _conv(sd, f"{prefix}conv"),
        "cls_logits": _conv(sd, f"{prefix}cls_logits"),
        "bbox_pred": _conv(sd, f"{prefix}bbox_pred"),
    }


def import_cls_head(sd, prefix: str, pool_hw=(7, 7)) -> Dict:
    """roi_cls_head 2-MLP (cls_heads.py:34-35). fc6 consumes the flattened
    pooled feature -> needs the NCHW->NHWC row permutation."""
    return {
        "fc6": _fc_after_pool(sd, f"{prefix}fc6", pool_hw),
        "fc7": _fc(sd, f"{prefix}fc7"),
    }


def import_cls_output(sd, prefix: str) -> Dict:
    return {"cls_score": _fc(sd, f"{prefix}cls_score")}


def import_grid_head(sd, prefix: str) -> Dict:
    """roi_grid_head (grid_heads.py:39-66): conv tower convs.{i}.{0,1} and
    (FUSED_ON) forder/sorder transitions {i}.{j}.{0:dw,1:pw}."""
    out: Dict = {}
    i = 0
    while f"{prefix}convs.{i}.0.weight" in sd:
        out[f"conv{i}"] = _conv(sd, f"{prefix}convs.{i}.0")
        out[f"gn{i}"] = _gn(sd, f"{prefix}convs.{i}.1")
        i += 1
    for order in ("forder", "sorder"):
        i = 0
        while f"{prefix}{order}_trans.{i}.0.0.weight" in sd:
            j = 0
            while f"{prefix}{order}_trans.{i}.{j}.0.weight" in sd:
                out[f"{order}_{i}_{j}"] = {
                    "dw": _conv(sd, f"{prefix}{order}_trans.{i}.{j}.0"),
                    "pw": _conv(sd, f"{prefix}{order}_trans.{i}.{j}.1"),
                }
                j += 1
            i += 1
    if f"{prefix}offset_conv.weight" in sd:
        out["offset_conv"] = _conv(sd, f"{prefix}offset_conv")
        # offset_fc consumes the flattened 7x7x64 offset-conv output
        out["offset_fc"] = _fc_after_pool(sd, f"{prefix}offset_fc", (7, 7))
    return out


def import_grid_output(sd, prefix: str, grid_points: int = None) -> Dict:
    """Grid_output (outputs.py:23-45): grouped deconvs + GN + ISM FCs.

    grid_points defaults to the checkpoint's own deconv_2 output width
    (CPM stages can differ, e.g. GRID_NUM: (4, 9))."""
    if grid_points is None:
        grid_points = int(sd[f"{prefix}deconv_2.bias"].shape[0])
    out: Dict = {
        "deconv1_kernel": deconv_to_grouped_kernel(
            sd[f"{prefix}deconv_1.weight"], grid_points
        ),
        "deconv1_bias": sd[f"{prefix}deconv_1.bias"],
        "deconv2_kernel": deconv_to_grouped_kernel(
            sd[f"{prefix}deconv_2.weight"], grid_points
        ),
        "deconv2_bias": sd[f"{prefix}deconv_2.bias"],
        "norm1": _gn(sd, f"{prefix}norm1"),
    }
    if f"{prefix}iou_fc1.weight" in sd:
        # iou_fc1 consumes the flattened 7x7 grid-tower feature
        out["iou_fc1"] = _fc_after_pool(sd, f"{prefix}iou_fc1", (7, 7))
        out["iou_fc2"] = _fc(sd, f"{prefix}iou_fc2")
        out["iou_pred"] = _fc(sd, f"{prefix}iou_pred")
    return out


def import_cpm_checkpoint(path_or_sd, cfg) -> Dict:
    """Full reference CPM checkpoint -> flax param tree for
    GeneralizedRCNN (backbone, fpn, rpn_head, roi_head.*)."""
    sd = (
        load_torch_state_dict(path_or_sd)
        if isinstance(path_or_sd, str)
        else path_or_sd
    )
    bb_sd = {
        k[len("Conv_Body."):]: v
        for k, v in sd.items()
        if k.startswith("Conv_Body.")
    }
    # resnext trunks (X-101 configs) carry their stage counts under
    # BACKBONE.RESNEXT; the torch key layout is identical either way
    bb_section = (
        cfg.BACKBONE.RESNEXT
        if "resnext" in str(cfg.BACKBONE.CONV_BODY)
        else cfg.BACKBONE.RESNET
    )
    params: Dict = {
        "backbone": import_resnet_backbone_sd(
            bb_sd,
            layers=tuple(bb_section.LAYERS),
            conv1_rgb2bgr=cfg.MODEL.CONV1_RGB2BGR,
        ),
        "fpn": import_fpn(sd, "Conv_Body_FPN."),
        "rpn_head": import_rpn_head(sd, "RPN.head."),
    }
    g = "Grid_Cascade_RCNN."
    head: Dict = {
        "cls_head": import_cls_head(sd, f"{g}Head_cls."),
        "cls_output": import_cls_output(sd, f"{g}Output_cls."),
    }
    s = 0
    while f"{g}Head_grid_{s}.convs.0.0.weight" in sd:
        head[f"grid_head_{s}"] = import_grid_head(sd, f"{g}Head_grid_{s}.")
        head[f"grid_output_{s}"] = import_grid_output(
            sd, f"{g}Output_grid_{s}."
        )
        s += 1
    if f"{g}Head_rescore.fc6.weight" in sd:
        head["rescore_head"] = import_cls_head(sd, f"{g}Head_rescore.")
        head["rescore_output"] = import_cls_output(sd, f"{g}Output_rescore.")
    params["roi_head"] = head
    return params


def import_resnet_backbone_sd(
    sd: Dict[str, np.ndarray],
    layers=(3, 4, 6, 3),
    conv1_rgb2bgr: bool = False,
    bn_eps: float = 1e-5,
) -> Dict:
    """import_resnet_backbone on an in-memory state dict."""
    out: Dict = {}
    conv1 = conv_to_hwio(sd["conv1.weight"])
    if conv1_rgb2bgr:
        conv1 = conv1[:, :, ::-1, :]
    out["conv1"] = {"kernel": conv1}
    s, b = fold_bn(sd, "bn1", bn_eps)
    out["AffineChannel_0"] = {"scale": s, "bias": b}
    for li, n_blocks in enumerate(layers):
        for bi in range(n_blocks):
            t_pref = f"layer{li + 1}.{bi}"
            blk: Dict = {}
            for ci in (1, 2, 3):
                if f"{t_pref}.conv{ci}.weight" not in sd:
                    continue
                blk[f"conv{ci}"] = _stage_conv(sd, f"{t_pref}.conv{ci}")
                s, b = fold_bn(sd, f"{t_pref}.bn{ci}", bn_eps)
                blk[f"AffineChannel_{ci - 1}"] = {"scale": s, "bias": b}
            if f"{t_pref}.downsample.0.weight" in sd:
                blk["downsample_conv"] = {
                    "kernel": conv_to_hwio(sd[f"{t_pref}.downsample.0.weight"])
                }
                s, b = fold_bn(sd, f"{t_pref}.downsample.1", bn_eps)
                blk["AffineChannel_3"] = {"scale": s, "bias": b}
            out[f"layer{li + 1}_{bi}"] = blk
    return out


def import_c5_stage(
    sd: Dict[str, np.ndarray],
    n_blocks: int,
    prefix: str = "",
    bn_eps: float = 1e-5,
) -> Dict:
    """torch `{prefix}layer4.{b}.*` (the stage-5 Bottleneck stack of
    ResNet_C5_Head / ResNet_2mlp_Head, backbone/ResNet.py:151-301) ->
    flax layer4_{b} params with BN folded to affine."""
    out: Dict = {}
    for bi in range(n_blocks):
        t_pref = f"{prefix}layer4.{bi}"
        blk: Dict = {}
        for ci in (1, 2, 3):
            if f"{t_pref}.conv{ci}.weight" not in sd:
                continue
            blk[f"conv{ci}"] = _stage_conv(sd, f"{t_pref}.conv{ci}")
            s, b = fold_bn(sd, f"{t_pref}.bn{ci}", bn_eps)
            blk[f"AffineChannel_{ci - 1}"] = {"scale": s, "bias": b}
        if f"{t_pref}.downsample.0.weight" in sd:
            blk["downsample_conv"] = {
                "kernel": conv_to_hwio(sd[f"{t_pref}.downsample.0.weight"])
            }
            s, b = fold_bn(sd, f"{t_pref}.downsample.1", bn_eps)
            blk["AffineChannel_3"] = {"scale": s, "bias": b}
        out[f"layer4_{bi}"] = blk
    return out


def import_2mlp_head(
    sd: Dict[str, np.ndarray],
    n_blocks: int,
    pool_hw=(7, 7),
    prefix: str = "",
    bn_eps: float = 1e-5,
) -> Dict:
    """ResNet_2mlp_Head (backbone/ResNet.py:210-301): stage-5 stack +
    conv_new (Sequential index 0) + fc1/fc2; fc1 follows an NCHW flatten
    of the pooled 256-ch feature -> row-permuted kernel."""
    out = import_c5_stage(sd, n_blocks, prefix, bn_eps)
    out["conv_new"] = {
        "kernel": conv_to_hwio(sd[f"{prefix}conv_new.0.weight"]),
        "bias": sd[f"{prefix}conv_new.0.bias"],
    }
    out["fc1"] = _fc_after_pool(sd, f"{prefix}fc1", pool_hw)
    out["fc2"] = _fc(sd, f"{prefix}fc2")
    return out
