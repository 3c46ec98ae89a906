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

from typing import Dict

import numpy as np


def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict):
        for key in ("model", "state_dict"):
            if key in sd and isinstance(sd[key], dict):
                sd = sd[key]
                break
    return {
        k[len("module.") :] if k.startswith("module.") else k: _to_np(v)
        for k, v in sd.items()
    }


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
    sd = load_torch_state_dict(path)
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
            j_name = f"layer{li + 1}_{bi}"
            blk: Dict = {}
            # creation order inside Bottleneck: conv1/bn1, conv2/bn2,
            # conv3/bn3, then downsample conv/bn -> AffineChannel_0..3
            for ci in (1, 2, 3):
                if f"{t_pref}.conv{ci}.weight" not in sd:
                    continue
                blk[f"conv{ci}"] = {
                    "kernel": conv_to_hwio(sd[f"{t_pref}.conv{ci}.weight"])
                }
                s, b = fold_bn(sd, f"{t_pref}.bn{ci}", bn_eps)
                blk[f"AffineChannel_{ci - 1}"] = {"scale": s, "bias": b}
            if f"{t_pref}.downsample.0.weight" in sd:
                blk["downsample_conv"] = {
                    "kernel": conv_to_hwio(
                        sd[f"{t_pref}.downsample.0.weight"]
                    )
                }
                s, b = fold_bn(sd, f"{t_pref}.downsample.1", bn_eps)
                blk["AffineChannel_3"] = {"scale": s, "bias": b}
            out[j_name] = blk
    return out


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
