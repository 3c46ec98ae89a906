#!/usr/bin/env python
"""Remap a COCO-trained checkpoint's class heads for Cityscapes fine-tuning.

Capability parity with tools/rcnn/scripts/convert_coco_model_to_cityscapes.py:
every param whose leading (output) dimension is NUM_COCO_CLS (81) or
4*NUM_COCO_CLS is remapped to the 9 Cityscapes classes — rows with a
COCO<->Cityscapes category correspondence are copied, the rest re-drawn
from a Gaussian matched to the source blob's mean/std. Operates on our
orbax/flax param trees (Dense kernels are [in, out], so the CLASS axis is
the LAST dim — the torch original remaps axis 0 of [out, in] Linears).

Usage:
  python tools/scripts/coco_model_to_cityscapes.py --ckpt <dir> --out <dir>
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

NUM_COCO_CLS = 81
# Cityscapes (id, name) -> COCO contiguous class id; 0 = background
# (cityscapes_to_coco convert_func of the reference script)
CITYSCAPES_TO_COCO = {
    0: 0,       # background
    1: 1,       # person
    2: 1,       # rider -> person
    3: 3,       # car
    4: 8,       # truck
    5: 6,       # bus
    6: 7,       # train
    7: 4,       # motorcycle
    8: 2,       # bicycle
}
NUM_CS_CLS = len(CITYSCAPES_TO_COCO)


def remap_class_axis(arr: np.ndarray, axis: int, factor: int) -> np.ndarray:
    """Remap a [.., C*factor, ..] class-structured axis COCO->Cityscapes."""
    arr = np.moveaxis(arr, axis, 0)
    shaped = arr.reshape((NUM_COCO_CLS, factor) + arr.shape[1:])
    mean, std = shaped.mean(), shaped.std()
    rng = np.random.RandomState(0)
    out = (
        rng.randn(*((NUM_CS_CLS, factor) + arr.shape[1:])) * std + mean
    ).astype(arr.dtype)
    for cs_id, coco_id in CITYSCAPES_TO_COCO.items():
        out[cs_id] = shaped[coco_id]
    out = out.reshape((NUM_CS_CLS * factor,) + arr.shape[1:])
    return np.moveaxis(out, 0, axis)


def convert_tree(tree):
    """Walk a flax param tree; remap any leaf with a class-sized last axis."""
    if isinstance(tree, dict):
        return {k: convert_tree(v) for k, v in tree.items()}
    arr = np.asarray(tree)
    if arr.ndim == 0:
        return arr
    last = arr.shape[-1]
    if last == NUM_COCO_CLS:
        print(f"remapping class blob {arr.shape} -> ", end="")
        arr = remap_class_axis(arr, arr.ndim - 1, 1)
        print(arr.shape)
    elif last == 4 * NUM_COCO_CLS:
        print(f"remapping box blob {arr.shape} -> ", end="")
        arr = remap_class_axis(arr, arr.ndim - 1, 4)
        print(arr.shape)
    return arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    args = ap.parse_args()

    from cpm_tpu.engine.checkpoint import CheckPointer

    src = CheckPointer(args.ckpt, auto_resume=True)
    state = src.load(None)
    assert state is not None, f"no checkpoint under {args.ckpt}"
    new_params = convert_tree(
        {k: v for k, v in state.params.items()}
    )
    new_state = state.replace(params=new_params)
    CheckPointer(args.out, auto_resume=False).save(
        new_state, step=int(state.step)
    )
    print(f"wrote remapped checkpoint to {args.out}")


if __name__ == "__main__":
    main()
