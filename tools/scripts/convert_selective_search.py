#!/usr/bin/env python
"""Convert selective-search proposal .mat files to a numpy archive.

Capability parity with tools/rcnn/scripts/convert_selective_search.py
(python2 Detectron-era script converting the Matlab selective-search
boxes to a pickle of (boxes, scores, ids)): reads the .mat, converts the
(y1, x1, y2, x2) 1-based Matlab boxes to 0-based xyxy, and writes an .npz
with per-image box arrays keyed by image id.

Usage:
  python tools/scripts/convert_selective_search.py in.mat ids.txt out.npz
"""

import argparse
import sys

import numpy as np


def matlab_boxes_to_xyxy(raw: np.ndarray) -> np.ndarray:
    """(y1, x1, y2, x2) 1-based -> (x1, y1, x2, y2) 0-based."""
    boxes = raw.astype(np.float32) - 1
    return boxes[:, (1, 0, 3, 2)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mat_file")
    ap.add_argument("id_file", help="one image id per line, matching order")
    ap.add_argument("out_npz")
    args = ap.parse_args()

    try:
        from scipy.io import loadmat
    except ImportError:
        sys.exit("scipy is required to read .mat proposal files")

    data = loadmat(args.mat_file)
    raw_boxes = data["boxes"].ravel()
    with open(args.id_file) as f:
        ids = [line.strip() for line in f if line.strip()]
    assert len(ids) == len(raw_boxes), (
        f"{len(ids)} ids vs {len(raw_boxes)} box sets"
    )
    out = {
        str(img_id): matlab_boxes_to_xyxy(np.asarray(b))
        for img_id, b in zip(ids, raw_boxes)
    }
    np.savez_compressed(args.out_npz, **out)
    print(f"wrote {len(out)} proposal sets to {args.out_npz}")


if __name__ == "__main__":
    main()
