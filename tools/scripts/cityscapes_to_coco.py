#!/usr/bin/env python
"""Convert Cityscapes instance annotations to COCO detection json.

Parity with the reference converter (tools/rcnn/scripts — cityscapes↔COCO).
Reads gtFine polygon json files, emits a COCO instances json with boxes
derived from instance polygons for the 8 Cityscapes "thing" classes.

Usage:
  python tools/scripts/cityscapes_to_coco.py \
      --gt-dir data/cityscapes/gtFine/train \
      --img-dir leftImg8bit/train \
      --out data/cityscapes/annotations/instances_train.json
"""

import argparse
import glob
import json
import os

THING_CLASSES = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
]


def polygon_bbox(poly):
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    x1, y1 = min(xs), min(ys)
    return [x1, y1, max(xs) - x1, max(ys) - y1]


def polygon_area(poly):
    area = 0.0
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        area += x1 * y2 - x2 * y1
    return abs(area) / 2.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt-dir", required=True)
    ap.add_argument("--img-dir", default="")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    cat_ids = {name: i + 1 for i, name in enumerate(THING_CLASSES)}
    images, annotations = [], []
    ann_id = 1
    files = sorted(
        glob.glob(os.path.join(args.gt_dir, "**", "*_polygons.json"),
                  recursive=True)
    )
    for img_id, path in enumerate(files, start=1):
        with open(path) as f:
            gt = json.load(f)
        base = os.path.basename(path).replace(
            "_gtFine_polygons.json", "_leftImg8bit.png"
        )
        city = os.path.basename(os.path.dirname(path))
        images.append(
            dict(
                id=img_id,
                file_name=os.path.join(args.img_dir, city, base)
                if args.img_dir
                else os.path.join(city, base),
                width=gt["imgWidth"],
                height=gt["imgHeight"],
            )
        )
        for obj in gt.get("objects", []):
            label = obj["label"]
            crowd = 0
            if label.endswith("group"):
                label = label[: -len("group")]
                crowd = 1
            if label not in cat_ids:
                continue
            poly = obj["polygon"]
            annotations.append(
                dict(
                    id=ann_id,
                    image_id=img_id,
                    category_id=cat_ids[label],
                    bbox=polygon_bbox(poly),
                    area=polygon_area(poly),
                    iscrowd=crowd,
                    segmentation=[
                        [c for pt in poly for c in pt]
                    ],
                )
            )
            ann_id += 1

    out = dict(
        images=images,
        annotations=annotations,
        categories=[
            dict(id=i, name=n) for n, i in cat_ids.items()
        ],
    )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(
        f"wrote {args.out}: {len(images)} images, "
        f"{len(annotations)} annotations"
    )


if __name__ == "__main__":
    main()
