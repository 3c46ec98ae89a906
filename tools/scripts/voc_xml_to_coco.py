#!/usr/bin/env python
"""Convert Pascal-VOC xml annotations to COCO detection json.

Parity with the reference's xml→json converter (tools/rcnn/scripts).

Usage:
  python tools/scripts/voc_xml_to_coco.py --xml-dir Annotations \
      --out instances.json [--classes a,b,c]
"""

import argparse
import glob
import json
import os
import xml.etree.ElementTree as ET

VOC_CLASSES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xml-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--classes", default="")
    args = ap.parse_args()

    names = (
        args.classes.split(",") if args.classes else VOC_CLASSES
    )
    cat_ids = {n: i + 1 for i, n in enumerate(names)}
    images, annotations = [], []
    ann_id = 1
    for img_id, path in enumerate(
        sorted(glob.glob(os.path.join(args.xml_dir, "*.xml"))), start=1
    ):
        root = ET.parse(path).getroot()
        size = root.find("size")
        images.append(
            dict(
                id=img_id,
                file_name=root.findtext("filename"),
                width=int(size.findtext("width")),
                height=int(size.findtext("height")),
            )
        )
        for obj in root.findall("object"):
            name = obj.findtext("name")
            if name not in cat_ids:
                continue
            bb = obj.find("bndbox")
            x1 = float(bb.findtext("xmin"))
            y1 = float(bb.findtext("ymin"))
            x2 = float(bb.findtext("xmax"))
            y2 = float(bb.findtext("ymax"))
            annotations.append(
                dict(
                    id=ann_id,
                    image_id=img_id,
                    category_id=cat_ids[name],
                    bbox=[x1, y1, x2 - x1, y2 - y1],
                    area=(x2 - x1) * (y2 - y1),
                    iscrowd=int(obj.findtext("difficult") or 0),
                )
            )
            ann_id += 1

    with open(args.out, "w") as f:
        json.dump(
            dict(
                images=images,
                annotations=annotations,
                categories=[
                    dict(id=i, name=n) for n, i in cat_ids.items()
                ],
            ),
            f,
        )
    print(f"wrote {args.out}: {len(images)} images, {len(annotations)} anns")


if __name__ == "__main__":
    main()
