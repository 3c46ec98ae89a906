#!/usr/bin/env python
"""Package detection results for a COCO-style competition submission.

The reference's encode_results_for_competition.py is a python2 DensePose
PNG packer for a head family this repo does not have (SURVEY §2.14 dead
code); the living capability is: take the evaluator's bbox.json, validate
it, and produce the zipped `detections_<task>_<split>_results.json` layout
the COCO server expects.

Usage:
  python tools/scripts/encode_results_for_competition.py \
      --results <ckpt>/test/bbox.json --split test-dev2017 --out sub.zip
"""

import argparse
import json
import os
import zipfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True, help="bbox.json path")
    ap.add_argument("--split", default="test-dev2017")
    ap.add_argument("--task", default="bbox")
    ap.add_argument("--out", required=True, help="output .zip")
    args = ap.parse_args()

    with open(args.results) as f:
        results = json.load(f)
    assert isinstance(results, list), "bbox.json must be a list of dicts"
    required = {"image_id", "category_id", "bbox", "score"}
    for i, r in enumerate(results[:1000]):
        missing = required - set(r)
        assert not missing, f"result {i} missing keys: {missing}"
        assert len(r["bbox"]) == 4, f"result {i} bbox must be xywh"

    inner = f"detections_{args.split}_{args.task}_results.json"
    with zipfile.ZipFile(
        args.out, "w", compression=zipfile.ZIP_DEFLATED
    ) as z:
        z.writestr(inner, json.dumps(results))
    print(
        f"wrote {args.out} ({os.path.getsize(args.out)} bytes, "
        f"{len(results)} detections as {inner})"
    )


if __name__ == "__main__":
    main()
