#!/usr/bin/env python
"""FLOPs / parameter count for any config.

Replaces tools/rcnn/scripts/compute_fcos_flops.py (a torch FLOPs counter
for one model family) with XLA's own cost analysis of the compiled eval
forward — exact for whatever config is passed, any family.

Usage: python tools/scripts/compute_flops.py --cfg cfgs/... [--height H --width W]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    args = ap.parse_args()

    import jax

    from cpm_tpu.config import get_default_cfg, merge_cfg_from_file
    from cpm_tpu.data.synthetic import synthetic_batch
    from cpm_tpu.modeling.model import build_model
    from cpm_tpu.utils.measure import flops_and_params

    cfg = get_default_cfg()
    merge_cfg_from_file(args.cfg, target=cfg)
    model = build_model(cfg)
    batch = synthetic_batch(
        batch_size=1, height=args.height, width=args.width,
        num_classes=cfg.MODEL.NUM_CLASSES, seed=0,
    )
    stats = flops_and_params(
        cfg, model, batch["images"], batch["image_sizes"]
    )
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
