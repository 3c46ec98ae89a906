#!/usr/bin/env python
"""Eval CLI.

Same contract as /root/reference/tools/rcnn/test_net.py:
`python tools/test_net.py --cfg ... [--range s e] [KEY VALUE ...]`.
The reference's subprocess-per-GPU eval sharding (pet/utils/subprocess.py)
is unnecessary on a TPU host — the per-image forward is jitted and the
host feeds images as fast as it can; --range still shards by image index
for multi-process/multi-host eval, with per-range json shards merged by
the caller (the same embarrassingly-parallel structure).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="CPM R-CNN TPU evaluation")
    p.add_argument("--cfg", dest="cfg_file", required=True)
    p.add_argument("--range", dest="range", nargs=2, type=int, default=None)
    p.add_argument(
        "--shards", type=int, default=0,
        help="parent mode: split the image range over N child processes "
        "(the reference's subprocess-per-GPU eval sharding, "
        "pet/utils/subprocess.py:12-95), merge their results, evaluate",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def _local_tpu_chip_count():
    """Local TPU chip count WITHOUT initializing the TPU runtime (the
    parent must not grab the chips its children need). /dev/accel* is
    how libtpu enumerates local chips; 0 on non-TPU hosts."""
    import glob

    return len(glob.glob("/dev/accel*"))


def run_sharded(args, cfg, dataset):
    """Parent orchestration (test_engine.py:60-100 + subprocess.py:12-95):
    spawn one child per shard with --range, wait, merge, evaluate.

    Chip isolation mirrors the reference's one-GPU-per-subprocess
    CUDA_VISIBLE_DEVICES (subprocess.py:30-40): each child gets
    TPU_VISIBLE_DEVICES=<i mod chips> so libtpu binds it to one chip
    (concurrent children sharing a chip would fail libtpu's
    exclusive-access init). On non-TPU hosts the children instead pin
    jax_default_device via CPM_SHARD_INDEX (see main)."""
    import subprocess

    from cpm_tpu.engine.test import evaluate_results, shard_ranges

    out_dir = os.path.join(cfg.CKPT, "test")
    os.makedirs(out_dir, exist_ok=True)
    ranges = shard_ranges(len(dataset), args.shards)
    chips = _local_tpu_chip_count()
    # On TPU hosts libtpu takes exclusive ownership of a chip per
    # process, so never run more concurrent children than chips: launch
    # in waves of at most `chips` (non-TPU hosts run all shards at once,
    # like the reference's one-GPU-per-child subprocess.py:30-40).
    wave_size = chips if chips else len(ranges)
    results = []
    for w0 in range(0, len(ranges), max(1, wave_size)):
        wave = list(enumerate(ranges))[w0 : w0 + max(1, wave_size)]
        procs = []
        for i, (s, e) in wave:
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--cfg", args.cfg_file, "--range", str(s), str(e),
            ] + (args.opts or [])
            env = dict(os.environ)
            env["CPM_SHARD_INDEX"] = str(i)
            if chips and "TPU_VISIBLE_DEVICES" not in os.environ:
                env["TPU_VISIBLE_DEVICES"] = str(i % chips)
            log_path = os.path.join(out_dir, f"shard_{s}_{e}.log")
            log = open(log_path, "w")
            procs.append(
                (s, e,
                 subprocess.Popen(cmd, env=env, stdout=log, stderr=log), log)
            )
            print(f"spawned shard {i}: images [{s}, {e}) -> {log_path}")
        for s, e, proc, log in procs:
            ret = proc.wait()
            log.close()
            assert ret == 0, f"shard [{s}, {e}) failed with rc={ret}"
            shard_file = os.path.join(
                out_dir, f"detection_range_{s}_{e}.json"
            )
            with open(shard_file) as f:
                results.extend(json.load(f))
    stats = evaluate_results(cfg, dataset, results, output_dir=out_dir)
    print(json.dumps(stats, indent=2))


def main():
    args = parse_args()
    from cpm_tpu.utils.platform_env import (
        honor_jax_platforms_env,
        pin_default_device_for_shard,
    )

    honor_jax_platforms_env()
    import jax

    shard_idx = os.environ.get("CPM_SHARD_INDEX")
    if shard_idx is not None:
        dev = pin_default_device_for_shard(int(shard_idx))
        print(f"shard {shard_idx}: pinned to {dev}")

    from cpm_tpu.config import (
        assert_and_infer_cfg,
        cfg,
        merge_cfg_from_file,
        merge_cfg_from_list,
    )
    from cpm_tpu.data.coco import build_dataset
    from cpm_tpu.engine.checkpoint import CheckPointer
    from cpm_tpu.engine.test import evaluate_results, run_inference_on_dataset
    from cpm_tpu.engine.train import create_train_state
    from cpm_tpu.data.synthetic import synthetic_batch
    from cpm_tpu.modeling.model import build_model

    merge_cfg_from_file(args.cfg_file)
    if args.opts:
        merge_cfg_from_list(args.opts)
    assert_and_infer_cfg(make_immutable=False)

    datasets = build_dataset(cfg, cfg.TEST.DATASETS, is_train=False)
    dataset = datasets[0]

    if args.shards and args.shards > 1:
        assert args.range is None, "--shards is a parent mode; no --range"
        run_sharded(args, cfg, dataset)
        return

    # initialize params and restore checkpoint
    sample = synthetic_batch(
        batch_size=1, height=64, width=64,
        num_classes=cfg.MODEL.NUM_CLASSES, seed=0,
    )
    model, tx, state = create_train_state(
        cfg, jax.random.PRNGKey(0), sample
    )
    params = None
    # Reference precedence (pet/utils/checkpointer.py:13-18 get_weights):
    # an existing TEST.WEIGHTS file wins; otherwise fall back to the
    # CKPT dir's latest. A torch .pth/.pt TEST.WEIGHTS (e.g. a reference
    # model-zoo CPM checkpoint) is imported directly.
    tw = cfg.TEST.WEIGHTS
    if tw and os.path.isfile(tw) and tw.endswith((".pth", ".pt", ".pkl")):
        from cpm_tpu.utils.weight_import import import_cpm_checkpoint

        params = import_cpm_checkpoint(tw, cfg)
        print(f"loaded torch weights from TEST.WEIGHTS: {tw}")
    elif tw and os.path.exists(tw):
        # an existing path we cannot import (a directory, or an
        # unsupported suffix) is a user error — failing fast beats
        # silently evaluating other weights under this name
        raise ValueError(
            f"TEST.WEIGHTS exists but is not an importable torch "
            f"checkpoint (.pth/.pt/.pkl): {tw}"
        )
    else:
        if tw:
            # reference get_weights semantics: a missing TEST.WEIGHTS
            # path falls back to the CKPT dir — but loudly
            print(f"WARNING: TEST.WEIGHTS not found, falling back to "
                  f"CKPT: {tw}")
        checkpointer = CheckPointer(cfg.CKPT, auto_resume=True)
        restored = checkpointer.load(state)
        if restored is not None:
            state = restored
            print(f"loaded checkpoint at iter {int(state.step)}")
        else:
            print("WARNING: no checkpoint found; evaluating random init")
    if params is None:
        params = state.params

    start, end = (args.range if args.range else (0, len(dataset)))
    t0 = time.time()
    results = run_inference_on_dataset(
        cfg, model, params, dataset, start=start, end=end
    )
    n = end - start
    dt = time.time() - t0
    print(f"inference: {n} images in {dt:.1f}s ({n / max(dt, 1e-9):.2f} img/s)")

    out_dir = os.path.join(cfg.CKPT, "test")
    os.makedirs(out_dir, exist_ok=True)
    if args.range:
        shard = os.path.join(out_dir, f"detection_range_{start}_{end}.json")
        with open(shard, "w") as f:
            json.dump(results, f)
        print(f"wrote {shard}")
    else:
        stats = evaluate_results(cfg, dataset, results, output_dir=out_dir)
        print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
