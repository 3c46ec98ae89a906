"""Attribute the real-loader train-step overhead (BENCH r04: 154.2 vs
106.1 ms/step resident, loader-wait 42.7 ms/step) phase by phase.

Replicates bench.py's real-loader stage (JPEG decode -> resize -> pad ->
H2D -> jitted step over the production (800, 1344) bucket) with timers
on every main-loop phase AND inside the loader worker:

  main loop:  dispatch | next(it) wait | shard_batch (H2D enqueue)
  worker:     pool decode wall | annotation+pad wall | queue block

Variants measured in one process (shared compiled executable):
  A  resident baseline (synthetic batch, no loader)
  B  production loop, prefetch=2 (the bench stage)
  C  prefetch=4
  D  prefetch=2 + H2D on a transfer thread (double-buffered device feed)

Usage: python tools/probe_real_loader.py [--steps 16]
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_dataset(td, n=12):
    from PIL import Image

    from cpm_tpu.data.coco import COCODataset

    rng = np.random.RandomState(1)
    img_dir = os.path.join(td, "images")
    os.makedirs(img_dir)
    images_meta, annotations = [], []
    for i in range(n):
        h, w = 800, 1216
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(
            os.path.join(img_dir, f"{i:06d}.jpg"), quality=90
        )
        images_meta.append(
            dict(id=i + 1, file_name=f"{i:06d}.jpg", width=w, height=h)
        )
        annotations.append(dict(
            id=i + 1, image_id=i + 1, category_id=1,
            bbox=[10.0, 10.0, 100.0, 100.0], area=10000.0, iscrowd=0,
        ))
    ann = os.path.join(td, "ann.json")
    with open(ann, "w") as f:
        json.dump(dict(images=images_meta, annotations=annotations,
                       categories=[dict(id=1, name="c1")]), f)
    return COCODataset(ann, img_dir)


class TimedLoader:
    """Wrap TrainLoader to time _make_batch internals."""

    def __init__(self, loader):
        self.loader = loader
        self.make_batch_s = []
        orig = loader._make_batch

        def timed(batch_indices, rng):
            t0 = time.time()
            out = orig(batch_indices, rng)
            self.make_batch_s.append(time.time() - t0)
            return out

        loader._make_batch = timed

    def __iter__(self):
        return iter(self.loader)


def run_loop(compiled, state, it, mesh, shard_batch, steps,
             transfer_thread=False):
    """Chained async loop; returns (wall_s, phases dict)."""
    ph = dict(dispatch=0.0, wait=0.0, h2d=0.0)

    if not transfer_thread:
        t0 = time.time()
        pending = shard_batch(next(it), mesh)
        for s in range(steps):
            t1 = time.time()
            state, metrics = compiled(state, pending)
            ph["dispatch"] += time.time() - t1
            if s + 1 < steps:
                t1 = time.time()
                nb = next(it)
                ph["wait"] += time.time() - t1
                t1 = time.time()
                pending = shard_batch(nb, mesh)
                ph["h2d"] += time.time() - t1
        float(metrics["total_loss"])
        return time.time() - t0, ph, state

    # variant D: a dedicated thread pulls host batches and enqueues H2D,
    # handing device-resident batches to the main loop via a 1-slot queue
    import queue as qm

    q: qm.Queue = qm.Queue(maxsize=2)
    stop = object()

    def feeder():
        try:
            for _ in range(steps):
                nb = next(it)
                q.put(shard_batch(nb, mesh))
        finally:
            q.put(stop)

    th = threading.Thread(target=feeder, daemon=True)
    t0 = time.time()
    th.start()
    for s in range(steps):
        t1 = time.time()
        pending = q.get()
        ph["wait"] += time.time() - t1
        if pending is stop:
            break
        t1 = time.time()
        state, metrics = compiled(state, pending)
        ph["dispatch"] += time.time() - t1
    float(metrics["total_loss"])
    return time.time() - t0, ph, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    args = ap.parse_args()

    import jax

    from cpm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from __graft_entry__ import _flagship_cfg
    from cpm_tpu.data.loader import TrainLoader
    from cpm_tpu.data.synthetic import synthetic_batch
    from cpm_tpu.engine.train import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )
    from cpm_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = _flagship_cfg(tiny=False)
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 2000
    cfg.TRAIN.MAX_GT_BOXES = 32
    cfg.TRAIN.SCALES = (800,)
    cfg.TRAIN.MAX_SIZE = 1333

    n_dev = jax.local_device_count()
    batch_size = 2 * n_dev
    batch = synthetic_batch(batch_size=batch_size, height=800, width=1344,
                            max_gt=32, num_classes=81, seed=0)
    mean = np.asarray(cfg.PIXEL_MEANS, np.float32)
    batch["images"] = np.clip(
        np.round(batch["images"] + mean), 0, 255
    ).astype(np.uint8)
    rt = {k: np.array(v) for k, v in batch.items()}
    rt["gt_mask"] = rt["gt_mask"].copy()
    rt["gt_mask"][:, 6:] = False

    mesh = make_mesh(n_dev)
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step_fn = jit_train_step(make_train_step(cfg, model, tx), mesh)
    steps = args.steps
    report = {}
    with mesh:
        sharded = shard_batch(rt, mesh)
        print("# tracing", flush=True)
        compiled = step_fn.lower(state, sharded).compile()
        print("# compiled", flush=True)
        for _ in range(2):
            state, metrics = compiled(state, sharded)
            float(metrics["total_loss"])

        # A: resident
        t0 = time.time()
        for _ in range(steps):
            state, metrics = compiled(state, sharded)
        float(metrics["total_loss"])
        report["A_resident_ms"] = (time.time() - t0) / steps * 1e3
        print(f"# A resident {report['A_resident_ms']:.1f} ms/step",
              flush=True)

        with tempfile.TemporaryDirectory() as td:
            ds = build_dataset(td)

            for name, prefetch, tthread in (
                ("B_prefetch2", 2, False),
                ("C_prefetch4", 4, False),
                ("D_transfer_thread", 2, True),
            ):
                loader = TrainLoader(
                    cfg, ds, batch_size=batch_size, prefetch=prefetch
                )
                tl = TimedLoader(loader)
                it = iter(tl)
                b0 = next(it)
                state, metrics = compiled(state, shard_batch(b0, mesh))
                float(metrics["total_loss"])  # warm barrier
                wall, ph, state = run_loop(
                    compiled, state, it, mesh, shard_batch, steps,
                    transfer_thread=tthread,
                )
                mb = tl.make_batch_s
                report[name] = dict(
                    ms_per_step=round(wall / steps * 1e3, 1),
                    dispatch_ms=round(ph["dispatch"] / steps * 1e3, 1),
                    wait_ms=round(ph["wait"] / steps * 1e3, 1),
                    h2d_enqueue_ms=round(ph["h2d"] / steps * 1e3, 1),
                    worker_make_batch_ms=round(
                        float(np.mean(mb)) * 1e3, 1
                    ) if mb else None,
                )
                print(f"# {name}: {json.dumps(report[name])}", flush=True)
                del it, tl, loader

    print(json.dumps(report))


if __name__ == "__main__":
    main()
