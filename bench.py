#!/usr/bin/env python
"""Benchmark: CPM R-CNN R-50-FPN train + inference throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

North-star (BASELINE.md): COCO images/sec/chip at R-50-FPN with box-mAP
parity, vs the reference 8x TITAN RTX recipe. The reference published no
throughput numbers; its recipe (global batch 16 over 8 GPUs, 180k iters
for a "2x" schedule ~= 2 weeks wall clock class) implies order
1.5-2 img/s/GPU — vs_baseline is measured against 1.75 img/s/chip.

Set CPM_BENCH_TRACE=<dir> to capture a jax.profiler trace of the timed
steps. Runs the flagship CPM config (CMM+ISM+RSM, R-50-FPN, bf16 compute)
on synthetic batches at the training resolution (832x1344 bucket).
"""

import json
import os
import time

import numpy as np

BASELINE_TRAIN_IPS_PER_CHIP = 1.75  # see module docstring

# bf16 peak per chip by device kind (fallback: v5e)
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def measure_pool_scaling():
    """N-worker ImagePool decode scaling (tools/bench_host_pipeline.py)
    — evidence the host pipeline can feed a multi-chip slice. Returns
    {workers: [...], images_per_sec: [...], peak_images_per_sec: N}."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "bench_host_pipeline.py"),
             "--images", "32"],
            capture_output=True, text=True, timeout=600,
        )
        data = json.loads(out.stdout.strip().splitlines()[-1])
        if "error" in data:
            return None
        return dict(
            workers=data["workers"],
            images_per_sec=data["images_per_sec"],
            peak_images_per_sec=data["peak_images_per_sec"],
            cpus=data["cpus"],
        )
    except Exception:
        return None


def measure_loader_throughput(cfg, n_images: int = 48):
    """Host data-path img/s: JPEG decode+resize+normalize+batch at the
    train resolution through TrainLoader (native ImagePool when built)."""
    import tempfile

    import numpy as np

    try:
        from PIL import Image

        from cpm_tpu.data.coco import COCODataset
        from cpm_tpu.data.loader import TrainLoader
    except Exception:
        return None
    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as td:
        img_dir = os.path.join(td, "images")
        os.makedirs(img_dir)
        images, annotations = [], []
        for i in range(12):
            h, w = 800, 1216
            arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(arr).save(
                os.path.join(img_dir, f"{i:06d}.jpg"), quality=90
            )
            images.append(dict(id=i + 1, file_name=f"{i:06d}.jpg",
                               width=w, height=h))
            annotations.append(dict(
                id=i + 1, image_id=i + 1, category_id=1,
                bbox=[10.0, 10.0, 100.0, 100.0], area=10000.0, iscrowd=0,
            ))
        ann = os.path.join(td, "ann.json")
        with open(ann, "w") as f:
            json.dump(dict(
                images=images, annotations=annotations,
                categories=[dict(id=1, name="c1")],
            ), f)
        ds = COCODataset(ann, img_dir)
        # prefetch=0: measure the decode path itself; a prefetch thread
        # would outlive the tempdir and read deleted files
        loader = TrainLoader(cfg, ds, batch_size=4, prefetch=0)
        it = iter(loader)
        next(it)  # warm the pool / caches
        t0 = time.time()
        done = 0
        while done < n_images:
            done += next(it)["images"].shape[0]
        return done / (time.time() - t0)


def main():
    import jax

    from cpm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from __graft_entry__ import _flagship_cfg
    from cpm_tpu.data.synthetic import synthetic_batch
    from cpm_tpu.engine.train import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )
    from cpm_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = _flagship_cfg(tiny=False)
    cfg.RPN.PRE_NMS_TOP_N_TRAIN = 2000

    n_dev = jax.local_device_count()
    per_chip_batch = 2  # reference recipe: global batch 16 over 8 GPUs
    batch_size = per_chip_batch * n_dev
    height, width = 832, 1344  # 800-shortest-side landscape bucket

    trace_dir = os.environ.get("CPM_BENCH_TRACE")

    # ---- train throughput ----
    batch = synthetic_batch(
        batch_size=batch_size, height=height, width=width,
        max_gt=32, num_classes=81, seed=0,
    )
    mesh = make_mesh(n_dev)
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step_fn = jit_train_step(make_train_step(cfg, model, tx), mesh)
    steps, warmup = 8, 3
    with mesh:
        sharded = shard_batch(batch, mesh)
        for _ in range(warmup):
            state, metrics = step_fn(state, sharded)
            # readout barrier: block_until_ready alone returns before the
            # enqueued chain executes on tunneled PJRT backends, so without
            # this the warmup's work lands inside the first timed step
            float(metrics["total_loss"])
        if trace_dir:
            jax.profiler.start_trace(trace_dir)
        # steps chain through `state`, so ONE readout at the end reliably
        # forces the whole sequence (block_until_ready alone returns
        # before the enqueued chain has executed on tunneled PJRT
        # backends). This matches the production train loop, which reads
        # metrics only every DISPLAY_ITER — a per-step readout would add
        # a full host RTT (~30 ms on tunneled transports) to every step
        # and measure the link rather than the chip.
        cache_after_warmup = step_fn._cache_size()
        t0 = time.time()
        for _ in range(steps):
            state, metrics = step_fn(state, sharded)
        final_loss = float(metrics["total_loss"])
        train_dt = time.time() - t0
        if trace_dir:
            jax.profiler.stop_trace()
        assert np.isfinite(final_loss), final_loss
        if step_fn._cache_size() != cache_after_warmup:
            print(
                f"# WARNING: train step retraced during timing "
                f"({cache_after_warmup} -> {step_fn._cache_size()} entries)",
                flush=True,
            )
        print(
            f"# {steps} chained steps in {train_dt:.3f}s "
            f"({train_dt / steps * 1e3:.1f} ms/step), final loss "
            f"{final_loss:.3f}",
            flush=True,
        )
    train_ips = batch_size * steps / train_dt

    # ---- realistic-density operating point (COCO ~7 objects/image) ----
    # Same array shapes as the timed batch (no recompile) with only ~6
    # valid gt per image: exercises the bucketed grid towers' small
    # branch (grid_cascade_head.TOWER_BUCKETS), which is where realistic
    # data lands — max_gt=32 dense synthetic is the worst case.
    train_ips_realistic = rt_dt = None
    try:
        rt = {k: np.array(v) for k, v in batch.items()}
        rt["gt_mask"] = rt["gt_mask"].copy()
        rt["gt_mask"][:, 6:] = False
        with mesh:
            sharded_rt = shard_batch(rt, mesh)
            state, metrics = step_fn(state, sharded_rt)
            float(metrics["total_loss"])  # barrier
            t0 = time.time()
            for _ in range(steps):
                state, metrics = step_fn(state, sharded_rt)
            float(metrics["total_loss"])
            rt_dt = time.time() - t0
        train_ips_realistic = batch_size * steps / rt_dt
        print(
            f"# realistic-density: {steps} steps in {rt_dt:.3f}s "
            f"({rt_dt / steps * 1e3:.1f} ms/step)",
            flush=True,
        )
    except Exception as e:  # never let the extra metric kill the bench
        print(f"# realistic-density point unavailable: {e}", flush=True)

    # MFU from XLA's cost analysis of the compiled step
    mfu = None
    try:
        cost = step_fn.lower(state, sharded).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0))
        kind = jax.devices()[0].device_kind
        peak = next(
            (v for k, v in PEAK_FLOPS.items() if kind.startswith(k)), 197e12
        )
        if flops_per_step > 0:
            mfu = flops_per_step / (train_dt / steps) / (peak * n_dev)
    except Exception as e:  # cost analysis is best-effort on some backends
        print(f"# cost_analysis unavailable: {e}", flush=True)

    # ---- inference throughput (batch-1 eval forward, TEST tops) ----
    from cpm_tpu.utils.amp import cast_floating_to, compute_dtype

    cdtype = compute_dtype(cfg)
    eval_params = cast_floating_to(state.params, cdtype)

    # params as an ARGUMENT, not a closure: closed-over arrays become HLO
    # constants — 100MB of literals per compile (and a rejected
    # remote-compile request on tunneled PJRT backends)
    @jax.jit
    def forward(p, images, image_sizes):
        return model.apply(
            {"params": p}, images.astype(cdtype), image_sizes, train=False
        )

    import jax.numpy as jnp

    def run_infer(bs, iters):
        """Depth-2 pipelined throughput + synchronous latency.

        Inputs are device-resident (the eval engine's loader pipelines
        host->device copies behind compute). Depth-2 = dispatch batch
        i+1, then read batch i — the eval engine's pattern
        (engine/test.py): the readout round trip overlaps the next
        batch's execution instead of serializing after it.
        """
        eb = synthetic_batch(
            batch_size=bs, height=height, width=width, max_gt=8,
            num_classes=81, seed=1,
        )
        images = jax.device_put(eb["images"])
        sizes = jax.device_put(eb["image_sizes"])
        d = forward(eval_params, images, sizes)
        float(d.scores.sum())  # force the warmup before timing
        t0 = time.time()
        for _ in range(3):
            d = forward(eval_params, images, sizes)
            float(d.scores.sum())
        sync_lat = (time.time() - t0) / 3 * 1e3
        t0 = time.time()
        pend = None
        total = 0.0
        for _ in range(iters):
            cur = forward(eval_params, images, sizes)
            if pend is not None:
                total += float(pend.scores.sum())
            pend = cur
        total += float(pend.scores.sum())
        dt = time.time() - t0
        assert np.isfinite(total)
        return bs * iters / dt, sync_lat

    # batch 1 = latency operating point; batch 4 = throughput operating
    # point (TEST.IMS_PER_GPU batching in the eval engine; measured
    # 12.7 / 16.2 / 19.8 img/s at bs 1/2/4 on v5e)
    infer_ips, infer_lat_ms = run_infer(1, 12)
    infer_ips /= n_dev
    infer_b4_ips, _ = run_infer(4, 6)
    infer_b4_ips /= n_dev

    loader_ips = measure_loader_throughput(cfg)
    pool_scaling = measure_pool_scaling()

    # Headline = the realistic-density point (~6 gt/image): the baseline
    # it is compared against (BASELINE_TRAIN_IPS_PER_CHIP, the reference
    # recipe's 8x TITAN RTX run) trains on real COCO at ~7 objects/image,
    # so this is the apples-to-apples operating point. The dense
    # max_gt=32 synthetic worst case is kept as step_ms_dense /
    # train_dense_* for continuity with BENCH_r01 (whose headline was
    # dense: 16.44 img/s/chip, 121.6 ms/step).
    per_chip_dense = train_ips / n_dev
    if train_ips_realistic:
        per_chip = train_ips_realistic / n_dev
        step_ms = rt_dt / steps * 1e3
    else:
        per_chip = per_chip_dense
        step_ms = train_dt / steps * 1e3
    print(
        json.dumps(
            dict(
                metric="cpm_r50_fpn_train_throughput_per_chip",
                value=round(per_chip, 3),
                unit="images/sec/chip",
                vs_baseline=round(per_chip / BASELINE_TRAIN_IPS_PER_CHIP, 3),
                infer_images_per_sec_per_chip=round(infer_ips, 3),
                infer_batch4_images_per_sec_per_chip=round(infer_b4_ips, 3),
                infer_batch1_latency_ms=round(infer_lat_ms, 1),
                step_ms=round(step_ms, 1),
                train_dense_images_per_sec_per_chip=round(
                    per_chip_dense, 3
                ),
                step_ms_dense=round(train_dt / steps * 1e3, 1),
                mfu=round(mfu, 4) if mfu is not None else None,
                host_loader_images_per_sec=(
                    round(loader_ips, 2) if loader_ips else None
                ),
                host_pool_scaling=pool_scaling,
                compute_dtype=str(cfg.TPU.COMPUTE_DTYPE),
            )
        )
    )


if __name__ == "__main__":
    main()
