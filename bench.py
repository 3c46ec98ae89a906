#!/usr/bin/env python
"""Benchmark: CPM R-CNN R-50-FPN train + inference throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

North-star (BASELINE.md): COCO images/sec/chip at R-50-FPN with box-mAP
parity, vs the reference 8x TITAN RTX recipe. The reference published no
throughput numbers; its recipe (global batch 16 over 8 GPUs, 180k iters
for a "2x" schedule ~= 2 weeks wall clock class) implies order
1.5-2 img/s/GPU — vs_baseline is measured against 1.75 img/s/chip.

Structured to land inside a driver wall-clock budget even after a VM
reset (first TPU backend init can take ~510 s): the headline
measurement — realistic-density train throughput + MFU — runs FIRST,
and every auxiliary stage (dense point, inference, host loader) is
gated on remaining budget (CPM_BENCH_BUDGET_S, default 480 s measured
from process start). If the budget is already gone when the headline
lands, the JSON line is printed immediately and the process exits 0.
The decode-pool scaling subprocess is opt-in via CPM_BENCH_POOL=1.

Set CPM_BENCH_TRACE=<dir> to capture a jax.profiler trace of the timed
steps. Runs the flagship CPM config (CMM+ISM+RSM, R-50-FPN, bf16 compute)
on synthetic batches at the training resolution (832x1344 bucket).
"""

import json
import os
import time

import numpy as np

T_START = time.time()
BUDGET_S = float(os.environ.get("CPM_BENCH_BUDGET_S", "480"))

# Self-healing across runs: auxiliary stages are budget-mortal by design
# (a cold-cache run spends the budget on compilation and emits headline
# only). Every run persists its non-None fields here; the next run
# carries forward any field it could not measure itself, listing them in
# "carried_fields" so a reader can tell fresh from carried.
SIDECAR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_sidecar.json")

BASELINE_TRAIN_IPS_PER_CHIP = 1.75  # see module docstring

# bf16 peak per chip by device kind (fallback: v5e)
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _elapsed() -> float:
    return time.time() - T_START


def _have_budget(need_s: float) -> bool:
    return _elapsed() + need_s < BUDGET_S


def measure_pool_scaling():
    """N-worker ImagePool decode scaling (tools/bench_host_pipeline.py)
    — evidence the host pipeline can feed a multi-chip slice. Opt-in
    (CPM_BENCH_POOL=1): it spawns a subprocess that can take minutes."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "bench_host_pipeline.py"),
             "--images", "32"],
            capture_output=True, text=True,
            timeout=max(30, BUDGET_S - _elapsed() - 10),
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
    # the production TrainLoader bucket for the 800/1333 recipe:
    # compute_buckets rounds the shortest side up to 32 -> exactly 800,
    # longest 1333 -> 1344 (cpm_tpu/data/loader.py)
    height, width = 800, 1344

    trace_dir = os.environ.get("CPM_BENCH_TRACE")

    # Result record: headline fields filled first, auxiliary fields
    # upgraded in place as budget-gated stages complete. Exactly one
    # JSON line is printed, as early as the budget demands.
    result = dict(
        metric="cpm_r50_fpn_train_throughput_per_chip",
        value=None,
        unit="images/sec/chip",
        vs_baseline=None,
        infer_images_per_sec_per_chip=None,
        infer_batch4_images_per_sec_per_chip=None,
        infer_batch1_latency_ms=None,
        step_ms=None,
        train_dense_images_per_sec_per_chip=None,
        step_ms_dense=None,
        train_real_loader_images_per_sec_per_chip=None,
        real_loader_overhead_pct=None,
        real_loader_wait_ms=None,
        real_loader_h2d_ms=None,
        mfu=None,
        host_loader_images_per_sec=None,
        host_pool_scaling=None,
        compute_dtype=str(cfg.TPU.COMPUTE_DTYPE),
    )

    def emit():
        # merge: fields this run could not measure are carried from the
        # last successful run's sidecar (and labeled as such)
        carried = []
        try:
            with open(SIDECAR) as f:
                prior = json.load(f)
            for k, v in result.items():
                if v is None and prior.get(k) is not None:
                    result[k] = prior[k]
                    carried.append(k)
        except Exception:
            pass
        if carried:
            result["carried_fields"] = carried
        try:
            with open(SIDECAR, "w") as f:
                json.dump(dict(result, _saved_at=time.time()), f, indent=1)
        except Exception:
            pass
        print(json.dumps(result), flush=True)

    # ---- HEADLINE: realistic-density train throughput (~6 gt/image,
    # COCO trains at ~7 objects/image — the apples-to-apples operating
    # point vs the reference recipe's 8x TITAN RTX run). The dense
    # max_gt=32 worst case is measured later if budget remains
    # (continuity with BENCH_r01, whose headline was dense). ----
    batch = synthetic_batch(
        batch_size=batch_size, height=height, width=width,
        max_gt=32, num_classes=81, seed=0,
    )
    # production input path: the loader ships raw uint8 pixels and the
    # model normalizes on device (TPU.DEVICE_NORMALIZE default) — so the
    # benched executable is the same one real training runs, and the
    # real-loader stage below can reuse it without a second compile.
    # Pixels cluster around the caffe means: the device affine then
    # yields ~N(0,1) inputs, keeping the random-init loss finite and the
    # loss trajectory comparable to the BENCH_r01-r03 f32 batches (raw
    # uniform u8 normalizes to +-128 and NaNs the untrained net).
    mean = np.asarray(cfg.PIXEL_MEANS, np.float32)  # BGR, TO_BGR255
    batch["images"] = np.clip(
        np.round(batch["images"] + mean), 0, 255
    ).astype(np.uint8)
    rt = {k: np.array(v) for k, v in batch.items()}
    rt["gt_mask"] = rt["gt_mask"].copy()
    rt["gt_mask"][:, 6:] = False

    mesh = make_mesh(n_dev)
    model, tx, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step_fn = jit_train_step(make_train_step(cfg, model, tx), mesh)
    steps, warmup = 8, 2
    with mesh:
        sharded_rt = shard_batch(rt, mesh)
        # AOT compile: trace + compile exactly once (the compile is a
        # persistent-cache hit on a warmed machine), and the compiled
        # executable's cost_analysis() is then free — no second
        # lower().compile() retrace after the timed loop (that retrace
        # is what pushed BENCH_r02-era runs past the driver budget).
        print(f"# tracing train step [t+{_elapsed():.0f}s]", flush=True)
        compiled = step_fn.lower(state, sharded_rt).compile()
        print(f"# compiled [t+{_elapsed():.0f}s]", flush=True)
        for w in range(warmup):
            state, metrics = compiled(state, sharded_rt)
            # readout barrier: block_until_ready alone returns before the
            # enqueued chain executes on tunneled PJRT backends, so without
            # this the warmup's work lands inside the first timed step
            float(metrics["total_loss"])
            print(f"# warmup {w + 1}/{warmup} [t+{_elapsed():.0f}s]",
                  flush=True)
        if trace_dir:
            jax.profiler.start_trace(trace_dir)
        # steps chain through `state`, so ONE readout at the end reliably
        # forces the whole sequence. This matches the production train
        # loop, which reads metrics only every DISPLAY_ITER — a per-step
        # readout would add a full host RTT (~30 ms on tunneled
        # transports) to every step and measure the link, not the chip.
        t0 = time.time()
        for _ in range(steps):
            state, metrics = compiled(state, sharded_rt)
        final_loss = float(metrics["total_loss"])
        rt_dt = time.time() - t0
        if trace_dir:
            jax.profiler.stop_trace()
        assert np.isfinite(final_loss), final_loss
        print(
            f"# realistic-density: {steps} chained steps in {rt_dt:.3f}s "
            f"({rt_dt / steps * 1e3:.1f} ms/step), final loss "
            f"{final_loss:.3f} [t+{_elapsed():.0f}s]",
            flush=True,
        )
    per_chip = batch_size * steps / rt_dt / n_dev
    step_ms = rt_dt / steps * 1e3
    result.update(
        value=round(per_chip, 3),
        vs_baseline=round(per_chip / BASELINE_TRAIN_IPS_PER_CHIP, 3),
        step_ms=round(step_ms, 1),
    )

    # MFU from XLA's cost analysis of the already-compiled executable
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0))
        kind = jax.devices()[0].device_kind
        peak = next(
            (v for k, v in PEAK_FLOPS.items() if kind.startswith(k)), 197e12
        )
        if flops_per_step > 0:
            result["mfu"] = round(
                flops_per_step / (rt_dt / steps) / (peak * n_dev), 4
            )
    except Exception as e:  # cost analysis is best-effort on some backends
        print(f"# cost_analysis unavailable: {e}", flush=True)

    # If the budget is effectively gone (cold backend init ate it),
    # publish the headline now and stop — a parsed artifact with the
    # headline beats a timeout with nothing.
    if not _have_budget(30):
        print(f"# budget exhausted at t+{_elapsed():.0f}s; "
              f"headline only", flush=True)
        emit()
        return

    # ---- dense worst-case point (max_gt=32; BENCH_r01 continuity) ----
    try:
        with mesh:
            # identical array shapes/dtypes as the realistic batch, so
            # the AOT-compiled executable serves it — no retrace
            sharded = shard_batch(batch, mesh)
            state, metrics = compiled(state, sharded)
            float(metrics["total_loss"])  # barrier
            t0 = time.time()
            for _ in range(steps):
                state, metrics = compiled(state, sharded)
            float(metrics["total_loss"])
            train_dt = time.time() - t0
        result.update(
            train_dense_images_per_sec_per_chip=round(
                batch_size * steps / train_dt / n_dev, 3
            ),
            step_ms_dense=round(train_dt / steps * 1e3, 1),
        )
        print(
            f"# dense: {steps} steps in {train_dt:.3f}s "
            f"({train_dt / steps * 1e3:.1f} ms/step) [t+{_elapsed():.0f}s]",
            flush=True,
        )
    except Exception as e:  # never let the extra metric kill the bench
        print(f"# dense point unavailable: {e}", flush=True)

    if not _have_budget(60):
        emit()
        return

    # ---- inference throughput (batch-1 eval forward, TEST tops) ----
    try:
        from cpm_tpu.utils.amp import cast_floating_to, compute_dtype

        cdtype = compute_dtype(cfg)
        eval_params = cast_floating_to(state.params, cdtype)

        # params as an ARGUMENT, not a closure: closed-over arrays become
        # HLO constants — 100MB of literals per compile (and a rejected
        # remote-compile request on tunneled PJRT backends)
        @jax.jit
        def forward(p, images, image_sizes):
            return model.apply(
                {"params": p}, images.astype(cdtype), image_sizes,
                train=False,
            )

        def run_infer(bs, iters):
            """Depth-2 pipelined throughput + synchronous latency.

            Inputs are device-resident (the eval engine's loader
            pipelines host->device copies behind compute). Depth-2 =
            dispatch batch i+1, then read batch i — the eval engine's
            pattern (engine/test.py): the readout round trip overlaps
            the next batch's execution instead of serializing after it.
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

        # batch 1 = latency operating point; batch 4 = throughput
        # operating point (TEST.IMS_PER_GPU batching in the eval engine)
        infer_ips, infer_lat_ms = run_infer(1, 12)
        result.update(
            infer_images_per_sec_per_chip=round(infer_ips / n_dev, 3),
            infer_batch1_latency_ms=round(infer_lat_ms, 1),
        )
        if _have_budget(45):
            infer_b4_ips, _ = run_infer(4, 6)
            result["infer_batch4_images_per_sec_per_chip"] = round(
                infer_b4_ips / n_dev, 3
            )
        print(f"# inference done [t+{_elapsed():.0f}s]", flush=True)
    except Exception as e:
        print(f"# inference point unavailable: {e}", flush=True)

    # ---- real-loader-fed train steps: the full production loop (JPEG
    # decode -> resize -> pad -> H2D -> jitted step), vs the resident-
    # data headline. Shares the compiled executable: the loader's padded
    # u8 batches have the same shapes/dtypes as the synthetic ones. ----
    if _have_budget(60):
        try:
            import copy as _copy
            import tempfile

            from PIL import Image

            from cpm_tpu.data.coco import COCODataset
            from cpm_tpu.data.loader import TrainLoader

            loader_cfg = _copy.deepcopy(cfg)
            loader_cfg.TRAIN.MAX_GT_BOXES = 32  # match compiled gt pad
            # flagship recipe scales (the synthetic batch's 832x1344
            # bucket); _flagship_cfg leaves the config defaults (600)
            loader_cfg.TRAIN.SCALES = (800,)
            loader_cfg.TRAIN.MAX_SIZE = 1333
            rng = np.random.RandomState(1)
            with tempfile.TemporaryDirectory() as td:
                img_dir = os.path.join(td, "images")
                os.makedirs(img_dir)
                images_meta, annotations = [], []
                for i in range(12):
                    h, w = 800, 1216
                    arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
                    Image.fromarray(arr).save(
                        os.path.join(img_dir, f"{i:06d}.jpg"), quality=90
                    )
                    images_meta.append(dict(
                        id=i + 1, file_name=f"{i:06d}.jpg",
                        width=w, height=h,
                    ))
                    annotations.append(dict(
                        id=i + 1, image_id=i + 1, category_id=1,
                        bbox=[10.0, 10.0, 100.0, 100.0], area=10000.0,
                        iscrowd=0,
                    ))
                ann = os.path.join(td, "ann.json")
                with open(ann, "w") as f:
                    json.dump(dict(
                        images=images_meta, annotations=annotations,
                        categories=[dict(id=1, name="c1")],
                    ), f)
                ds = COCODataset(ann, img_dir)
                loader = TrainLoader(
                    loader_cfg, ds, batch_size=batch_size, prefetch=2
                )
                it = iter(loader)
                with mesh:
                    b0 = next(it)
                    assert b0["images"].shape == rt["images"].shape, (
                        b0["images"].shape, rt["images"].shape
                    )
                    state, metrics = compiled(
                        state, shard_batch(b0, mesh)
                    )
                    float(metrics["total_loss"])  # warm barrier
                    # depth-1 device-side prefetch: H2D of batch i+1 is
                    # enqueued (device_put is async) before reading
                    # batch i's step, so the transfer rides behind the
                    # device compute like the production train loop
                    t_wait = 0.0
                    t0 = time.time()
                    pending = shard_batch(next(it), mesh)
                    for s in range(steps):
                        state, metrics = compiled(state, pending)
                        if s + 1 < steps:
                            t1 = time.time()
                            nb = next(it)
                            t_wait += time.time() - t1
                            pending = shard_batch(nb, mesh)
                    float(metrics["total_loss"])
                    real_dt = time.time() - t0
                    # attribution probe: synchronous H2D cost of one
                    # batch (the tunnel serializes transfers; on a local
                    # host this rides DMA behind compute)
                    t1 = time.time()
                    for _ in range(4):
                        jax.block_until_ready(shard_batch(b0, mesh))
                    h2d_ms = (time.time() - t1) / 4 * 1e3
                del it, loader
            real_ips = batch_size * steps / real_dt / n_dev
            result.update(
                train_real_loader_images_per_sec_per_chip=round(
                    real_ips, 3
                ),
                real_loader_overhead_pct=round(
                    (1.0 - real_ips / per_chip) * 100.0, 1
                ),
                real_loader_wait_ms=round(t_wait / steps * 1e3, 1),
                real_loader_h2d_ms=round(h2d_ms, 1),
            )
            print(
                f"# real-loader: {steps} steps in {real_dt:.3f}s "
                f"({real_dt / steps * 1e3:.1f} ms/step, "
                f"{result['real_loader_overhead_pct']}% over resident; "
                f"loader-wait {t_wait / steps * 1e3:.1f} ms/step) "
                f"[t+{_elapsed():.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"# real-loader point unavailable: {e}", flush=True)

    # ---- host data path (decode-only loader rate; pool scaling) ----
    if _have_budget(45):
        try:
            loader_ips = measure_loader_throughput(cfg)
            if loader_ips:
                result["host_loader_images_per_sec"] = round(loader_ips, 2)
        except Exception as e:
            print(f"# loader point unavailable: {e}", flush=True)
    if os.environ.get("CPM_BENCH_POOL") != "0" and _have_budget(90):
        result["host_pool_scaling"] = measure_pool_scaling()

    emit()


if __name__ == "__main__":
    main()
