#!/usr/bin/env python
"""Train CLI.

Same contract as the reference /root/reference/tools/rcnn/train_net.py:
`python tools/train_net.py --cfg cfgs/... [KEY VALUE ...]` — YAML config +
trailing key-value overrides. The NCCL/DDP launch machinery
(--local_rank, torch.distributed.launch) is replaced by the jax runtime:
all local TPU chips form the data mesh automatically; multi-host runs call
jax.distributed.initialize().
"""

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="CPM R-CNN TPU training")
    p.add_argument("--cfg", dest="cfg_file", required=True)
    p.add_argument(
        "--multihost", action="store_true",
        help="call jax.distributed.initialize() for multi-host meshes",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    from cpm_tpu.utils.platform_env import honor_jax_platforms_env

    honor_jax_platforms_env()
    if args.multihost:
        import jax

        jax.distributed.initialize()
    import jax
    import numpy as np

    from cpm_tpu.config import (
        assert_and_infer_cfg,
        cfg,
        merge_cfg_from_file,
        merge_cfg_from_list,
    )
    from cpm_tpu.data.coco import build_dataset
    from cpm_tpu.data.loader import TrainLoader
    from cpm_tpu.engine.checkpoint import CheckPointer
    from cpm_tpu.engine.train import (
        create_train_state,
        jit_train_step,
        make_train_step,
    )
    from cpm_tpu.parallel.mesh import make_mesh, shard_batch
    from cpm_tpu.utils.logger import TrainingLogger

    merge_cfg_from_file(args.cfg_file)
    if args.opts:
        merge_cfg_from_list(args.opts)
    assert_and_infer_cfg(make_immutable=False)

    ckpt_dir = cfg.CKPT
    os.makedirs(ckpt_dir, exist_ok=True)
    shutil.copyfile(
        args.cfg_file,
        os.path.join(ckpt_dir, os.path.basename(args.cfg_file)),
    )

    n_devices = jax.local_device_count()
    world = jax.process_count()
    rank = jax.process_index()
    global_batch = cfg.TRAIN.BATCH_SIZE
    local_batch = max(global_batch // world, n_devices)

    datasets = build_dataset(cfg, cfg.TRAIN.DATASETS, is_train=True)
    if len(datasets) == 1:
        dataset = datasets[0]
    else:
        from cpm_tpu.data.coco import ConcatDataset

        dataset = ConcatDataset(datasets)
    loader = TrainLoader(
        cfg, dataset, local_batch, rank=rank, world_size=world,
        seed=cfg.SEED,
    )

    sample = next(iter(loader))
    model, tx, state = create_train_state(
        cfg, jax.random.PRNGKey(cfg.SEED), sample
    )

    # pretrained backbone
    if cfg.TRAIN.WEIGHTS and os.path.exists(cfg.TRAIN.WEIGHTS):
        from cpm_tpu.utils.weight_import import (
            import_resnet_backbone,
            merge_backbone_into_params,
        )

        bb = import_resnet_backbone(
            cfg.TRAIN.WEIGHTS,
            layers=tuple(cfg.BACKBONE.RESNET.LAYERS),
            conv1_rgb2bgr=cfg.MODEL.CONV1_RGB2BGR,
        )
        state = state.replace(
            params=merge_backbone_into_params(state.params, bb)
        )
        print(f"loaded pretrained backbone from {cfg.TRAIN.WEIGHTS}")

    mesh = make_mesh()
    checkpointer = CheckPointer(
        ckpt_dir, auto_resume=cfg.TRAIN.AUTO_RESUME
    )
    restored = checkpointer.load(state) if checkpointer.resumed else None
    if restored is not None:
        if world > 1:
            # restored leaves are process-local; rebuild them as GLOBAL
            # arrays replicated over the mesh (each process contributes
            # its full local copy — no cross-host transfer), or the
            # jitted step rejects the shardings
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            restored = jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    rep, np.asarray(x)
                ),
                restored,
            )
        state = restored
        # fast-forward the data stream to the checkpointed iteration so
        # the resumed run consumes the identical batch sequence an
        # uninterrupted run would (reference: IterationBasedBatchSampler
        # restarted at scheduler.iteration, tools/rcnn/train_net.py:127)
        step0 = int(np.asarray(jax.device_get(
            state.step.addressable_shards[0].data
            if hasattr(state.step, "addressable_shards")
            else state.step
        )))
        loader.start_iter = step0
        print(f"auto-resumed from iter {step0}")
    step_fn = jit_train_step(make_train_step(cfg, model, tx), mesh)
    logger = TrainingLogger(
        cfg.MODEL.TYPE, log_period=cfg.DISPLAY_ITER,
        max_iter=cfg.SOLVER.MAX_ITER,
    )

    start_iter = int(state.step)
    it = start_iter
    with mesh:
        for batch in loader:
            if it >= cfg.SOLVER.MAX_ITER:
                break
            logger.iter_tic()
            state, metrics = step_fn(state, shard_batch(batch, mesh))
            it += 1
            if it % cfg.DISPLAY_ITER == 0 or it == cfg.SOLVER.MAX_ITER:
                metrics = jax.tree_util.tree_map(float, metrics)
                logger.update_stats(metrics, it)
                logger.log_stats(it)
            logger.iter_toc()
            # checkpoint save is a COLLECTIVE: every rank calls it and
            # orbax writes once from the primary (the jax equivalent of
            # the reference's rank-0 torch.save, train_net.py:84-88 —
            # a rank-0-only call would hang orbax's finalize barrier
            # under jax.distributed)
            if (
                it % cfg.SOLVER.SNAPSHOT_ITERS == 0
                or it == cfg.SOLVER.MAX_ITER
            ):
                checkpointer.save(state, it, snapshot=True)
    checkpointer.save(state, it, snapshot=False)
    print("training done at iter", it)


if __name__ == "__main__":
    main()
