"""Training engine: TrainState + jitted data-parallel train step.

Replaces the reference train loop (tools/rcnn/train_net.py:56-89 +
TrainingLogger.update_stats assembling total_loss as the sum of the loss
dict, pet/utils/logger.py:47-56). The whole optimizer step — forward,
backward, SGD update, LR schedule — is one jitted program over the data
mesh; gradients all-reduce over ICI inside the compiled step (no DDP).
"""

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from cpm_tpu.modeling.model import build_model
from cpm_tpu.parallel.mesh import batch_sharding, replicated_sharding
from cpm_tpu.solver import build_optimizer, make_lr_fn
from cpm_tpu.utils.amp import cast_floating_to, cast_images, compute_dtype


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jnp.ndarray


def batch_gt(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return dict(
        boxes=batch["gt_boxes"],
        labels=batch["gt_labels"],
        mask=batch["gt_mask"],
    )


def create_train_state(cfg, rng, sample_batch):
    """Initialize model params + optimizer state from one example batch."""
    model = build_model(cfg)
    p_rng, s_rng, loop_rng = jax.random.split(rng, 3)
    # jit the init: eager flax init dispatches thousands of individual ops
    # (each a separate XLA mini-compile) — one compiled program is much
    # faster, especially on CPU test rigs.
    init_fn = jax.jit(
        lambda rngs, images, sizes, gt: model.init(
            rngs, images, sizes, gt=gt, train=True
        )
    )
    variables = init_fn(
        {"params": p_rng, "sample": s_rng},
        sample_batch["images"],
        sample_batch["image_sizes"],
        batch_gt(sample_batch),
    )
    # strip weak types: a weak-typed leaf (e.g. from jnp.full with a python
    # scalar in an initializer) becomes strong after `p + update`, changing
    # the jit signature and silently retracing+recompiling the train step
    # on its SECOND call — ~2.5 min per recompile for the full CPM program
    params = jax.tree_util.tree_map(
        lambda x: jax.lax.convert_element_type(x, x.dtype),
        variables["params"],
    )
    lr_fn = make_lr_fn(cfg.SOLVER)
    tx = build_optimizer(cfg, params, lr_fn)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=loop_rng,
    )
    return model, tx, state


def make_train_step(cfg, model, tx) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    Mixed precision (TPU.COMPUTE_DTYPE=bfloat16): params and images are
    cast to bf16 inside the loss — convs/matmuls run bf16 on the MXU —
    while the f32 master params receive f32 gradients through the cast
    (see cpm_tpu.utils.amp).
    """
    lr_fn = make_lr_fn(cfg.SOLVER)
    cdtype = compute_dtype(cfg)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        step_rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            p = cast_floating_to(params, cdtype)
            images = cast_images(batch["images"], cdtype)
            losses = model.apply(
                {"params": p},
                images,
                batch["image_sizes"],
                gt=batch_gt(batch),
                train=True,
                rngs={"sample": step_rng},
            )
            losses = {k: v.astype(jnp.float32) for k, v in losses.items()}
            total = sum(losses.values())
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["lr"] = lr_fn(state.step)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            rng=state.rng,
        )
        return new_state, metrics

    return train_step


def jit_train_step(train_step, mesh):
    """Jit with params replicated and batch sharded over the data axis."""
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
