"""Iteration-based LR schedules as pure jax functions.

Parity with /root/reference/pet/utils/lr_scheduler.py:17-127: CONSTANT /
LINEAR warmup, then STEP / COSINE / STEP_COSINE / POLY policies. The
scheduler there mutates optimizer param groups imperatively; here the
schedule is a jit-traceable fn(step) -> lr used by optax, so the LR lives
inside the compiled train step (no host round trip per iteration).
"""

import numpy as np
import jax.numpy as jnp


def make_lr_fn(solver):
    """solver: cfg.SOLVER namespace/AttrDict. Returns fn(step) -> lr.

    Step convention follows the reference: iteration starts at 1 and
    warmup covers iterations <= WARM_UP_ITERS (lr_scheduler.py:73-83).
    """
    base_lr = float(solver.BASE_LR)
    policy = solver.LR_POLICY
    warmup_iters = int(solver.WARM_UP_ITERS)
    warmup_factor = float(solver.WARM_UP_FACTOR)
    warmup_method = solver.WARM_UP_METHOD
    max_iter = int(solver.MAX_ITER)
    gamma = float(solver.GAMMA)
    steps = tuple(int(s) for s in solver.STEPS)
    lr_pow = float(getattr(solver, "LR_POW", 0.9))

    def lr_fn(step):
        it = jnp.asarray(step, jnp.float32) + 1.0  # 1-based iteration

        if warmup_method == "CONSTANT":
            wf = jnp.asarray(warmup_factor, jnp.float32)
        else:  # LINEAR
            alpha = it / max(warmup_iters, 1)
            wf = warmup_factor * (1 - alpha) + alpha
        warm_lr = base_lr * wf

        if policy == "STEP":
            n_passed = sum((it > s).astype(jnp.float32) for s in steps)
            main_lr = base_lr * gamma**n_passed
        elif policy == "COSINE":
            actual = max(max_iter - warmup_iters, 1)
            main_lr = (
                0.5
                * base_lr
                * (jnp.cos((it - warmup_iters - 1) * jnp.pi / actual) + 1.0)
            )
        elif policy == "STEP_COSINE":
            n_passed = sum((it > s).astype(jnp.float32) for s in steps)
            step_lr = base_lr * gamma**n_passed
            n_full = float(np.sum(np.array(steps) < steps[-1])) + 0.0
            new_base = base_lr * gamma ** float(
                np.searchsorted(np.array(steps), steps[-1] - 1, "right")
            )
            actual = max(max_iter - steps[-1], 1)
            cos_lr = (
                0.5
                * new_base
                * (jnp.cos((it - steps[-1] - 1) * jnp.pi / actual) + 1.0)
            )
            main_lr = jnp.where(it < steps[-1], step_lr, cos_lr)
        elif policy == "POLY":
            actual = max(max_iter - warmup_iters, 1)
            main_lr = base_lr * (
                (1.0 - (it - warmup_iters - 1) / actual) ** lr_pow
            )
        else:
            raise KeyError(f"Unknown SOLVER.LR_POLICY: {policy}")

        return jnp.where(it <= warmup_iters, warm_lr, main_lr)

    return lr_fn
