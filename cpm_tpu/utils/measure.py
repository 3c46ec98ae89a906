"""Model measurement: parameter counts and FLOPs.

Replaces the reference's measure.py / analyser.py (pet/utils/measure.py:99,
dead lib/utils/analyser.py) with jax-native implementations: params from
the pytree, FLOPs from XLA's own cost analysis of the jitted forward —
exact for the compiled program rather than a per-module estimate.
"""

from typing import Callable, Dict

import jax
import numpy as np


def count_params(params) -> int:
    return sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
    )


def param_breakdown(params) -> Dict[str, int]:
    """Top-level module -> parameter count."""
    out = {}
    for key, sub in params.items():
        out[key] = count_params(sub)
    return out


def flops_of(fn: Callable, *args) -> float:
    """FLOPs of the jitted fn(*args) from XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    return float(cost.get("flops", -1.0))


def flops_and_params(cfg, model, images, image_sizes) -> Dict:
    """FLOPs + params of the eval forward for a built model
    (the capability of tools/rcnn/scripts/compute_fcos_flops.py, for every
    model family)."""
    variables = jax.eval_shape(
        lambda: model.init(
            {
                "params": jax.random.PRNGKey(0),
                "sample": jax.random.PRNGKey(1),
            },
            images, image_sizes, train=False,
        )
    )
    params = jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, a.dtype), variables["params"]
    )

    def fwd(p, im, sz):
        return model.apply({"params": p}, im, sz, train=False)

    return dict(
        input_hw=[int(images.shape[1]), int(images.shape[2])],
        params=count_params(params),
        params_by_module=param_breakdown(params),
        eval_forward_flops=flops_of(fwd, params, images, image_sizes),
    )
