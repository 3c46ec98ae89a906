"""Weight-standardized convs behind the reference's USE_WS knobs.

The reference post-hoc rewrites every nn.Conv2d inside a gated module into
Conv2dWS (convert_conv2convws_model, pet/models/imagenet/utils.py:51-68;
gates at backbone/ResNet.py:291-321, fpn/FPN.py:77-78,
fast_rcnn/heads/{mlp,convfc}_heads.py, grid_rcnn/heads/cls_heads.py:38).
Conv2dWS (pet/lib/ops/conv2d_ws.py:6-19) standardizes the kernel at every
forward: per-output-channel mean over (in, kh, kw) subtracted, then divided
by the UNBIASED std of the centered kernel + 1e-5. Stored weights stay raw,
so checkpoints are interchangeable with the unconverted model.

TPU-native equivalent: a functional params transform. `maybe_ws` lifts the
whole Flax module class with nn.map_variables so that every 4-D "kernel"
leaf in its param subtree is standardized on read, inside the jitted
forward (differentiable; the param tree structure and names are identical
to the unconverted module, so the torch->jax weight importer and
checkpoints are unaffected). One storage-convention difference from the
reference: flax's map_variables(init=True) stores the *standardized*
kernels at fresh init (the reference's Conv2dWS stores the raw kaiming
draw), but standardization is idempotent to ~1e-5, so the effective
initial forward function matches the reference to float tolerance, and
imported/loaded weights behave identically since the transform applies on
read regardless of provenance.
Leaves not named "kernel" are skipped. DeformConvPack /
ModulatedDeformConvPack register their main deform weight as
self.param("weight", ...) (ops/deform_conv.py) precisely so this rule
matches the reference, whose isinstance(_ConvNd) check converts the
offset-predicting nn.Conv2d inside DeformConvPack but never the
DeformConv module's own weight (it subclasses plain nn.Module,
deform_conv.py:472-511). Dense kernels are 2-D and are skipped too (the
reference converts convs only). Pinned by
tests/test_ws.py::test_ws_skips_deform_main_weight.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn


def ws_standardize_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """Conv2dWS.forward numerics on an HWIO kernel (conv2d_ws.py:12-19)."""
    mean = jnp.mean(k, axis=(0, 1, 2), keepdims=True)
    centered = k - mean
    n = k.shape[0] * k.shape[1] * k.shape[2]
    # torch .std() is unbiased (n-1); guard n==1 (1x1 conv on 1 input ch)
    var = jnp.sum(centered * centered, axis=(0, 1, 2), keepdims=True) / max(
        n - 1, 1
    )
    return centered / (jnp.sqrt(var) + 1e-5)


def _standardize_tree(variables):
    def visit(path, x):
        key = getattr(path[-1], "key", None)
        if key == "kernel" and getattr(x, "ndim", 0) == 4:
            return ws_standardize_kernel(x)
        return x

    return jax.tree_util.tree_map_with_path(visit, variables)


def maybe_ws(module_cls, use_ws: bool):
    """Return module_cls, or its WS-lifted twin when use_ws.

    The lifted class keeps the original __name__ so Flax auto-naming (and
    therefore every param path) is unchanged.
    """
    if not use_ws:
        return module_cls
    lifted = nn.map_variables(
        module_cls, "params", trans_in_fn=_standardize_tree, init=True
    )
    lifted.__name__ = module_cls.__name__
    try:
        lifted.__qualname__ = module_cls.__qualname__
    except AttributeError:
        pass
    return lifted
