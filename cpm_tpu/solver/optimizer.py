"""Optimizer construction: optax SGD with the reference's parameter groups.

Parity with /root/reference/pet/utils/optimizer.py:7-78:
  * three param groups — nonbias (weight decay), bias (2x LR via
    BIAS_DOUBLE_LR, optional weight decay), GroupNorm params (scaled
    weight decay WEIGHT_DECAY_GN);
  * SGD + momentum semantics identical to torch.optim.SGD (decoupled-from-
    lr momentum buffer: buf = m*buf + (g + wd*p); p -= lr*buf).

Freezing (done by module surgery in the reference —
backbone/ResNet.py:88-121 freeze_at + universal AffineChannel freeze,
pet/utils/net.py freeze_params) becomes a fourth 'frozen' label whose
updates are zeroed. Path rules:
  * any module path component starting with 'AffineChannel' (frozen BN);
  * backbone stem (conv1/conv2/conv3 + their norms) and layer1..layer{k-1}
    when FREEZE_AT = k >= 1.
"""

from typing import Any, Callable

import jax
import optax


def _path_names(path):
    out = []
    for p in path:
        key = getattr(p, "key", None)
        out.append(str(key if key is not None else p))
    return out


def classify_param(path_names, freeze_at: int) -> str:
    """Label one param path: frozen / bias / gn / nonbias."""
    names = path_names
    # frozen BN affines everywhere
    if any(n.startswith("AffineChannel") for n in names):
        return "frozen"
    # backbone freeze-at
    if "backbone" in names:
        i = names.index("backbone")
        rest = names[i + 1 :]
        if freeze_at >= 1 and rest and rest[0] in ("conv1", "conv2", "conv3"):
            return "frozen"
        for k in range(1, max(freeze_at, 1)):
            if rest and rest[0].startswith(f"layer{k}_"):
                return "frozen"
    leaf = names[-1]
    # reference quirk (optimizer.py:30-36): the 'bias' test runs BEFORE the
    # GroupNorm test, so GN biases land in the bias group (2x LR).
    if "bias" in leaf:
        return "bias"
    if any(n.startswith(("GroupNorm", "gn", "norm")) for n in names[:-1]):
        return "gn"
    return "nonbias"


def param_label_tree(params, freeze_at: int = 2):
    """Pytree of labels matching the params structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: classify_param(_path_names(path), freeze_at), params
    )


def build_optimizer(
    cfg, params, lr_fn: Callable
) -> optax.GradientTransformation:
    s = cfg.SOLVER
    momentum = float(s.MOMENTUM)
    wd = float(s.WEIGHT_DECAY)
    wd_gn = float(s.WEIGHT_DECAY_GN) * wd
    bias_wd = wd if s.BIAS_WEIGHT_DECAY else 0.0
    bias_scale = float(s.BIAS_DOUBLE_LR) + 1.0
    freeze_at = int(cfg.BACKBONE.RESNET.FREEZE_AT)

    def sgd_group(group_wd: float, lr_scale: float):
        chain = []
        if group_wd:
            chain.append(optax.add_decayed_weights(group_wd))
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=False))
        chain.append(
            optax.scale_by_schedule(lambda t: -lr_scale * lr_fn(t))
        )
        return optax.chain(*chain)

    opt_name = s.OPTIMIZER
    if opt_name == "SGD":
        transforms = {
            "nonbias": sgd_group(wd, 1.0),
            "bias": sgd_group(bias_wd, bias_scale),
            "gn": sgd_group(wd_gn, 1.0),
            "frozen": optax.set_to_zero(),
        }
    elif opt_name == "ADAM":
        adam = optax.chain(
            optax.scale_by_adam(),
            optax.scale_by_schedule(lambda t: -lr_fn(t)),
        )
        transforms = {
            "nonbias": adam,
            "bias": adam,
            "gn": adam,
            "frozen": optax.set_to_zero(),
        }
    elif opt_name == "RMSPROP":
        rms = optax.chain(
            optax.scale_by_rms(),
            optax.trace(decay=momentum) if momentum else optax.identity(),
            optax.scale_by_schedule(lambda t: -lr_fn(t)),
        )
        transforms = {
            "nonbias": rms,
            "bias": rms,
            "gn": rms,
            "frozen": optax.set_to_zero(),
        }
    else:
        raise ValueError(f"unsupported SOLVER.OPTIMIZER: {opt_name}")

    labels = param_label_tree(params, freeze_at)
    return optax.multi_transform(transforms, labels)
