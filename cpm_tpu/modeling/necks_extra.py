"""Alternative FPN necks: HRFPN, NASFPN, BiFPN.

Parity with the reference registrations (pet/rcnn/modeling/fpn/HRFPN.py:14,
NASFPN.py:72, BiFPN.py:52 — registered in FPN_BODY but unused by CPM
configs). Standard published architectures, NHWC Flax:
  * HRFPN: concat all levels at the finest resolution -> 1x1 reduce ->
    avg-pool pyramid -> per-level 3x3;
  * NASFPN: the learned GP/sum merging cell sequence (Ghiasi et al. 2019);
  * BiFPN: bidirectional top-down/bottom-up passes with fast normalized
    fusion (Tan et al. 2020).
"""

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from cpm_tpu.modeling import registry
from cpm_tpu.modeling.fpn import get_min_max_levels, nearest_upsample_2x


def _resize_to(x, target_hw):
    """Nearest resize by power-of-two up/down sampling."""
    h, w = x.shape[1:3]
    th, tw = target_hw
    while h < th:
        x = nearest_upsample_2x(x)
        h, w = x.shape[1:3]
    while h > th:
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h, w = x.shape[1:3]
    return x


class HRFPN(nn.Module):
    fpn_dim: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        target = feats[0].shape[1:3]
        ups = [_resize_to(f, target) for f in feats]
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(self.fpn_dim, (1, 1), name="reduce")(x)
        outs = []
        cur = x
        for i in range(self.num_outs):
            outs.append(
                nn.Conv(
                    self.fpn_dim, (3, 3), padding=1, name=f"out{i}"
                )(cur)
            )
            cur = nn.avg_pool(cur, (2, 2), strides=(2, 2))
        return outs


class BiFPNLayer(nn.Module):
    fpn_dim: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        n = len(feats)

        def fuse(inputs, name):
            w = self.param(
                f"{name}_w", nn.initializers.ones, (len(inputs),)
            )
            w = jax.nn.relu(w)
            w = w / (jnp.sum(w) + 1e-4)
            s = sum(wi * x for wi, x in zip(w, inputs))
            s = nn.swish(s)
            return nn.Conv(
                self.fpn_dim, (3, 3), padding=1,
                feature_group_count=1, name=f"{name}_conv",
            )(s)

        # top-down
        td = [None] * n
        td[n - 1] = feats[n - 1]
        for i in range(n - 2, -1, -1):
            up = _resize_to(td[i + 1], feats[i].shape[1:3])
            td[i] = fuse([feats[i], up], f"td{i}")
        # bottom-up
        out = [None] * n
        out[0] = td[0]
        for i in range(1, n):
            down = nn.max_pool(
                out[i - 1], (2, 2), strides=(2, 2)
            )
            down = _resize_to(down, feats[i].shape[1:3])
            ins = [feats[i], td[i], down] if i < n - 1 else [td[i], down]
            out[i] = fuse(ins, f"bu{i}")
        return out


class BiFPN(nn.Module):
    fpn_dim: int = 256
    num_layers: int = 2
    num_outs: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        x = [
            nn.Conv(self.fpn_dim, (1, 1), name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        # extra coarser levels
        while len(x) < self.num_outs:
            x.append(nn.max_pool(x[-1], (2, 2), strides=(2, 2)))
        for l in range(self.num_layers):
            x = BiFPNLayer(self.fpn_dim, name=f"layer{l}")(x)
        return x


class NASFPN(nn.Module):
    """NAS-FPN merging-cell sequence (Ghiasi et al. 2019, fig. 7)."""

    fpn_dim: int = 256
    num_outs: int = 5

    def _gp(self, a, b):
        """Global-pooling cell: attention from a applied to b, + b."""
        attn = jax.nn.sigmoid(jnp.mean(a, axis=(1, 2), keepdims=True))
        return attn * _resize_to(b, a.shape[1:3]) + a

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        x = [
            nn.Conv(self.fpn_dim, (1, 1), name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        while len(x) < self.num_outs:
            x.append(nn.max_pool(x[-1], (2, 2), strides=(2, 2)))
        p3, p4, p5, p6, p7 = x[: self.num_outs]

        def rcb(h, name):  # relu-conv (3x3)
            return nn.Conv(
                self.fpn_dim, (3, 3), padding=1, name=name
            )(nn.relu(h))

        # the published cell order
        gp1 = self._gp(p4, p6)
        r4 = rcb(gp1, "rcb1")
        s1 = r4 + _resize_to(p4, r4.shape[1:3])
        r4b = rcb(s1, "rcb2")
        s2 = _resize_to(r4b, p3.shape[1:3]) + p3
        out3 = rcb(s2, "rcb3")
        g2 = self._gp(r4b, out3)
        out4 = rcb(g2, "rcb4")
        g3 = self._gp(r4, out4)
        out5 = rcb(_resize_to(g3, p5.shape[1:3]), "rcb5")
        g4 = self._gp(out5, out4)
        out7 = rcb(_resize_to(g4, p7.shape[1:3]), "rcb6")
        g5 = self._gp(out7, out5)
        out6 = rcb(_resize_to(g5, p6.shape[1:3]), "rcb7")
        return [out3, out4, out5, out6, out7]


@registry.FPN_BODY.register("hrfpn")
def build_hrfpn(cfg):
    _, max_level = get_min_max_levels(cfg)
    return HRFPN(
        fpn_dim=cfg.FPN.DIM,
        num_outs=max_level - cfg.FPN.LOWEST_BACKBONE_LVL + 1,
    )


@registry.FPN_BODY.register("bifpn")
def build_bifpn(cfg):
    _, max_level = get_min_max_levels(cfg)
    return BiFPN(
        fpn_dim=cfg.FPN.DIM,
        num_outs=max_level - cfg.FPN.LOWEST_BACKBONE_LVL + 1,
    )


@registry.FPN_BODY.register("nasfpn")
def build_nasfpn(cfg):
    _, max_level = get_min_max_levels(cfg)
    return NASFPN(
        fpn_dim=cfg.FPN.DIM,
        num_outs=max_level - cfg.FPN.LOWEST_BACKBONE_LVL + 1,
    )
