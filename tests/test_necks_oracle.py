"""Oracle tests: HRFPN / NASFPN / BiFPN activation parity vs the
reference's own torch modules (pet/rcnn/modeling/fpn/{HRFPN,NASFPN,
BiFPN}.py) with identical weights.

Each test builds the reference module on CPU torch, copies its weights
into the Flax twin (OIHW -> HWIO), runs both on the same random pyramid
[C2..C5], and asserts every output level matches to float tolerance —
including the reference quirks these modules pin: GP cells gating on the
global MAX pool, max-pool(ceil)/nearest resizes, NASFPN's two conv-less
GP cells, and BiFPN's un-weighted third fusion input (BiFPN.py:45).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from tests.ref_oracle import install_reference_stubs


FEAT_SPEC = [(16, 8), (8, 16), (4, 32), (2, 64)]  # (side, channels) C2..C5
DIM = 16


def _inputs(seed=0, batch=2):
    rng = np.random.RandomState(seed)
    return [
        rng.randn(batch, c, s, s).astype(np.float32) for s, c in FEAT_SPEC
    ]


def _ref_setup():
    install_reference_stubs()
    import torch  # noqa: F401

    from pet.rcnn.core.config import cfg as ref_cfg

    return ref_cfg


class _cfg_override:
    """Temporarily set pet's global cfg keys (other oracle tests share
    the module-level cfg object)."""

    def __init__(self, ref_cfg, values):
        self.cfg = ref_cfg
        self.values = values
        self.saved = {}

    def __enter__(self):
        for dotted, v in self.values.items():
            node = self.cfg
            *parents, leaf = dotted.split(".")
            for p in parents:
                node = node[p]
            self.saved[dotted] = node[leaf]
            node[leaf] = v
        return self.cfg

    def __exit__(self, *exc):
        for dotted, v in self.saved.items():
            node = self.cfg
            *parents, leaf = dotted.split(".")
            for p in parents:
                node = node[p]
            node[leaf] = v


def _t2j_conv(w):
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 1, 0)))


def _t2j(w):
    return jnp.asarray(w.detach().numpy())


def _load_params(init_params, state_dict, key_fn):
    """Rebuild the flax param tree, fetching each leaf's torch tensor by
    the per-neck naming rule. Every torch param must be consumed."""
    flat = traverse_util.flatten_dict(init_params)
    used = set()
    out = {}
    for path, leaf in flat.items():
        tkey = key_fn(path)
        t = state_dict[tkey]
        used.add(tkey)
        val = _t2j_conv(t) if path[-1] == "kernel" else _t2j(t)
        assert val.shape == leaf.shape, (path, tkey, val.shape, leaf.shape)
        out[path] = val
    unused = set(state_dict) - used
    assert not unused, f"torch params not mapped: {sorted(unused)}"
    return traverse_util.unflatten_dict(out)


def _compare(ref_outs, our_outs, atol=1e-4):
    assert len(ref_outs) == len(our_outs)
    for lvl, (r, o) in enumerate(zip(ref_outs, our_outs)):
        r = r.detach().numpy()
        o = np.transpose(np.asarray(o), (0, 3, 1, 2))
        np.testing.assert_allclose(
            o, r, rtol=1e-4, atol=atol, err_msg=f"level {lvl}"
        )


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pooling", ["AVG", "MAX"])
def test_hrfpn_oracle(pooling):
    ref_cfg = _ref_setup()
    import torch

    from cpm_tpu.modeling.necks_extra import HRFPN

    with _cfg_override(
        ref_cfg,
        {"FPN.HRFPN.DIM": DIM, "FPN.HRFPN.POOLING_TYPE": pooling},
    ):
        from pet.rcnn.modeling.fpn.HRFPN import hrfpn

        torch.manual_seed(0)
        ref = hrfpn(
            dim_in=[c for _, c in FEAT_SPEC],
            spatial_scale=[0.25, 0.125, 0.0625, 0.03125],
        ).eval()

    x = _inputs()
    with torch.no_grad():
        ref_outs = ref([torch.from_numpy(v) for v in x])

    ours = HRFPN(fpn_dim=DIM, pooling=pooling)
    feats = [jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in x]
    init = ours.init(jax.random.PRNGKey(0), feats)["params"]

    # make_conv returns the bare conv when it is the only module
    # (pet/utils/net.py tail), so no Sequential ".0" in the keys
    def key_fn(path):
        mod = path[0]
        kind = "weight" if path[-1] == "kernel" else "bias"
        if mod == "reduction_conv":
            return f"reduction_conv.{kind}"
        assert mod.startswith("fpn_conv")
        return f"fpn_conv.{mod[len('fpn_conv'):]}.{kind}"

    params = _load_params(init, ref.state_dict(), key_fn)
    _compare(ref_outs, ours.apply({"params": params}, feats))


def test_nasfpn_oracle():
    ref_cfg = _ref_setup()
    import torch

    from cpm_tpu.modeling.necks_extra import NASFPN

    with _cfg_override(
        ref_cfg,
        {
            "FPN.NASFPN.DIM": DIM,
            "FPN.NASFPN.NUM_STACK": 2,
            "FPN.MULTILEVEL_RPN": True,
            "FPN.MULTILEVEL_ROIS": True,
            "FPN.RPN_MAX_LEVEL": 6,
            "FPN.RPN_MIN_LEVEL": 2,
            "FPN.ROI_MAX_LEVEL": 5,
            "FPN.ROI_MIN_LEVEL": 2,
        },
    ):
        from pet.rcnn.modeling.fpn.NASFPN import nasfpn

        torch.manual_seed(0)
        ref = nasfpn(
            dim_in=[c for _, c in FEAT_SPEC],
            spatial_scale=[0.25, 0.125, 0.0625, 0.03125],
        ).eval()

    x = _inputs(seed=1)
    with torch.no_grad():
        ref_outs = ref([torch.from_numpy(v) for v in x])

    ours = NASFPN(
        fpn_dim=DIM, num_stack=2, min_level=2, lowest_backbone_lvl=2,
        extra_levels=1,
    )
    feats = [jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in x]
    init = ours.init(jax.random.PRNGKey(0), feats)["params"]

    def key_fn(path):
        mod = path[0]
        kind = "weight" if path[-1] == "kernel" else "bias"
        if mod.startswith("nasfpn_in"):
            return f"nasfpn_in.{mod[len('nasfpn_in'):]}.{kind}"
        # stage{s}_{cell}: conv lives at conv_out = Sequential(ReLU,
        # conv) -> ".conv_out.1"
        assert mod.startswith("stage") and path[1] == "conv_out"
        s, cell = mod[len("stage"):].split("_", 1)
        return f"nasfpn_stages.{s}.{cell}.conv_out.1.{kind}"

    params = _load_params(init, ref.state_dict(), key_fn)
    _compare(ref_outs, ours.apply({"params": params}, feats))


def test_bifpn_oracle():
    ref_cfg = _ref_setup()
    import torch

    from cpm_tpu.modeling.necks_extra import BiFPN

    with _cfg_override(
        ref_cfg,
        {
            "FPN.BIFPN.DIM": DIM,
            "FPN.BIFPN.NUM_STACK": 2,
            "FPN.MULTILEVEL_RPN": True,
            "FPN.MULTILEVEL_ROIS": True,
            "FPN.RPN_MAX_LEVEL": 6,
            "FPN.RPN_MIN_LEVEL": 2,
            "FPN.ROI_MAX_LEVEL": 5,
            "FPN.ROI_MIN_LEVEL": 2,
        },
    ):
        from pet.rcnn.modeling.fpn.BiFPN import bifpn

        torch.manual_seed(0)
        ref = bifpn(
            dim_in=[c for _, c in FEAT_SPEC],
            spatial_scale=[0.25, 0.125, 0.0625, 0.03125],
        ).eval()

    x = _inputs(seed=2)
    with torch.no_grad():
        ref_outs = ref([torch.from_numpy(v) for v in x])

    ours = BiFPN(
        fpn_dim=DIM, num_stack=2, min_level=2, lowest_backbone_lvl=2,
        extra_levels=1,
    )
    feats = [jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in x]
    init = ours.init(jax.random.PRNGKey(0), feats)["params"]

    def key_fn(path):
        mod = path[0]
        kind = "weight" if path[-1] == "kernel" else "bias"
        if mod.startswith("bifpn_in"):
            return f"bifpn_in.{mod[len('bifpn_in'):]}.{kind}"
        assert mod.startswith("stage")
        s, key = mod[len("stage"):].split("_", 1)
        if key.endswith("fusion"):
            return f"bifpn_stages.{s}.{key}.{path[-1]}"
        return f"bifpn_stages.{s}.{key}.{kind}"

    params = _load_params(init, ref.state_dict(), key_fn)
    _compare(ref_outs, ours.apply({"params": params}, feats))


def test_neck_builders_from_cfg():
    """Registry builders wire the new FPN.{HRFPN,NASFPN,BIFPN} config
    sections; output pyramid matches the FPN level contract."""
    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.modeling import registry

    feats = [
        jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in _inputs()
    ]
    for body, extra in [
        ("hrfpn", {"HRFPN": {"DIM": DIM}}),
        ("nasfpn", {"NASFPN": {"DIM": DIM, "NUM_STACK": 1}}),
        ("bifpn", {"BIFPN": {"DIM": DIM, "NUM_STACK": 1}}),
    ]:
        cfg = get_default_cfg()
        cfg.FPN.BODY = body
        for sect, kv in extra.items():
            for k, v in kv.items():
                cfg.FPN[sect][k] = v
        neck = registry.FPN_BODY[body](cfg)
        outs = neck.apply(
            neck.init(jax.random.PRNGKey(0), feats), feats
        )
        assert len(outs) == 5
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]
        assert all(o.shape[-1] == DIM for o in outs)
