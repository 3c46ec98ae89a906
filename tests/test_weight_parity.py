"""Golden feature-parity tests against the reference's own torch modules.

The reference (/root/reference/pet, PyTorch) runs on CPU once its CUDA/apex
dependencies are stubbed, so its actual ResNet/FPN/RPNHead modules serve as
the numerical oracle: randomly-initialized reference weights are exported
through our torch->flax importer and the SAME input must produce the SAME
C2-C5 / P2-P6 / RPN activations (SURVEY §7.2 step 3). This validates both
the importer mapping (checkpointer.py:180-227 equivalent) and our trunk's
conv arithmetic (padding, stride placement, frozen-BN folding) — the
prerequisite for reaching the 41.7 mAP target with reference-pretrained
weights.

Head parity: the grid conv tower + fusion + grouped deconvs + ISM branch
run against the reference's own torch grid_heads/outputs modules with the
pooler stubbed out (the only part needing the compiled _C extension), plus
Linear-mapping tests (incl. the NCHW->NHWC flatten permutation for
FCs-after-pooling) and a full import_cpm_checkpoint shape round-trip.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _install_reference_stubs():
    """Make /root/reference/pet importable on CPU (stub apex/torchvision/_C)."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "apex" not in sys.modules:
        apex = types.ModuleType("apex")
        amp = types.ModuleType("apex.amp")
        amp.float_function = lambda f: f
        amp.half_function = lambda f: f
        apex.amp = amp
        sys.modules["apex"] = apex
        sys.modules["apex.amp"] = amp
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvo = types.ModuleType("torchvision.ops")
        tvo.nms = lambda *a, **k: None
        tv.ops = tvo
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tvo
    if "pet.lib.ops._C" not in sys.modules:

        class _CModule(types.ModuleType):
            def __getattr__(self, name):
                def missing(*a, **k):
                    raise NotImplementedError(name)

                return missing

        sys.modules["pet.lib.ops._C"] = _CModule("pet.lib.ops._C")


def _randomize_bn(module, rng):
    """Give BN layers non-trivial running stats so folding is exercised."""
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            n = m.num_features
            m.running_mean.copy_(
                torch.from_numpy(rng.uniform(-0.5, 0.5, n).astype(np.float32))
            )
            m.running_var.copy_(
                torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32))
            )
            m.weight.data.copy_(
                torch.from_numpy(rng.uniform(0.5, 1.5, n).astype(np.float32))
            )
            m.bias.data.copy_(
                torch.from_numpy(rng.uniform(-0.2, 0.2, n).astype(np.float32))
            )


@pytest.fixture(scope="module")
def reference_trunk():
    _install_reference_stubs()
    import importlib

    DR = importlib.import_module("pet.rcnn.modeling.backbone.ResNet")
    FM = importlib.import_module("pet.rcnn.modeling.fpn.FPN")
    RM = importlib.import_module("pet.rcnn.modeling.rpn.rpn")

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    net = DR.ResNet()
    _randomize_bn(net, rng)
    net.eval()
    fpn = FM.fpn(net.dim_out, list(net.spatial_scale))
    fpn.eval()
    rpn_head = RM.RPNHead([256], 3)
    rpn_head.eval()
    return net, fpn, rpn_head


def _torch_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_trunk_activation_parity(reference_trunk):
    """Same input, imported weights -> same C2-C5, P2-P6, RPN outputs."""
    import jax
    import jax.numpy as jnp

    from cpm_tpu.config import get_default_cfg
    from cpm_tpu.modeling.model import build_model
    from cpm_tpu.utils.weight_import import (
        import_fpn,
        import_resnet_backbone_sd,
        import_rpn_head,
    )

    net, fpn, rpn_head = reference_trunk
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 224, 320).astype(np.float32)

    with torch.no_grad():
        c_feats = net(torch.from_numpy(x))
        p_feats = fpn([f for f in c_feats])
        logits, bbox = rpn_head(p_feats)

    cfg = get_default_cfg()
    cfg.MODEL.FPN_ON = True
    cfg.MODEL.FASTER_RCNN = True
    cfg.MODEL.RPN_ONLY = True
    cfg.MODEL.NUM_CLASSES = 81
    cfg.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    images = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    sizes = jnp.array([[224, 320]])
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            images, sizes, train=False,
        )
    )()
    params = dict(variables["params"])
    params["backbone"] = import_resnet_backbone_sd(_torch_sd(net))
    params["fpn"] = import_fpn(_torch_sd(fpn))
    params["rpn_head"] = import_rpn_head(_torch_sd(rpn_head), prefix="")

    bound = model.bind({"params": params})
    feats = jax.jit(lambda im: bound._features(im))(images)
    obj, reg = jax.jit(lambda fs: bound.rpn_head(fs))(feats)

    def check(name, got_nhwc, want_nchw, rtol=2e-3):
        got = np.transpose(np.asarray(got_nhwc), (0, 3, 1, 2))
        want = want_nchw.detach().numpy()
        atol = 1e-4 * max(1.0, float(np.abs(want).max()))
        np.testing.assert_allclose(
            got, want, rtol=rtol, atol=atol, err_msg=name
        )

    # FPN outputs P2..P6 (the backbone C feats are consumed internally)
    assert len(feats) == len(p_feats)
    for i, (ours, ref) in enumerate(zip(feats, p_feats)):
        check(f"P{i + 2}", ours, ref)
    for i, (o, r) in enumerate(zip(obj, logits)):
        check(f"rpn_logits_P{i + 2}", o, r)
    for i, (o, r) in enumerate(zip(reg, bbox)):
        check(f"rpn_bbox_P{i + 2}", o, r)


def test_backbone_activation_parity(reference_trunk):
    """C2-C5 parity (backbone alone, before FPN)."""
    import jax
    import jax.numpy as jnp

    from cpm_tpu.modeling.backbone.resnet import ResNetBody
    from cpm_tpu.utils.weight_import import import_resnet_backbone_sd

    net, _, _ = reference_trunk
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 128, 160).astype(np.float32)
    with torch.no_grad():
        c_feats = net(torch.from_numpy(x))

    body = ResNetBody()
    params = {"params": import_resnet_backbone_sd(_torch_sd(net))}
    feats = jax.jit(lambda im: body.apply(params, im))(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    for i, (ours, ref) in enumerate(zip(feats, c_feats)):
        got = np.transpose(np.asarray(ours), (0, 3, 1, 2))
        want = ref.detach().numpy()
        atol = 1e-4 * max(1.0, float(np.abs(want).max()))
        np.testing.assert_allclose(
            got, want, rtol=2e-3, atol=atol, err_msg=f"C{i + 2}"
        )


def test_grouped_deconv_matches_torch():
    """Our grouped transposed conv == torch ConvTranspose2d(k4 s2 p1,
    groups=P) through deconv_to_grouped_kernel."""
    import jax.numpy as jnp

    from cpm_tpu.modeling.roi_heads.grid_modules import grouped_deconv
    from cpm_tpu.utils.weight_import import deconv_to_grouped_kernel

    torch.manual_seed(3)
    P, c = 9, 8
    cin, cout = P * c, P * c
    m = torch.nn.ConvTranspose2d(
        cin, cout, kernel_size=4, stride=2, padding=1, groups=P
    )
    x = torch.randn(5, cin, 7, 7)
    with torch.no_grad():
        want = m(x).numpy()

    k = deconv_to_grouped_kernel(m.weight.detach().numpy(), P)
    got = grouped_deconv(
        jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        jnp.asarray(k),
        jnp.asarray(m.bias.detach().numpy()),
        P,
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cpm_checkpoint_import_shapes():
    """A synthetic full reference-style CPM state dict maps onto every
    trunk+head param of our flagship model with matching shapes."""
    import jax

    from __graft_entry__ import _flagship_cfg
    from cpm_tpu.data.synthetic import synthetic_batch
    from cpm_tpu.modeling.model import build_model
    from cpm_tpu.utils.weight_import import import_cpm_checkpoint

    cfg = _flagship_cfg(tiny=False)
    cfg.MODEL.NUM_CLASSES = 5
    model = build_model(cfg)
    batch = synthetic_batch(
        batch_size=1, height=64, width=64, max_gt=3, num_classes=5, seed=0
    )
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            batch["images"], batch["image_sizes"],
            gt=dict(boxes=batch["gt_boxes"], labels=batch["gt_labels"],
                    mask=batch["gt_mask"]),
            train=True,
        )
    )
    params = variables["params"]

    # build a reference-keyed state dict from our param shapes
    sd = {}

    def fill_backbone(tree):
        rng = np.random.RandomState(0)
        sd["conv1.weight"] = rng.randn(
            *np.transpose(np.zeros(tree["conv1"]["kernel"].shape), (3, 2, 0, 1)).shape
        ).astype(np.float32)
        for name, sub in tree.items():
            if name.startswith("layer"):
                t_pref = name.replace("_", ".")
                for ci in (1, 2, 3):
                    k = sub[f"conv{ci}"]["kernel"]
                    sd[f"{t_pref}.conv{ci}.weight"] = rng.randn(
                        k.shape[3], k.shape[2], k.shape[0], k.shape[1]
                    ).astype(np.float32)
                    n = k.shape[3]
                    for stat, val in (
                        ("weight", 1.0), ("bias", 0.0),
                        ("running_mean", 0.0), ("running_var", 1.0),
                    ):
                        sd[f"{t_pref}.bn{ci}.{stat}"] = np.full(
                            n, val, np.float32
                        )
                if "downsample_conv" in sub:
                    k = sub["downsample_conv"]["kernel"]
                    sd[f"{t_pref}.downsample.0.weight"] = rng.randn(
                        k.shape[3], k.shape[2], k.shape[0], k.shape[1]
                    ).astype(np.float32)
                    n = k.shape[3]
                    for stat, val in (
                        ("weight", 1.0), ("bias", 0.0),
                        ("running_mean", 0.0), ("running_var", 1.0),
                    ):
                        sd[f"{t_pref}.downsample.1.{stat}"] = np.full(
                            n, val, np.float32
                        )
        n = tree["conv1"]["kernel"].shape[3]
        for stat, val in (
            ("weight", 1.0), ("bias", 0.0),
            ("running_mean", 0.0), ("running_var", 1.0),
        ):
            sd[f"bn1.{stat}"] = np.full(n, val, np.float32)

    fill_backbone(params["backbone"])
    sd = {f"Conv_Body.{k}": v for k, v in sd.items()}

    def add_conv(tname, leaf):
        k = leaf["kernel"]
        sd[f"{tname}.weight"] = np.random.randn(
            k.shape[3], k.shape[2], k.shape[0], k.shape[1]
        ).astype(np.float32)
        if "bias" in leaf:
            sd[f"{tname}.bias"] = np.zeros(k.shape[3], np.float32)

    def add_fc(tname, leaf):
        k = leaf["kernel"]
        sd[f"{tname}.weight"] = np.random.randn(
            k.shape[1], k.shape[0]
        ).astype(np.float32)
        sd[f"{tname}.bias"] = np.zeros(k.shape[1], np.float32)

    f = params["fpn"]
    add_conv("Conv_Body_FPN.p5_in", f["p5_in"])
    add_conv("Conv_Body_FPN.p5_out", f["p5_out"])
    for i in range(3):
        add_conv(f"Conv_Body_FPN.fpn_in.{i}", f[f"fpn_in_{i}"])
        add_conv(f"Conv_Body_FPN.fpn_out.{i}", f[f"fpn_out_{i}"])
    r = params["rpn_head"]
    for n in ("conv", "cls_logits", "bbox_pred"):
        add_conv(f"RPN.head.{n}", r[n])

    h = params["roi_head"]
    g = "Grid_Cascade_RCNN."
    for hn, tn in (("cls_head", "Head_cls"), ("rescore_head", "Head_rescore")):
        add_fc(f"{g}{tn}.fc6", h[hn]["fc6"])
        add_fc(f"{g}{tn}.fc7", h[hn]["fc7"])
    for on, tn in (
        ("cls_output", "Output_cls"), ("rescore_output", "Output_rescore")
    ):
        add_fc(f"{g}{tn}.cls_score", h[on]["cls_score"])
    s = 0
    while f"grid_head_{s}" in h:
        gh = h[f"grid_head_{s}"]
        i = 0
        while f"conv{i}" in gh:
            add_conv(f"{g}Head_grid_{s}.convs.{i}.0", gh[f"conv{i}"])
            n = gh[f"gn{i}"]["scale"].shape[0]
            sd[f"{g}Head_grid_{s}.convs.{i}.1.weight"] = np.ones(n, np.float32)
            sd[f"{g}Head_grid_{s}.convs.{i}.1.bias"] = np.zeros(n, np.float32)
            i += 1
        go = h[f"grid_output_{s}"]
        P = go["deconv2_kernel"].shape[3]
        for dn in ("deconv1", "deconv2"):
            k = go[f"{dn}_kernel"]  # [kh, kw, cin/g, cout]
            cin = k.shape[2] * P
            sd[f"{g}Output_grid_{s}.{dn.replace('deconv', 'deconv_')}.weight"] = (
                np.random.randn(cin, k.shape[3] // P, k.shape[0], k.shape[1])
                .astype(np.float32)
            )
            sd[f"{g}Output_grid_{s}.{dn.replace('deconv', 'deconv_')}.bias"] = (
                np.zeros(k.shape[3], np.float32)
            )
        n = go["norm1"]["scale"].shape[0]
        sd[f"{g}Output_grid_{s}.norm1.weight"] = np.ones(n, np.float32)
        sd[f"{g}Output_grid_{s}.norm1.bias"] = np.zeros(n, np.float32)
        if "iou_fc1" in go:
            add_fc(f"{g}Output_grid_{s}.iou_fc1", go["iou_fc1"])
            add_fc(f"{g}Output_grid_{s}.iou_fc2", go["iou_fc2"])
            add_fc(f"{g}Output_grid_{s}.iou_pred", go["iou_pred"])
        s += 1

    imported = import_cpm_checkpoint(sd, cfg)

    def assert_shapes(want, got, path=""):
        for k, v in got.items():
            assert k in want, f"unexpected imported key {path}/{k}"
            if isinstance(v, dict):
                assert_shapes(want[k], v, f"{path}/{k}")
            else:
                assert tuple(want[k].shape) == tuple(v.shape), (
                    f"{path}/{k}: model {want[k].shape} vs import {v.shape}"
                )

    for section in ("backbone", "fpn", "rpn_head", "roi_head"):
        assert_shapes(params[section], imported[section], section)
    # every head submodule must be covered
    assert set(imported["roi_head"]) == set(params["roi_head"])


def test_grid_head_and_output_activation_parity():
    """The CPM numerical core — grid conv tower + first/second-order
    fusion + grouped deconvs + ISM branch — vs the reference's own torch
    modules (grid_heads.py / outputs.py), pooler stubbed out (the only
    part that needs the compiled _C extension)."""
    import importlib

    import jax
    import jax.numpy as jnp

    _install_reference_stubs()
    CFG = importlib.import_module("pet.rcnn.core.config")
    rcfg = CFG.cfg
    saved = {
        "GRID_POINTS": rcfg.GRID_RCNN.GRID_POINTS,
        "CASCADE_MAPPING_ON": rcfg.GRID_RCNN.CASCADE_MAPPING_ON,
        "NUM_CONVS": rcfg.GRID_RCNN.GRID_HEAD.NUM_CONVS,
        "POINT_FEAT_CHANNELS": rcfg.GRID_RCNN.GRID_HEAD.POINT_FEAT_CHANNELS,
        "FUSED_ON": rcfg.GRID_RCNN.FUSED_ON,
        "IOU_HELPER": rcfg.GRID_RCNN.IOU_HELPER,
        "OFFSET_ON": rcfg.GRID_RCNN.OFFSET_ON,
        "SE_ON": rcfg.GRID_RCNN.SE_ON,
        "STAGE_NUM": rcfg.GRID_RCNN.CASCADE_MAPPING_OPTION.STAGE_NUM,
    }
    P, c, nconvs, dim_in, R = 9, 8, 2, 32, 6
    try:
        rcfg.GRID_RCNN.CASCADE_MAPPING_ON = False
        rcfg.GRID_RCNN.GRID_POINTS = P
        rcfg.GRID_RCNN.GRID_HEAD.NUM_CONVS = nconvs
        rcfg.GRID_RCNN.GRID_HEAD.POINT_FEAT_CHANNELS = c
        rcfg.GRID_RCNN.FUSED_ON = True
        rcfg.GRID_RCNN.IOU_HELPER = True
        rcfg.GRID_RCNN.OFFSET_ON = False
        rcfg.GRID_RCNN.SE_ON = False
        rcfg.GRID_RCNN.CASCADE_MAPPING_OPTION.STAGE_NUM = 1  # stage 0 = last

        GH = importlib.import_module(
            "pet.rcnn.modeling.grid_rcnn.heads.grid_heads"
        )
        GO = importlib.import_module("pet.rcnn.modeling.grid_rcnn.outputs")
        torch.manual_seed(1)
        head = GH.roi_grid_head([dim_in], [0.25], stage=0)
        output = GO.Grid_output([head.conv_out_channels], stage=0)
        head.train()
        output.train()  # exercise independent fused + unfused towers

        rng = np.random.RandomState(3)
        x_np = rng.randn(R, dim_in, 14, 14).astype(np.float32)

        class _StubPooler(torch.nn.Module):
            def forward(self, features, proposals):
                return torch.from_numpy(x_np)

        head.pooler = _StubPooler()
        with torch.no_grad():
            x_ref, x_so_ref = head(None, None)
            hm_ref, iou_ref = output(x_ref, x_so_ref)
        x_so_cat = torch.cat(x_so_ref, dim=1)

        from cpm_tpu.modeling.roi_heads.grid_modules import (
            GridHead, GridOutput,
        )
        from cpm_tpu.utils.weight_import import (
            import_grid_head, import_grid_output,
        )

        ours_head = GridHead(
            grid_points=P, num_convs=nconvs, point_feat_channels=c,
            fused_on=True,
        )
        ours_out = GridOutput(
            grid_points=P, point_feat_channels=c, iou_helper=True,
            fused_on=True,
        )
        hp = import_grid_head(_torch_sd(head), "")
        op = import_grid_output(_torch_sd(output), "", grid_points=P)
        pooled = jnp.asarray(np.transpose(x_np, (0, 2, 3, 1)))
        x_j, x_so_j, _ = ours_head.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, hp)},
            None, None, pooled=pooled,
        )
        hm_j, iou_j = ours_out.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, op)},
            x_j, x_so_j, train=True,
        )

        def chk(t, j_nhwc, name, atol=2e-4):
            a = t.detach().numpy()
            b = np.transpose(np.asarray(j_nhwc), (0, 3, 1, 2))
            np.testing.assert_allclose(a, b, atol=atol, rtol=1e-4,
                                       err_msg=name)

        chk(x_ref, x_j, "tower")
        chk(x_so_cat, x_so_j, "second-order fusion")
        # heatmaps come back [R, P, h, w] from our GridOutput already
        np.testing.assert_allclose(
            hm_ref["fused"].detach().numpy(), np.asarray(hm_j["fused"]),
            atol=5e-4, rtol=1e-4, err_msg="fused heatmap",
        )
        np.testing.assert_allclose(
            hm_ref["unfused"].detach().numpy(), np.asarray(hm_j["unfused"]),
            atol=5e-4, rtol=1e-4, err_msg="unfused heatmap",
        )
        np.testing.assert_allclose(
            iou_ref.detach().numpy(), np.asarray(iou_j),
            atol=5e-4, rtol=1e-4, err_msg="ISM iou logits",
        )
    finally:
        rcfg.GRID_RCNN.GRID_POINTS = saved["GRID_POINTS"]
        rcfg.GRID_RCNN.CASCADE_MAPPING_ON = saved["CASCADE_MAPPING_ON"]
        rcfg.GRID_RCNN.GRID_HEAD.NUM_CONVS = saved["NUM_CONVS"]
        rcfg.GRID_RCNN.GRID_HEAD.POINT_FEAT_CHANNELS = (
            saved["POINT_FEAT_CHANNELS"]
        )
        rcfg.GRID_RCNN.FUSED_ON = saved["FUSED_ON"]
        rcfg.GRID_RCNN.IOU_HELPER = saved["IOU_HELPER"]
        rcfg.GRID_RCNN.OFFSET_ON = saved["OFFSET_ON"]
        rcfg.GRID_RCNN.SE_ON = saved["SE_ON"]
        rcfg.GRID_RCNN.CASCADE_MAPPING_OPTION.STAGE_NUM = saved["STAGE_NUM"]


def test_fc_after_pool_row_permutation():
    """fc6 parity: torch applies Linear to the NCHW flatten of the pooled
    feature, our heads flatten NHWC — _fc_after_pool must make both
    produce identical outputs (covers cls/rescore fc6 and offset_fc)."""
    from cpm_tpu.utils.weight_import import _fc, _fc_after_pool

    rng = np.random.RandomState(5)
    R, C, H, W, out_dim = 4, 16, 7, 7, 32
    x = rng.randn(R, C, H, W).astype(np.float32)
    lin = torch.nn.Linear(C * H * W, out_dim)
    with torch.no_grad():
        want = lin(torch.from_numpy(x.reshape(R, -1))).numpy()
    sd = {f"fc.{k}": v.detach().numpy() for k, v in lin.state_dict().items()}
    p = _fc_after_pool(sd, "fc", (H, W))
    x_nhwc_flat = np.transpose(x, (0, 2, 3, 1)).reshape(R, -1)
    got = x_nhwc_flat @ p["kernel"] + p["bias"]
    np.testing.assert_allclose(got, want, atol=1e-5)
    # and the naive _fc import is provably WRONG for this case
    naive = x_nhwc_flat @ _fc(sd, "fc")["kernel"] + sd["fc.bias"]
    assert np.abs(naive - want).max() > 1e-3
