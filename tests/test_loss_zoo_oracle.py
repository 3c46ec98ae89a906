"""Oracle tests vs the reference torch implementations for the last
§2.4 zoo members: smooth_l1_loss_LW (lib/ops/smooth_l1_loss.py:31-48),
lovasz_softmax (lib/ops/lovasz_softmax_loss.py), MaskIOULoss
(lib/ops/iou_loss.py:139-150) and Conv2dSamePadding
(lib/ops/conv2d_samepadding.py — TF SAME semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.ref_oracle import install_reference_stubs


def _torch():
    install_reference_stubs()
    import torch

    return torch


def test_smooth_l1_loss_LW_matches_reference():
    torch = _torch()
    from pet.lib.ops.smooth_l1_loss import smooth_l1_loss_LW as ref_lw

    from cpm_tpu.ops.losses import smooth_l1_loss_LW

    rng = np.random.RandomState(0)
    pred = rng.randn(16, 8).astype(np.float32)
    tgt = rng.randn(16, 8).astype(np.float32)
    w_in = (rng.rand(16, 8) > 0.3).astype(np.float32)
    w_out = rng.rand(16, 8).astype(np.float32)
    for beta in (1.0, 0.11, 3.0):
        ref = ref_lw(
            torch.from_numpy(pred), torch.from_numpy(tgt),
            torch.from_numpy(w_in), torch.from_numpy(w_out), beta=beta,
        ).item()
        ours = float(
            smooth_l1_loss_LW(
                jnp.asarray(pred), jnp.asarray(tgt),
                jnp.asarray(w_in), jnp.asarray(w_out), beta=beta,
            )
        )
        assert ref == pytest.approx(ours, rel=1e-5)


@pytest.mark.parametrize("ignore_index", [None, 255])
@pytest.mark.parametrize("only_present", [True, False])
def test_lovasz_softmax_matches_reference(ignore_index, only_present):
    torch = _torch()
    from pet.lib.ops.lovasz_softmax_loss import lovasz_softmax_loss as ref_ls

    from cpm_tpu.ops.losses import lovasz_softmax

    rng = np.random.RandomState(1)
    B, C, H, W = 2, 5, 7, 9
    logits = rng.randn(B, C, H, W).astype(np.float32)
    # labels cover only a subset of classes so only_present matters;
    # sprinkle ignore_index pixels when testing the masked path
    labels = rng.randint(0, 3, size=(B, H, W)).astype(np.int64)
    if ignore_index is not None:
        mask = rng.rand(B, H, W) < 0.25
        labels[mask] = ignore_index
    ref = ref_ls(
        torch.from_numpy(logits), torch.from_numpy(labels),
        ignore_index=ignore_index, only_present=only_present,
    ).item()
    ours = float(
        lovasz_softmax(
            jnp.asarray(np.transpose(logits, (0, 2, 3, 1))),
            jnp.asarray(labels),
            ignore_index=ignore_index, only_present=only_present,
        )
    )
    assert ref == pytest.approx(ours, rel=1e-4, abs=1e-6)


def test_lovasz_softmax_all_ignored_is_zero():
    from cpm_tpu.ops.losses import lovasz_softmax

    logits = jnp.zeros((1, 4, 4, 3))
    labels = jnp.full((1, 4, 4), 255, dtype=jnp.int32)
    out = float(lovasz_softmax(logits, labels, ignore_index=255))
    assert out == 0.0 and np.isfinite(out)


def test_mask_iou_loss_matches_reference():
    torch = _torch()
    from pet.lib.ops.iou_loss import MaskIOULoss

    from cpm_tpu.ops.losses import mask_iou_loss

    rng = np.random.RandomState(2)
    pred = (rng.rand(12, 36).astype(np.float32) + 0.1)
    tgt = (rng.rand(12, 36).astype(np.float32) + 0.1)
    w = rng.rand(12).astype(np.float32)
    ref = MaskIOULoss()(
        torch.from_numpy(pred), torch.from_numpy(tgt), torch.from_numpy(w)
    ).item()
    ours = float(
        mask_iou_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(w))
    )
    assert ref == pytest.approx(ours, rel=1e-5)


@pytest.mark.parametrize("shape,k,s", [((13, 17), 3, 2), ((14, 14), 5, 3),
                                       ((8, 9), 3, 1)])
def test_conv2d_samepadding_matches_reference(shape, k, s):
    torch = _torch()
    from pet.lib.ops.conv2d_samepadding import Conv2dSamePadding as RefConv

    import jax
    from cpm_tpu.modeling.layers import Conv2dSamePadding

    rng = np.random.RandomState(3)
    cin, cout = 4, 6
    x = rng.randn(2, cin, *shape).astype(np.float32)
    ref_m = RefConv(cin, cout, k, stride=s).eval()
    with torch.no_grad():
        ref_y = ref_m(torch.from_numpy(x)).numpy()

    m = Conv2dSamePadding(cout, kernel_size=(k, k), strides=(s, s))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, *shape, cin)))
    # copy torch OIHW weights -> flax HWIO
    w = ref_m.weight.detach().numpy().transpose(2, 3, 1, 0)
    b = ref_m.bias.detach().numpy()
    inner = params["params"]["Conv_0"]
    assert inner["kernel"].shape == w.shape
    params = {"params": {"Conv_0": {"kernel": jnp.asarray(w),
                                    "bias": jnp.asarray(b)}}}
    y = m.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    assert y.shape == ref_y.shape
    np.testing.assert_allclose(y, ref_y, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("loss_type", ["iou", "liou", "giou", "diou", "ciou"])
def test_iou_loss_lrtb_matches_reference(loss_type):
    torch = _torch()
    from pet.lib.ops.iou_loss import IOULoss

    from cpm_tpu.ops.losses import iou_loss_lrtb

    rng = np.random.RandomState(4)
    pred = rng.rand(64, 4).astype(np.float32) * 10 + 0.5
    tgt = rng.rand(64, 4).astype(np.float32) * 10 + 0.5
    w = rng.rand(64).astype(np.float32)
    ref_mod = IOULoss(loss_type, box_type="lrtb")
    for weight in (None, w):
        ref = ref_mod(
            torch.from_numpy(pred), torch.from_numpy(tgt),
            None if weight is None else torch.from_numpy(weight),
        ).item()
        ours = float(
            iou_loss_lrtb(
                jnp.asarray(pred), jnp.asarray(tgt),
                None if weight is None else jnp.asarray(weight),
                loss_type=loss_type,
            )
        )
        assert ref == pytest.approx(ours, rel=2e-4), (loss_type, weight is None)


def test_h_sigmoid_and_swishx_match_reference():
    torch = _torch()
    from pet.lib.ops.swish import H_Sigmoid, SwishX as RefSwishX

    import jax
    from cpm_tpu.modeling.layers import h_sigmoid, SwishX

    rng = np.random.RandomState(5)
    x = rng.randn(4, 7).astype(np.float32) * 4
    ref = H_Sigmoid()(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(h_sigmoid(jnp.asarray(x))), ref,
                               rtol=1e-6)
    m = SwishX(maxvalue=1.5)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert float(params["params"]["maximal"][0]) == pytest.approx(1.5)
    ours = np.asarray(m.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        refx = RefSwishX(maxvalue=1.5)(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, refx, rtol=1e-5, atol=1e-6)
