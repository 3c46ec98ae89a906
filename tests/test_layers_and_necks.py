"""Layer zoo + alternative neck shape/behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cpm_tpu.modeling.layers import (
    ECA,
    Conv2dWS,
    DropBlock2D,
    L2Norm,
    MixtureNorm,
    NonLocal2d,
    Scale,
    SplAtConv2d,
    SyncBatchNorm,
    h_swish,
    mish,
    swish,
)
from cpm_tpu.modeling.necks_extra import HRFPN, BiFPN, NASFPN


def _feats():
    k = jax.random.PRNGKey(0)
    return [
        jax.random.normal(jax.random.fold_in(k, i), (1, s, s, c))
        for i, (s, c) in enumerate([(16, 8), (8, 16), (4, 32), (2, 64)])
    ]


def test_activations():
    x = jnp.linspace(-3, 3, 7)
    assert np.isfinite(np.asarray(mish(x))).all()
    np.testing.assert_allclose(float(swish(jnp.array(0.0))), 0.0)
    np.testing.assert_allclose(float(h_swish(jnp.array(3.0))), 3.0)


def test_simple_layers():
    x = jnp.ones((1, 4, 4, 8))
    for mod in [
        Scale(2.0), L2Norm(8), Conv2dWS(8), ECA(), NonLocal2d(4),
        SplAtConv2d(8),
    ]:
        p = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(p, x)
        assert y.shape[0] == 1 and np.isfinite(np.asarray(y)).all()


def test_dropblock_train_vs_eval():
    x = jnp.ones((1, 8, 8, 4))
    mod = DropBlock2D(drop_prob=0.5, block_size=3)
    p = mod.init(jax.random.PRNGKey(0), x)
    y_eval = mod.apply(p, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))
    y_train = mod.apply(
        p, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert float(jnp.min(y_train)) == 0.0  # some blocks dropped


def test_sync_bn_and_mixture_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 8))
    bn = SyncBatchNorm(8, axis_name=None)
    vars_ = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y, _ = bn.apply(
        vars_, x, use_running_average=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        float(jnp.mean(y)), 0.0, atol=1e-5
    )
    mn = MixtureNorm(8, k=4, base="gn")
    p = mn.init(jax.random.PRNGKey(0), x)
    y = mn.apply(p, x)
    assert y.shape == x.shape


def test_alternative_necks_shapes():
    feats = _feats()
    for neck in [HRFPN(fpn_dim=16), BiFPN(fpn_dim=16, num_stack=1),
                 NASFPN(fpn_dim=16, num_stack=1)]:
        p = neck.init(jax.random.PRNGKey(0), feats)
        outs = neck.apply(p, feats)
        assert len(outs) == 5
        assert all(o.shape[-1] == 16 for o in outs)
        # resolution halves per level
        hs = [o.shape[1] for o in outs]
        assert hs == [16, 8, 4, 2, 1], hs


def test_masked_softmax_ce_robustness():
    """softmax_cross_entropy must survive garbage padding rows: inf
    logits on masked rows (0*inf=NaN with multiply-masking) and
    out-of-range labels (jit gather NaN-fill) — regression for the NaN
    that poisoned loss_classifier whenever labels exceeded NUM_CLASSES."""
    import jax.numpy as jnp
    import numpy as np

    from cpm_tpu.ops.losses import softmax_cross_entropy

    logits = jnp.array(
        [[0.0, 1.0, 2.0],      # valid row
         [jnp.inf, -jnp.inf, 0.0],  # masked garbage row
         [0.5, 0.5, 0.5]],     # valid row with OOB label
    )
    labels = jnp.array([1, 0, 80])  # 80 >> num classes
    mask = jnp.array([True, False, True])
    loss = softmax_cross_entropy(logits, labels, mask)
    assert np.isfinite(float(loss))
    # valid rows only: row0 CE at label 1, row2 CE at clipped label 2
    lp0 = jax.nn.log_softmax(logits[0])[1]
    lp2 = jax.nn.log_softmax(logits[2])[2]
    np.testing.assert_allclose(
        float(loss), float(-(lp0 + lp2) / 2.0), rtol=1e-6
    )
