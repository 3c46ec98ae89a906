"""Multi-level FPN RoI pooling.

Replaces the reference Pooler/LevelMapper
(/root/reference/pet/rcnn/utils/poolers.py:9-132). Level assignment is the
Detectron rule `k = floor(k0 + log2(sqrt(area)/s0))` clamped to
[k_min, k_max] (poolers.py:35-40, with the reference's eps=1e-6 inside the
log2 argument).

TPU design: instead of the reference's scatter-by-level into a zeros output
(dynamic per-level roi counts), all level maps are flattened into one
buffer and each roi gathers from its assigned level's region
(multilevel_roi_align) — fixed shapes, one compilation, and exactly 1x the
gather/interp work (the round-1 design evaluated RoIAlign on every level
and one-hot-selected, 4x the work).
"""

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from cpm_tpu.ops.roi_align import multilevel_roi_align, roi_align
from cpm_tpu.structures.boxes import box_area

# Pooling backend: 'pallas' = the windowed DMA + separable-matmul kernel
# (cpm_tpu/ops/pallas/multilevel_pallas.py, ~1.3x the gather path on v5e,
# exact for aspect ratios <= ~9.7); 'stacked' = the switch-free
# stacked-levels variant (bit-identical outputs; measured neutral fwd /
# slower bwd on v5e — docs/PROFILE.md ninth pass — kept for other
# hardware generations); 'gather' = the pure-XLA formulation; 'auto' =
# pallas on TPU backends, gather elsewhere. Set from
# cfg.TPU.POOLER_KERNEL by build_model; both pallas kernels silently
# fall back to gather when the static shape check fails (huge images,
# pool sizes beyond the window).
_BACKEND = "auto"

# rois per call routed through the gather-path exactness fallback when
# their bilinear source cells overflow the Pallas kernel's WIN-cell
# window (aspect ratio >~ 3.9). The patch is tiered on the actual
# overflow count (see Pooler.__call__): free when none, the small cap
# for the occasional handful, the wide cap for adversarial sets.
# tools/ab_deviations.py measures the real overflow rate on eval
# proposal sets (~0).
OVERFLOW_CAP = 16
OVERFLOW_CAP_WIDE = 64


def set_pooler_backend(name: str):
    global _BACKEND
    assert name in ("auto", "pallas", "stacked", "clustered",
                    "gather"), name
    _BACKEND = name


# When True (scoped by GeneralizedRCNN.__call__ for eval traces under
# TPU.EVAL_POOLER_DTYPE='float32'), pooling runs in f32 regardless of the
# compute dtype and casts back — the reference CUDA kernel accumulates in
# f32 (ROIAlign_cuda.cu:14). A ContextVar rather than a module global:
# a trace started on another thread, or nested inside the eval trace,
# sees its own context's value instead of silently inheriting (or
# clobbering) the in-flight eval setting, and pooler_force_f32_scope's
# token-restore keeps nested scopes correct.
import contextlib
import contextvars

_FORCE_F32 = contextvars.ContextVar("cpm_pooler_force_f32", default=False)


@contextlib.contextmanager
def pooler_force_f32_scope(flag: bool):
    """Pin (or unpin) f32 pooling for traces entered within the scope."""
    token = _FORCE_F32.set(bool(flag))
    try:
        yield
    finally:
        _FORCE_F32.reset(token)


def get_pooler_backend() -> str:
    return _BACKEND


def _resolve_backend() -> str:
    if _BACKEND != "auto":
        return _BACKEND
    # measured on v5e (CPM R-50 train step, batch 2 @ 832x1344): the
    # windowed kernel's race-free backward avoids the XLA scatter-adds
    # that dominate the gather path's backward (~60 ms/step of kScatter
    # custom fusions in the profile) — 222 vs 251 ms/step end-to-end.
    # 'gather' stays available via TPU.POOLER_KERNEL.
    import jax

    try:
        # the Mosaic kernel only lowers on TPU — on gpu/metal/cpu the
        # documented contract is the gather formulation
        if jax.default_backend() == "tpu":
            return "pallas"
    except Exception:
        pass
    return "gather"


def assign_fpn_levels(
    boxes: jnp.ndarray,
    k_min: int,
    k_max: int,
    canonical_scale: int = 224,
    canonical_level: int = 4,
    eps: float = 1e-6,
):
    """Per-roi FPN level (LevelMapper.__call__, poolers.py:30-41).

    boxes: [..., 4] xyxy in image coords. Returns int32 levels in
    [k_min, k_max].
    """
    # degenerate boxes (x2 < x1, e.g. from grid decode on untrained
    # heatmaps) have negative plus1-area; without the clamp, sqrt -> NaN
    # -> NaN->int32 cast garbage that the pallas level-switch and the
    # gather path resolve DIFFERENTLY (measured: 0.84 max output delta
    # on a degenerate roi). Clamping pins them to k_min on both paths.
    scale = jnp.sqrt(jnp.maximum(box_area(boxes, legacy_plus1=True), 0.0))
    lvl = jnp.floor(
        canonical_level + jnp.log2(scale / canonical_scale + eps)
    )
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32)


class Pooler:
    """RoIAlign across FPN levels with on-device level selection.

    Args:
      output_size: (ph, pw).
      scales: per-level spatial scales, e.g. (1/4, 1/8, 1/16, 1/32).
      sampling_ratio: as in roi_align.
      canonical params: Detectron LevelMapper constants.
    """

    def __init__(
        self,
        output_size,
        scales: Sequence[float],
        sampling_ratio: int = 0,
        canonical_scale: int = 224,
        canonical_level: int = 4,
        method: str = "ROIAlign",
    ):
        self.output_size = tuple(output_size)
        self.scales = tuple(scales)
        self.sampling_ratio = sampling_ratio
        # lvl_min/max from scales, as make_pooler does:
        self.k_min = int(-math.log2(self.scales[0]))
        self.k_max = int(-math.log2(self.scales[-1]))
        self.canonical_scale = canonical_scale
        self.canonical_level = canonical_level
        self.method = method

    def __call__(
        self,
        features: Sequence[jnp.ndarray],
        rois: jnp.ndarray,
        roi_mask: jnp.ndarray | None = None,
    ):
        """Pool per-roi features.

        Args:
          features: list of [B, H_l, W_l, C], finest first (P2..P5).
          rois: [R, 5] (batch_index, x1, y1, x2, y2).
          roi_mask: [R] validity; invalid rois produce zeros.

        Returns: [R, ph, pw, C]
        """
        assert len(features) == len(self.scales)
        out_dtype = features[0].dtype
        if _FORCE_F32.get() and out_dtype != jnp.float32:
            # f32 accumulation (reference ROIAlign_cuda.cu precision);
            # the caller gets its compute dtype back
            features = [f.astype(jnp.float32) for f in features]
            rois = rois.astype(jnp.float32)
            return self(features, rois, roi_mask).astype(out_dtype)
        if len(features) == 1:
            out = roi_align(
                features[0],
                rois,
                self.output_size,
                self.scales[0],
                self.sampling_ratio,
            )
        else:
            levels = assign_fpn_levels(
                rois[:, 1:5],
                self.k_min,
                self.k_max,
                self.canonical_scale,
                self.canonical_level,
            )
            backend = _resolve_backend()
            use_pallas = False
            if backend in ("pallas", "stacked", "clustered"):
                from cpm_tpu.ops.pallas.multilevel_pallas import (
                    multilevel_roi_align_pallas,
                    pallas_supported,
                )

                if backend == "stacked":
                    from cpm_tpu.ops.pallas.stacked_pallas import (
                        multilevel_roi_align_stacked as
                        multilevel_roi_align_pallas,
                    )
                elif backend == "clustered":
                    from cpm_tpu.ops.pallas.clustered_pallas import (
                        multilevel_roi_align_clustered as
                        multilevel_roi_align_pallas,
                    )

                level_hw = [
                    (int(f.shape[1]), int(f.shape[2])) for f in features
                ]
                use_pallas = pallas_supported(
                    level_hw, self.output_size, self.sampling_ratio,
                    channels=int(features[0].shape[-1]),
                )
            if use_pallas:
                from cpm_tpu.ops.pallas.multilevel_pallas import (
                    window_overflow_mask,
                )

                # the kernel skips masked rois (no window DMA, no matmuls,
                # no gradient accumulation) — fixed-shape roi sets are
                # often 40-70% padding on the train path
                valid = (
                    roi_mask
                    if roi_mask is not None
                    else jnp.ones(rois.shape[:1], bool)
                )
                out = multilevel_roi_align_pallas(
                    tuple(features),
                    (rois, levels - self.k_min, valid),
                    self.output_size,
                    self.scales,
                    self.sampling_ratio,
                )
                # exactness fallback: rois whose source cells overflow the
                # kernel's WIN-cell window (aspect ratio >~3.9) would read
                # zeros for the overflowing samples; route up to
                # OVERFLOW_CAP of them through the gather path instead so
                # the pooling is exact for every realistic roi set
                over = (
                    window_overflow_mask(
                        features, rois, levels - self.k_min,
                        self.output_size, self.scales,
                        self.sampling_ratio,
                    )
                    & valid
                )
                def _patch_overflow(cap):
                    def patch(out):
                        oscore, oidx = jax.lax.top_k(
                            over.astype(jnp.float32), cap
                        )
                        osel = oscore > 0.0
                        sub = multilevel_roi_align(
                            list(features),
                            rois[oidx],
                            (levels - self.k_min)[oidx],
                            self.output_size,
                            self.scales,
                            self.sampling_ratio,
                        ).astype(out.dtype)
                        return out.at[oidx].set(
                            jnp.where(
                                osel[:, None, None, None], sub, out[oidx]
                            )
                        )

                    return patch

                # tiered exactness patch: overflow is ~absent on
                # realistic proposal sets (tools/ab_deviations.py
                # measures the rate), so the usual cost is one popcount;
                # a small patch covers the occasional handful (random
                # jittered train rois), the wide one the adversarial
                # tail. Only beyond OVERFLOW_CAP_WIDE rois does the
                # kernel's zero-read behavior show through.
                n_over = jnp.sum(over)
                small = min(OVERFLOW_CAP, rois.shape[0])
                wide = min(OVERFLOW_CAP_WIDE, rois.shape[0])

                def _tier(out):
                    if small == wide:
                        return _patch_overflow(wide)(out)
                    return jax.lax.cond(
                        n_over <= small,
                        _patch_overflow(small),
                        _patch_overflow(wide),
                        out,
                    )

                out = jax.lax.cond(
                    n_over > 0, _tier, lambda o: o, out
                )
            else:
                out = multilevel_roi_align(
                    list(features),
                    rois,
                    levels - self.k_min,
                    self.output_size,
                    self.scales,
                    self.sampling_ratio,
                )
        if roi_mask is not None:
            out = out * roi_mask.astype(out.dtype)[:, None, None, None]
        return out
