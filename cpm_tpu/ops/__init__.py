from cpm_tpu.ops.box_coder import BoxCoder
from cpm_tpu.ops.losses import (
    l2_loss,
    sigmoid_focal_loss,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from cpm_tpu.ops.nms import (
    batched_nms,
    box_voting,
    matrix_nms,
    multiclass_nms,
    nms,
    soft_nms,
)
from cpm_tpu.ops.roi_align import roi_align
from cpm_tpu.ops.pooler import Pooler, assign_fpn_levels
