from cpm_tpu.modeling.roi_heads import box_head  # noqa: F401  (registers)
