from cpm_tpu.modeling.backbone import resnet  # noqa: F401  (registers)
