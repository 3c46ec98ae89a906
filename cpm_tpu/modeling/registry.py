"""Model-component registries.

Same dispatch names as the reference (/root/reference/pet/rcnn/modeling/
registry.py:4-27): config strings select constructors.
"""

from cpm_tpu.registry import Registry

BACKBONES = Registry("BACKBONES")
FPN_BODY = Registry("FPN_BODY")

RPN_HEADS = Registry("RPN_HEADS")

ROI_BOX_HEADS = Registry("ROI_BOX_HEADS")
ROI_BOX_OUTPUTS = Registry("ROI_BOX_OUTPUTS")

ROI_CASCADE_HEADS = Registry("ROI_CASCADE_HEADS")
ROI_CASCADE_OUTPUTS = Registry("ROI_CASCADE_OUTPUTS")

ROI_CLS_HEADS = Registry("ROI_CLS_HEADS")
ROI_CLS_OUTPUTS = Registry("ROI_CLS_OUTPUTS")
ROI_GRID_HEADS = Registry("ROI_GRID_HEADS")
ROI_GRID_OUTPUTS = Registry("ROI_GRID_OUTPUTS")
