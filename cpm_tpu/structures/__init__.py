from cpm_tpu.structures.boxes import (
    Boxes,
    box_area,
    box_iou,
    clip_boxes_to_image,
    convert_xyxy_to_xywh,
    convert_xywh_to_xyxy,
    flip_boxes_horizontal,
    remove_small_boxes_mask,
    resize_boxes,
)
from cpm_tpu.structures.image_batch import ImageBatch, pad_to_divisibility
