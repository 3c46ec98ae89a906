from cpm_tpu.evaluation.coco_eval import COCOEvaluator
