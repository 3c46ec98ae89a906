from cpm_tpu.utils.matcher import BELOW_LOW_THRESHOLD, BETWEEN_THRESHOLDS, match_boxes
from cpm_tpu.utils.sampler import balanced_sample
