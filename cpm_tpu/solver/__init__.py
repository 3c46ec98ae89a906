from cpm_tpu.solver.lr_schedule import make_lr_fn
from cpm_tpu.solver.optimizer import build_optimizer, param_label_tree
