"""`tools/test_net.py` honors TEST.WEIGHTS pointing at a torch .pth.

Reference contract (pet/utils/checkpointer.py:13-18 get_weights +
test_engine.py:207-208): an existing TEST.WEIGHTS file takes precedence
over the CKPT dir, so a downloaded model-zoo checkpoint evaluates
without any conversion step. Here: the reference torch Generalized_RCNN
is built at the shared tiny parity config, its state_dict is saved as a
.pth, and the REAL CLI must (a) announce the torch import, (b) produce
exactly the detections that the library path produces from
import_cpm_checkpoint on the same images.
"""

import json
import os
import subprocess
import sys

import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from tests.test_model_parity import PARITY_DELTAS, _set_path  # noqa: E402

# eval-side settings for the synthetic debug set (8 fg classes = the
# parity config's NUM_CLASSES 9)
EVAL_DELTAS = [
    ("TEST.DATASETS", ("coco_debug_synthetic",)),
    ("TEST.SCALE", 64),
    ("TEST.MAX_SIZE", 128),
    # bit-stable across the CLI subprocess (1 CPU device) and the
    # in-suite library run (8 virtual devices): bf16 reductions batch
    # differently, f32 does not
    ("TPU.COMPUTE_DTYPE", "float32"),
]
N_IMAGES = 2


def _yaml_from_deltas(deltas):
    """Reference-style YAML: tuples rendered as '(..)' strings, which
    the config loader literal-evals (same as the shipped cfgs)."""
    tree = {}
    for path, value in deltas:
        parts = path.split(".")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = value

    def render(d, indent=0):
        out = []
        for k, v in d.items():
            pad = "  " * indent
            if isinstance(v, dict):
                out.append(f"{pad}{k}:")
                out.extend(render(v, indent + 1))
            else:
                out.append(f"{pad}{k}: {v!r}" if isinstance(v, str)
                           else f"{pad}{k}: {v}")
        return out

    return "\n".join(render(tree)) + "\n"


@pytest.fixture(scope="module")
def torch_pth(tmp_path_factory):
    from tests.ref_oracle import install_reference_stubs

    install_reference_stubs()
    import copy as _copy
    import importlib

    ref_config = importlib.import_module("pet.rcnn.core.config")
    snapshot = _copy.deepcopy(dict(ref_config.cfg))
    for path, value in PARITY_DELTAS:
        _set_path(ref_config.cfg, path, value)
    MB = importlib.import_module("pet.rcnn.modeling.model_builder")
    torch.manual_seed(0)
    model = MB.Generalized_RCNN(is_train=False)
    # sharpen the score layers so survivor sets aren't decided by ties
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith((
                "cls_score.weight", "iou_pred.weight", "cls_logits.weight",
            )):
                p.mul_(60.0)
    path = tmp_path_factory.mktemp("zoo") / "model_zoo.pth"
    torch.save(model.state_dict(), str(path))
    for k in list(ref_config.cfg.keys()):
        ref_config.cfg[k] = snapshot[k]
    return str(path)


def test_cli_evals_torch_test_weights(torch_pth, tmp_path):
    cfg_text = _yaml_from_deltas(PARITY_DELTAS + EVAL_DELTAS)
    cfg_file = tmp_path / "zoo_eval.yaml"
    cfg_file.write_text(cfg_text)
    ckpt_dir = str(tmp_path / "ckpt")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # fresh per-run compile cache: a long-lived shared dir can serve CPU
    # AOT entries compiled under different CPUID tuning attrs (VM
    # migration), whose different vectorization changes f32 reduction
    # order and thus NMS survivor sets
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "jaxcache")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test_net.py"),
         "--cfg", str(cfg_file), "--range", "0", str(N_IMAGES),
         "CKPT", ckpt_dir, "TEST.WEIGHTS", torch_pth],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"CLI failed rc={proc.returncode}\nstdout:\n{proc.stdout[-3000:]}"
        f"\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "loaded torch weights from TEST.WEIGHTS" in proc.stdout

    with open(os.path.join(
        ckpt_dir, "test", f"detection_range_0_{N_IMAGES}.json"
    )) as f:
        cli_dets = json.load(f)

    # Library reference path (import_cpm_checkpoint +
    # run_inference_on_dataset) in a SUBPROCESS with the identical env:
    # the pytest process's CPU backend is initialized with different
    # XLA flags / CPUID tuning attrs, whose vectorization differences
    # flip NMS ties near score boundaries — in-process comparison can
    # therefore never be exact. Same env → bit-identical results.
    lib_script = tmp_path / "lib_ref.py"
    lib_script.write_text(f"""
import json, sys
sys.path.insert(0, {REPO!r})
from cpm_tpu.utils.platform_env import honor_jax_platforms_env
honor_jax_platforms_env()
import torch
from cpm_tpu.config import assert_and_infer_cfg, cfg, merge_cfg_from_file
from cpm_tpu.data.coco import build_dataset
from cpm_tpu.engine.test import run_inference_on_dataset
from cpm_tpu.modeling.model import build_model
from cpm_tpu.utils.weight_import import import_cpm_checkpoint

merge_cfg_from_file({str(cfg_file)!r})
assert_and_infer_cfg(make_immutable=False)
sd = {{k: v.numpy() for k, v in torch.load(
    {torch_pth!r}, weights_only=True).items()}}
params = import_cpm_checkpoint(sd, cfg)
model = build_model(cfg)
ds = build_dataset(cfg, cfg.TEST.DATASETS, is_train=False)[0]
dets = run_inference_on_dataset(
    cfg, model, params, ds, start=0, end={N_IMAGES}, progress_every=0)
json.dump(dets, open({str(tmp_path / 'lib_dets.json')!r}, 'w'))
""")
    proc2 = subprocess.run(
        [sys.executable, str(lib_script)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc2.returncode == 0, (
        f"lib run failed rc={proc2.returncode}\n{proc2.stderr[-3000:]}"
    )
    with open(tmp_path / "lib_dets.json") as f:
        lib_dets = json.load(f)

    def canon(dets):
        return sorted(
            (r["image_id"], r["category_id"],
             tuple(round(float(v), 3) for v in r["bbox"]),
             round(float(r["score"]), 5))
            for r in dets
        )

    assert canon(cli_dets) == canon(lib_dets)
    assert cli_dets, "torch-weight eval produced no detections"
