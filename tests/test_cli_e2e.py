"""CLI-level end-to-end: train_tracking.py -> test_tracking.py over a fabricated
on-disk KITTI tracking tree (VERDICT r3 item 8).

The dataset, trainer, evaluator, and watcher each have their own tests; this is the
single dress rehearsal of the exact real-data flow a user runs (reference
tools/train_tracking.py:54-199 then tools/test_tracking.py): shell the train CLI for
one epoch on the TINY split of a fabricated KITTI root (pickle DB build included),
then shell the eval CLI against the checkpoint it wrote, and check the whole output
tree (ckpt dir, eval log metrics, track_result.txt, TEST.SAVE_PCD dumps).

Subprocesses run on the plain CPU backend (JAX_PLATFORMS=cpu, no forced device
count) with a tiny model override config chained off the shipped ptt.yaml via
_BASE_CONFIG_ — exercising config inheritance through the real CLI path too.
"""

import os
import re
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

from tests.test_kitti_data import make_kitti_tree

pytestmark = pytest.mark.slow  # train+eval CLI subprocesses over a fabricated KITTI tree

REPO_ROOT = Path(__file__).resolve().parent.parent

TINY_OVERRIDES = """\
_BASE_CONFIG_: {repo}/tools/cfgs/kitti_models/ptt.yaml

DATA_CONFIG:
    DATA_PATH: '{data_path}'
    LOAD_FROM_DATABASE: True
    NUM_CANDIDATES_PERFRAME: 2
    SEARCH_INPUT_SIZE: 256
    TEMPLATE_INPUT_SIZE: 128
    DATA_SPLIT: {{'train': TRAIN_TINY, 'test': TEST_TINY}}

MODEL:
    BACKBONE_3D:
        SA_CONFIG:
            NPOINTS_SEARCH: [64, 32, 16]
            NPOINTS_TEMPLATE: [32, 16, 8]
    CENTROID_HEAD:
        TRANSFORMER_BLOCK:
            KNN: 8
    BOX_HEAD:
        SA_CONFIG:
            NPOINTS: 8
        TRANSFORMER_BLOCK:
            KNN: 8

OPTIMIZATION:
    BATCH_SIZE_PER_GPU: 4
    NUM_EPOCHS: 1

TEST:
    SAVE_PCD: True
"""


def _cli_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # single plain CPU device: drop any forced virtual device count so the CLI
    # subprocess runs the way a user's single-host run does
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    return env


def _run(cmd, timeout=900):
    proc = subprocess.run(
        [sys.executable, *cmd], cwd=REPO_ROOT, env=_cli_env(),
        capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{' '.join(cmd)} failed:\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    return proc


@pytest.fixture(scope="module")
def e2e_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_e2e")
    data_root = tmp / "kitti"
    data_root.mkdir()
    make_kitti_tree(data_root, n_frames=6)

    cfg_file = tmp / "ptt_e2e_tiny.yaml"
    cfg_file.write_text(
        TINY_OVERRIDES.format(repo=REPO_ROOT, data_path=data_root)
    )
    # cfg_file outside tools/cfgs => EXP_GROUP_PATH is empty, TAG is the stem
    out_dir = REPO_ROOT / "output" / "ptt_e2e_tiny"
    if out_dir.exists():
        shutil.rmtree(out_dir)
    yield cfg_file, out_dir
    shutil.rmtree(out_dir, ignore_errors=True)


def test_train_then_eval_cli(e2e_run):
    cfg_file, out_dir = e2e_run

    train = _run([
        "tools/train_tracking.py", "--cfg_file", str(cfg_file),
        "--epochs", "1", "--workers", "1", "--extra_tag", "e2e",
    ])
    run_dir = out_dir / "e2e"
    ckpt_dir = run_dir / "ckpt"
    assert ckpt_dir.is_dir(), train.stdout[-2000:]
    assert any(ckpt_dir.iterdir()), "trainer saved no checkpoint"
    assert (run_dir / "tensorboard").is_dir()
    assert list(run_dir.glob("log_train_*.txt"))

    ev = _run([
        "tools/test_tracking.py", "--cfg_file", str(cfg_file),
        "--ckpt", str(ckpt_dir), "--batch_size", "1", "--extra_tag", "e2e",
    ])
    eval_dir = run_dir / "eval" / "default"
    logs = sorted(eval_dir.glob("log_eval_*.txt"))
    assert logs, ev.stdout[-2000:]
    text = logs[-1].read_text()
    m = re.search(r"Succ/Prec (-?[\d.]+)/(-?[\d.]+)", text) or re.search(
        r"[Ss]uccess[^\d-]*(-?[\d.]+).*?[Pp]recision[^\d-]*(-?[\d.]+)", text, re.S
    )
    assert m, f"no metrics in eval log:\n{text[-3000:]}"
    succ, prec = float(m.group(1)), float(m.group(2))
    assert 0.0 <= succ <= 100.0 and 0.0 <= prec <= 100.0

    # result dump tree (reference eval_tracking_utils.py track_result layout)
    results = list(eval_dir.rglob("track_result.txt"))
    assert results and results[0].stat().st_size > 0

    # TEST.SAVE_PCD per-frame candidate clouds (eval_tracking_utils.py:282-299)
    pcds = list(eval_dir.rglob("pcd/*.pcd"))
    assert pcds, "SAVE_PCD produced no .pcd dumps"
