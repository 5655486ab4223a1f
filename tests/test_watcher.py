"""Checkpoint-watcher logic tests (reference repeat_eval_ckpt semantics): evaluates
each new checkpoint exactly once, respects start_epoch, persists the eval record
across restarts, and times out when nothing new appears."""

import importlib.util
import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
spec = importlib.util.spec_from_file_location("test_tracking_cli", REPO / "tools" / "test_tracking.py")
cli = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cli)


class Args:
    max_waiting_mins = 0  # give up as soon as there is nothing to evaluate
    start_epoch = 2


class Logger:
    def info(self, *a):
        pass


def make_ckpt_dir(tmp_path, steps):
    d = tmp_path / "ckpt"
    d.mkdir(exist_ok=True)
    for s in steps:
        (d / str(s)).mkdir(exist_ok=True)
    return d


def test_watcher_evaluates_new_ckpts_once(tmp_path):
    ckpt_dir = make_ckpt_dir(tmp_path, [1, 2, 3, 5])
    result_dir = tmp_path / "eval"
    result_dir.mkdir()
    calls = []

    def fake_eval(args, cfg, model, loader, ckpt_path, logger, rdir, epoch_tag):
        calls.append(int(ckpt_path.name))
        return 50.0, 60.0

    cli.repeat_eval_ckpt(Args(), None, None, None, ckpt_dir, Logger(), result_dir,
                         poll_interval=0, eval_fn=fake_eval)
    assert calls == [2, 3, 5]  # start_epoch filters out 1
    record = (result_dir / "eval_list.txt").read_text()
    assert record.count("\n") == 3

    # restart: record file prevents re-evaluation; a new ckpt appears
    make_ckpt_dir(tmp_path, [6])
    calls.clear()
    cli.repeat_eval_ckpt(Args(), None, None, None, ckpt_dir, Logger(), result_dir,
                         poll_interval=0, eval_fn=fake_eval)
    assert calls == [6]


def test_watcher_times_out_on_empty_dir(tmp_path):
    ckpt_dir = make_ckpt_dir(tmp_path, [])
    result_dir = tmp_path / "eval"
    result_dir.mkdir()
    cli.repeat_eval_ckpt(Args(), None, None, None, ckpt_dir, Logger(), result_dir,
                         poll_interval=0, eval_fn=lambda *a, **k: (0, 0))
    # returns without hanging
