"""`cli evaluate` hygiene: a video whose gt/pred txt is missing must fail
the evaluation loudly (non-zero exit + per-video stderr report) instead of
silently shrinking the mean — the reference reads every video in the range
unconditionally and crashes on a missing file (eval_and_vis.py main loop),
so a quiet skip would hide a failed prediction write. Round-3 VERDICT
weak-item 4."""

import os

import numpy as np
import pytest

from surgical_tpu.cli import main
from surgical_tpu.eval.predictions import video_txt_name, write_phase_txt


def _write_videos(d, ids, rng):
    os.makedirs(d, exist_ok=True)
    for vid in ids:
        write_phase_txt(os.path.join(d, video_txt_name(vid)),
                        rng.integers(0, 7, size=40))


@pytest.fixture()
def txt_dirs(tmp_path):
    rng = np.random.default_rng(0)
    gt, pred = str(tmp_path / "gt"), str(tmp_path / "pred")
    _write_videos(gt, [1, 2, 3], rng)
    _write_videos(pred, [1, 2, 3], rng)
    return gt, pred


def test_evaluate_all_present_exits_zero(txt_dirs, capsys):
    gt, pred = txt_dirs
    rc = main(["evaluate", "--gt", gt, "--pred", pred,
               "--first", "1", "--last", "3"])
    assert rc == 0
    assert "Mean Accuracy" in capsys.readouterr().out


def test_evaluate_missing_pred_fails_loudly(txt_dirs, capsys):
    gt, pred = txt_dirs
    os.remove(os.path.join(pred, video_txt_name(2)))
    rc = main(["evaluate", "--gt", gt, "--pred", pred,
               "--first", "1", "--last", "3"])
    captured = capsys.readouterr()
    assert rc == 1
    assert "MISSING pred txt for video 02" in captured.err
    assert "1 of 3 expected videos were missing" in captured.err
    # metrics over the remainder are still printed for diagnosis
    assert "Mean Accuracy" in captured.out


def test_evaluate_missing_gt_reported_as_gt(txt_dirs, capsys):
    gt, pred = txt_dirs
    os.remove(os.path.join(gt, video_txt_name(3)))
    rc = main(["evaluate", "--gt", gt, "--pred", pred,
               "--first", "1", "--last", "3"])
    assert rc == 1
    assert "MISSING gt txt for video 03" in capsys.readouterr().err


def test_evaluate_empty_range_exits_nonzero(tmp_path, capsys):
    gt, pred = str(tmp_path / "gt"), str(tmp_path / "pred")
    os.makedirs(gt)
    os.makedirs(pred)
    rc = main(["evaluate", "--gt", gt, "--pred", pred,
               "--first", "1", "--last", "2"])
    assert rc == 1
    assert "no evaluable videos" in capsys.readouterr().err
