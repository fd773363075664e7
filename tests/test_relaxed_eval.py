"""Tests for the MICCAI-relaxed evaluator + prediction txt IO."""

import numpy as np

from surgical_tpu.eval.predictions import read_phase_txt, write_phase_txt
from surgical_tpu.eval.relaxed import evaluate_video, evaluate_videos, relaxed_diff


def test_perfect_prediction():
    gt = np.repeat(np.arange(7), 50)
    acc, prec, rec, jacc = evaluate_video(gt, gt)
    assert acc == 100.0
    np.testing.assert_allclose(prec, 100.0)
    np.testing.assert_allclose(rec, 100.0)
    np.testing.assert_allclose(jacc, 100.0)


def test_boundary_relaxation_forgives_late_transition():
    """Predicting the previous phase for <=10 frames into a new segment is
    forgiven (diff == -1 at the segment head)."""
    gt = np.array([0] * 50 + [1] * 50)
    pred = np.array([0] * 55 + [1] * 45)  # 5 frames late into phase 1
    acc, _, _, _ = evaluate_video(gt, pred)
    assert acc == 100.0

    # 15 frames late: only 10 forgiven
    pred2 = np.array([0] * 65 + [1] * 35)
    acc2, _, _, _ = evaluate_video(gt, pred2)
    assert acc2 == (100 - 5) / 100 * 100


def test_boundary_relaxation_is_asymmetric():
    """diff == +1 at a segment HEAD (predicting the next phase too early at
    the start of a segment) is NOT forgiven for phases 0-2."""
    gt = np.array([0] * 50 + [1] * 50)
    pred = np.array([0] * 45 + [1] * 55)  # enters phase 1 early
    # the last 5 frames of gt-phase-0 segment have diff +1 -> forgiven at
    # segment TAIL (tail rule for phase 0 forgives +1)
    acc, _, _, _ = evaluate_video(gt, pred)
    assert acc == 100.0

    # but predicting phase 2 during early phase-1 (diff +1 at head of
    # phase-1 segment): head rule for phase 1 forgives only -1
    pred2 = np.array([0] * 50 + [2] * 5 + [1] * 45)
    diff = relaxed_diff(gt, pred2)
    assert np.sum(diff == 0) == 95


def test_phase45_tail_forgives_plus2():
    gt = np.array([3] * 50 + [5] * 50)
    pred = np.array([3] * 45 + [5] * 55)  # diff +2 in tail of phase-3 seg
    acc, _, _, _ = evaluate_video(gt, pred)
    assert acc == 100.0


def test_absent_phase_is_nan():
    gt = np.zeros(100, dtype=int)
    acc, prec, rec, jacc = evaluate_video(gt, gt)
    assert np.isnan(prec[1:]).all()
    assert prec[0] == 100.0


def test_aggregate_two_level_mean():
    gt1 = np.repeat(np.arange(7), 20)
    gt2 = np.repeat(np.arange(7)[::-1], 30)
    res = evaluate_videos([gt1, gt2], [gt1, gt2])
    assert res.mean_acc == 100.0
    assert res.mean_jacc == 100.0
    assert res.phase_mean_prec.shape == (7,)


def test_phase_txt_roundtrip(tmp_path):
    preds = [0, 1, 2, 3, 4, 5, 6, 6, 5]
    path = str(tmp_path / "video41-phase.txt")
    write_phase_txt(path, preds, fps=25)
    got = read_phase_txt(path)
    np.testing.assert_array_equal(got, preds)
    # format check: frame index advances by fps per row, tab separated
    first = open(path).readline().rstrip("\n")
    assert first == "0\t0\t"
