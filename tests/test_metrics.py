"""Metric tests: MAE triad masking rules + sklearn-equivalent PRJ."""

import numpy as np

from surgical_tpu.eval.metrics import (
    MAETriad,
    frame_accuracy,
    precision_recall_jaccard,
)


def test_mae_triad_masks():
    # one phase fully outside horizon (t == 1) -> contributes nothing to inMAE
    T = 10
    gt = np.ones((T, 2))
    gt[:, 0] = np.linspace(0.05, 0.95, T)  # inside horizon, head < 0.1
    pred = gt + 0.1

    triad = MAETriad(horizon=5.0)
    triad.update(pred, gt)
    r = triad.result()

    # phase 0: all t in (0,1) -> inMAE = mean |0.1*5| = 0.5
    np.testing.assert_allclose(r["inMAE"], 0.5, rtol=1e-6)
    # eMAE only where t < 0.1 (first frame, t=0.05): |0.1*5| = 0.5
    np.testing.assert_allclose(r["eMAE"], 0.5, rtol=1e-6)
    # pMAE where 0.1 < pred < 0.9
    mask = (pred[:, 0] > 0.1) & (pred[:, 0] < 0.9)
    np.testing.assert_allclose(r["pMAE"], np.mean(np.abs(pred[mask, 0] - gt[mask, 0]) * 5))


def test_mae_triad_nan_phase_skipped():
    gt = np.ones((5, 1))  # t == 1 everywhere: all masks empty
    pred = np.ones((5, 1)) * 0.95
    triad = MAETriad()
    triad.update(pred, gt)
    r = triad.result()
    assert np.isnan(r["inMAE"]) and np.isnan(r["eMAE"])


def test_prj_matches_sklearn_semantics(rng):
    try:
        from sklearn import metrics as skm
    except ImportError:
        skm = None

    y_true = rng.integers(0, 7, size=500)
    y_pred = rng.integers(0, 7, size=500)
    ours = precision_recall_jaccard(y_true, y_pred, 7)

    if skm is not None:
        np.testing.assert_allclose(
            ours["precision_macro"],
            skm.precision_score(y_true, y_pred, average="macro", zero_division=0),
        )
        np.testing.assert_allclose(
            ours["recall_macro"],
            skm.recall_score(y_true, y_pred, average="macro", zero_division=0),
        )
        np.testing.assert_allclose(
            ours["jaccard_macro"],
            skm.jaccard_score(y_true, y_pred, average="macro", zero_division=0),
        )
    else:
        # hand-checked fallback: perfect prediction degenerates to 1.0
        perfect = precision_recall_jaccard(y_true, y_true, 7)
        assert perfect["precision_macro"] == 1.0
        assert perfect["jaccard_macro"] == 1.0


def test_frame_accuracy():
    assert frame_accuracy([0, 1, 2, 3], [0, 1, 2, 0]) == 0.75
