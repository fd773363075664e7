"""Parity snapshot: our relaxed evaluator vs the reference implementation.

The expected numbers below were produced by running the REFERENCE
evaluator (`/root/reference/eval_and_vis.py::evaluate_strict_boundary`)
over the five synthetic videos constructed here (seeded; perfect /
late-transition / early-transition / 15%-noise / skipped-phase cases) and
committing its outputs verbatim — including the >100% values from the
reference's relaxed-denominator quirk and the NaN for the absent phase.
Any divergence in the boundary-forgiveness rules, clamping, or per-phase
aggregation breaks these equalities.
"""

import numpy as np

from surgical_tpu.eval.relaxed import evaluate_video


def _videos():
    rng = np.random.default_rng(42)
    videos = []
    gt = np.repeat(np.arange(7), 60)
    videos.append((gt, gt.copy()))

    gt = np.repeat(np.arange(7), 80)
    pred = gt.copy()
    for i, late in enumerate((5, 12, 30, 0, 7, 11)):
        pred[80 * (i + 1) : 80 * (i + 1) + late] = i
    videos.append((gt, pred))

    gt = np.repeat(np.arange(7), 70)
    pred = gt.copy()
    for i, early in enumerate((4, 9, 15, 2, 0, 8)):
        if early:
            pred[70 * (i + 1) - early : 70 * (i + 1)] = i + 1
    videos.append((gt, pred))

    gt = np.repeat(np.arange(7), 100)
    pred = gt.copy()
    idx = rng.choice(len(gt), size=int(0.15 * len(gt)), replace=False)
    pred[idx] = rng.integers(0, 7, len(idx))
    videos.append((gt, pred))

    gt = np.concatenate([np.full(120, 0), np.full(30, 1), np.full(200, 2),
                         np.full(15, 4), np.full(90, 5), np.full(60, 6)])
    pred = np.concatenate([np.full(110, 0), np.full(45, 1), np.full(190, 2),
                           np.full(20, 4), np.full(90, 5), np.full(60, 6)])
    videos.append((gt, pred))
    return videos


# (acc, prec[7], rec[7], jacc[7]) from the reference evaluator, verbatim.
EXPECTED = [
    (100.0, [100.0] * 7, [100.0] * 7, [100.0] * 7),
    (95.8928571429,
     [100.0, 103.4482758621, 89.7959183673, 120.0, 100.0, 107.1428571429,
      114.4927536232],
     [106.25, 112.5, 110.0, 75.0, 108.75, 112.5, 98.75],
     [100.0, 97.8260869565, 80.0, 75.0, 100.0, 98.9010989011, 98.75]),
    (98.9795918367,
     [106.0606060606, 113.8461538462, 115.625, 96.3855421687, 100.0,
      112.9032258065, 100.0],
     [100.0, 105.7142857143, 105.7142857143, 114.2857142857, 102.8571428571,
      100.0, 111.4285714286],
     [100.0, 100.0, 93.6708860759, 94.1176470588, 100.0, 100.0, 100.0]),
    (87.4285714286,
     [87.5, 87.2549019608, 90.3225806452, 83.3333333333, 85.5670103093,
      87.6288659794, 92.9292929293],
     [91.0, 89.0, 84.0, 90.0, 83.0, 85.0, 92.0],
     [80.5309734513, 78.0701754386, 75.6756756757, 75.6302521008,
      72.8070175439, 75.8928571429, 85.9813084112]),
    (99.0291262136,
     [109.0909090909, 100.0, 102.6315789474, np.nan, 75.0, 100.0, 100.0],
     [100.0, 150.0, 97.5, np.nan, 100.0, 100.0, 100.0],
     [100.0, 100.0, 97.5, np.nan, 75.0, 100.0, 100.0]),
]


def test_reference_metric_snapshot():
    for vi, ((gt, pred), (eacc, eprec, erec, ejacc)) in enumerate(
        zip(_videos(), EXPECTED)
    ):
        acc, prec, rec, jacc = evaluate_video(gt, pred)
        np.testing.assert_allclose(acc, eacc, rtol=1e-9, err_msg=f"v{vi} acc")
        for name, got, want in (("prec", prec, eprec), ("rec", rec, erec),
                                ("jacc", jacc, ejacc)):
            np.testing.assert_allclose(
                np.asarray(got, float), np.asarray(want, float),
                rtol=1e-9, equal_nan=True, err_msg=f"v{vi} {name}",
            )
