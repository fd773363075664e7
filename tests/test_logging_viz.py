"""Metrics logger + visualization smoke tests."""

import json
import os

import numpy as np

from surgical_tpu.eval.visualize import plot_anticipation, plot_ribbon
from surgical_tpu.utils.logging import MetricsLogger, Stopwatch


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), tensorboard=False)
    logger.log(0, {"loss": 1.5, "acc": np.float32(0.5)}, prefix="train/")
    logger.log(1, {"loss": 1.2})
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["train/loss"] == 1.5
    assert isinstance(lines[0]["train/acc"], float)
    assert lines[1]["step"] == 1


def test_stopwatch():
    sw = Stopwatch()
    with sw.section("a"):
        pass
    with sw.section("a"):
        pass
    assert "a" in sw.sections and sw.sections["a"] >= 0


def test_ribbon_plot(tmp_path):
    gt = np.repeat(np.arange(7), 10)
    pred = gt.copy()
    pred[30:35] = 0
    out = str(tmp_path / "ribbon.png")
    plot_ribbon(gt, pred, "video41", out)
    assert os.path.getsize(out) > 1000


def test_anticipation_plot(tmp_path):
    t = np.linspace(0, 1, 100)
    gt = np.stack([np.clip(1 - t * k, 0, 1) for k in range(1, 8)], axis=1)
    out = str(tmp_path / "ant.png")
    plot_anticipation(out, gt, gt * 0.9)
    assert os.path.getsize(out) > 1000
