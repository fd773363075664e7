"""Whole-pipeline CLI drive on a synthetic on-disk corpus: prepare-data ->
train-backbone -> extract-features -> train-temporal -> train-refiner ->
predict -> evaluate, through the real argparse entrypoints (the reference's
six-script pipeline, README.md:21-36)."""

from surgical_tpu.cli import main


def test_selfcheck_full(capsys):
    assert main(["selfcheck", "--full"]) == 0
    out = capsys.readouterr().out
    assert "SELFCHECK-FULL OK" in out
    # every stage printed its completion line
    assert "indexed 4 videos" in out
    assert "best epoch:" in out
    assert "Mean Accuracy" in out
