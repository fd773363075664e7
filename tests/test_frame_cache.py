"""FrameCache: packed pre-decoded memmap cache for the host input leg
(reference CholecSegmapDataset1 disk-cache idea, data_process.py:327-393,
TPU-style). Exactness vs the decoding ClipDataset, resumability, and the
CLI cache-frames -> extract-features --frame-cache wiring."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from surgical_tpu.data.datasets import ClipDataset, FrameCache, prefetch_batches


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "cutMargin" / "1"
    seg_dir = tmp_path / "ss_Bimasks_pos_ep10" / "1"
    img_dir.mkdir(parents=True)
    seg_dir.mkdir(parents=True)
    paths = []
    for n in range(10):
        p = img_dir / f"{n * 25}.jpg"
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(p)
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
            seg_dir / f"{n * 25}.jpg")
        paths.append(str(p))
    labels = rng.uniform(0, 1, (10, 15)).astype(np.float32)
    labels[:, 0] = rng.integers(0, 7, 10)
    return ClipDataset(paths, labels, resize=32, with_flow=True)


def test_build_and_exact_frames(corpus, tmp_path):
    d = str(tmp_path / "cache")
    fc = FrameCache.build(corpus, d, batch_size=4)
    assert len(fc) == len(corpus)
    idx = np.array([7, 0, 3])
    got = fc.frames(idx)
    want = corpus.frames(idx)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    # progress marker is gone once complete; manifest published
    assert not os.path.exists(os.path.join(d, FrameCache.PROGRESS))
    assert FrameCache.exists(d)
    # prefetch_batches drop-in
    batches = list(prefetch_batches(fc, np.arange(10), 4))
    assert sum(b[0].shape[0] for b in batches) == 10


def test_build_resume_continues(corpus, tmp_path):
    d = str(tmp_path / "cache")
    FrameCache.build(corpus, d, batch_size=4)
    ref = FrameCache(d).frames(np.arange(10))

    # simulate an interrupted build: manifest missing, progress mid-way,
    # tail frames zeroed
    os.remove(os.path.join(d, FrameCache.MANIFEST))
    with open(os.path.join(d, FrameCache.PROGRESS), "w") as f:
        json.dump({"done": 5}, f)
    img = np.load(os.path.join(d, "img.npy"), mmap_mode="r+")
    img[5:] = 0
    img.flush()
    del img

    fc = FrameCache.build(corpus, d, batch_size=4)
    got = fc.frames(np.arange(10))
    for g, w in zip(got, ref):
        np.testing.assert_array_equal(g, w)


def test_build_is_idempotent(corpus, tmp_path):
    d = str(tmp_path / "cache")
    FrameCache.build(corpus, d)
    # second call must not redecode (poison the source to prove it)
    corpus.paths = ["/nonexistent"] * len(corpus.paths)
    fc = FrameCache.build(corpus, d)
    assert len(fc) == 10


def test_no_flow_cache(corpus, tmp_path):
    corpus.with_flow = False
    d = str(tmp_path / "cache")
    fc = FrameCache.build(corpus, d)
    assert fc.frames(np.arange(3))[2] is None
    assert not os.path.exists(os.path.join(d, "flow.npy"))


def test_cli_cache_then_extract(tmp_path):
    """cache-frames -> extract-features --frame-cache produces the same
    features as direct decoding."""
    from surgical_tpu.cli import _write_synthetic_corpus, main

    root = str(tmp_path / "cholec80")
    work = str(tmp_path / "work")
    _write_synthetic_corpus(root, num_videos=4, frames=8)
    assert main(["prepare-data", "--root", root, "--out", work,
                 "--num-videos", "4", "--scheme", "smoke"]) == 0
    assert main(["cache-frames", "--work", work, "--splits", "test",
                 "--no-flow", "--batch-size", "8"]) == 0
    assert main(["train-backbone", "--work", work, "--variant", "tiny",
                 "--epochs", "1", "--batch-size", "8", "--lr", "0.01",
                 "--no-flow", "--midval-batches", "1"]) == 0
    assert main(["extract-features", "--work", work, "--variant", "tiny",
                 "--batch-size", "8", "--no-flow", "--splits", "test"]) == 0
    direct = np.load(os.path.join(work, "lfb", "test", "features.npy")).copy()
    assert main(["extract-features", "--work", work, "--variant", "tiny",
                 "--batch-size", "8", "--no-flow", "--splits", "test",
                 "--frame-cache", os.path.join(work, "frame_cache")]) == 0
    cached = np.load(os.path.join(work, "lfb", "test", "features.npy"))
    np.testing.assert_allclose(cached, direct, rtol=1e-5, atol=1e-5)


def test_cache_modality_mismatch_rejected(tmp_path):
    """A flow-less cache under a flow model must be REJECTED, not silently
    served (the model would skip flow fusion and write inconsistent
    features)."""
    import pytest

    from surgical_tpu.cli import _write_synthetic_corpus, main

    root = str(tmp_path / "cholec80")
    work = str(tmp_path / "work")
    _write_synthetic_corpus(root, num_videos=4, frames=8)
    assert main(["prepare-data", "--root", root, "--out", work,
                 "--num-videos", "4", "--scheme", "smoke"]) == 0
    assert main(["cache-frames", "--work", work, "--splits", "test",
                 "--no-flow", "--batch-size", "8"]) == 0
    # train WITH flow (the corpus has no .flo files — the zero-flow
    # fallback applies — but the model carries flow-encoder params)
    assert main(["train-backbone", "--work", work, "--variant", "tiny",
                 "--epochs", "1", "--batch-size", "8", "--lr", "0.01",
                 "--midval-batches", "1"]) == 0
    # extract WITHOUT --no-flow against the flow-less cache -> refused
    with pytest.raises(SystemExit, match="no-flow"):
        main(["extract-features", "--work", work, "--variant", "tiny",
              "--batch-size", "8", "--splits", "test",
              "--frame-cache", os.path.join(work, "frame_cache")])


def test_export_serving_requires_checkpoint(tmp_path):
    """export-serving with a --work that has no backbone checkpoint must
    fail loudly instead of silently exporting random weights."""
    import pytest

    from surgical_tpu.cli import main

    with pytest.raises(SystemExit, match="no backbone checkpoint"):
        main(["export-serving", "--out", str(tmp_path / "art"),
              "--work", str(tmp_path / "empty_work"), "--variant", "tiny",
              "--batch-size", "2", "--size", "64"])
