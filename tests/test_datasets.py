"""Host dataset layer tests: clip indexing, sampling, loading, prefetch."""

import numpy as np
import pytest
from PIL import Image

from surgical_tpu.data.datasets import (
    ClipDataset,
    ClipSampler,
    DiskCache,
    clip_start_indices,
    load_flow,
    load_image,
    prefetch_batches,
)


def test_clip_start_indices_matches_reference_semantics():
    # videos of length 5 and 4, seq_len 3: starts 0,1,2 then 5,6
    assert clip_start_indices(3, [5, 4]) == [0, 1, 2, 5, 6]
    # seq_len 1: every frame
    assert clip_start_indices(1, [2, 2]) == [0, 1, 2, 3]


def test_clip_sampler_expansion():
    s = ClipSampler(sequence_length=3, starts=[0, 5])
    np.testing.assert_array_equal(s.indices(), [0, 1, 2, 5, 6, 7])
    shuffled = s.indices(epoch=1, shuffle=True)
    assert sorted(shuffled.tolist()) == [0, 1, 2, 5, 6, 7]
    # clips stay contiguous after shuffling
    assert np.ptp(shuffled.reshape(-1, 3), axis=1).max() == 2


def make_fake_frames(tmp_path, n=4):
    img_dir = tmp_path / "cutMargin" / "1"
    seg_dir = tmp_path / "ss_Bimasks_pos_ep10" / "1"
    flow_dir = tmp_path / "raft_flow_npy" / "1"
    for d in (img_dir, seg_dir, flow_dir):
        d.mkdir(parents=True)
    paths = []
    rng = np.random.default_rng(0)
    for i in range(n):
        frame = i * 25
        p = img_dir / f"{frame}.jpg"
        Image.fromarray(rng.integers(0, 255, (100, 120, 3), dtype=np.uint8)).save(p)
        Image.fromarray(rng.integers(0, 255, (100, 120), dtype=np.uint8)).save(
            seg_dir / f"{frame}.png"
        )
        if i < n - 1:  # last frame has no flow (reference fallback path)
            np.save(flow_dir / f"{frame}.npy", rng.standard_normal((100, 120, 2)).astype(np.float32))
        paths.append(str(p))
    return paths


def test_clip_dataset_loading(tmp_path):
    paths = make_fake_frames(tmp_path)
    labels = np.zeros((4, 15))
    labels[:, 0] = [0, 1, 2, 3]
    ds = ClipDataset(paths, labels, resize=64)
    imgs, segs, flow, phase, ant = ds.frames([0, 3])
    assert imgs.shape == (2, 64, 64, 3) and imgs.dtype == np.uint8
    assert segs.shape == (2, 64, 64, 1)
    assert flow.shape == (2, 64, 64, 2) and flow.dtype == np.float16
    np.testing.assert_array_equal(phase, [0, 3])
    # last frame had no flow file -> zeros
    assert (flow[1] == 0).all() and not (flow[0] == 0).all()


def test_flow_displacement_rescale(tmp_path):
    paths = make_fake_frames(tmp_path, n=2)
    # overwrite with a constant field so the rescale factor is exact
    flow_path = paths[0].replace("cutMargin", "raft_flow_npy").replace(".jpg", ".npy")
    np.save(flow_path, np.ones((100, 120, 2), np.float32))
    f = load_flow(paths[0], size=50)
    # u scaled by 50/120, v by 50/100 (data_process.py:433-444 semantics)
    np.testing.assert_allclose(f[..., 0], 50 / 120, rtol=1e-2)
    np.testing.assert_allclose(f[..., 1], 50 / 100, rtol=1e-2)


def test_noise_segmap_ablation(tmp_path):
    paths = make_fake_frames(tmp_path)
    ds = ClipDataset(paths, np.zeros((4, 15)), resize=32, noise_segmap=True)
    _, segs, _, _, _ = ds.frames([0, 0])
    assert segs.std() > 10  # noise, and deterministic per path:
    _, segs2, _, _, _ = ds.frames([0])
    np.testing.assert_array_equal(segs[0], segs2[0])


def test_disk_cache(tmp_path):
    paths = make_fake_frames(tmp_path)
    cache = DiskCache(str(tmp_path / "cache"))
    ds = ClipDataset(paths, np.zeros((4, 15)), resize=32, with_flow=False, cache=cache)
    a, *_ = ds.frames([0])
    import os
    n_cached = len(os.listdir(tmp_path / "cache"))
    assert n_cached == 2  # img + seg
    b, *_ = ds.frames([0])
    np.testing.assert_array_equal(a, b)


def test_m2cai_ant_columns(tmp_path):
    paths = make_fake_frames(tmp_path)
    labels = np.arange(4 * 15, dtype=np.float64).reshape(4, 15)
    ds = ClipDataset(paths, labels, resize=32, with_flow=False, ant_cols=(1, 9))
    _, _, _, _, ant = ds.frames([1])
    np.testing.assert_array_equal(ant[0], labels[1, 1:9])
    assert ant.shape == (1, 8)


def test_prefetch_batches(tmp_path):
    paths = make_fake_frames(tmp_path)
    ds = ClipDataset(paths, np.zeros((4, 15)), resize=32, with_flow=False)
    batches = list(prefetch_batches(ds, np.arange(4), batch_size=3, num_workers=2))
    assert len(batches) == 2
    assert batches[0][0].shape[0] == 3 and batches[1][0].shape[0] == 1


def test_load_image_error_path(tmp_path):
    with pytest.raises(Exception):
        load_image(str(tmp_path / "nope.jpg"))
