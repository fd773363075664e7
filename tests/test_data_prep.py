"""Tests for anticipation GT, Cholec80 indexing, and transforms."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surgical_tpu.data.anticipation import (
    DEFAULT_STEP,
    anticipation_gt,
    anticipation_gt_one_phase,
    phases_to_one_hot,
)
from surgical_tpu.data import transforms as T
from surgical_tpu.data.cholec80 import (
    Split,
    from_reference_pickle,
    index_video,
    make_splits,
    to_reference_pickle,
)


def loop_oracle(present, horizon, step):
    """Direct transcription of the reference backward scan
    (generate_phase_anticipation.py:10-29)."""
    out = np.zeros(len(present))
    count = horizon
    for i in range(len(present) - 1, -1, -1):
        if present[i]:
            count = 0
        else:
            count = min(horizon, count + step)
        out[i] = count
    return out / horizon


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_anticipation_matches_backward_scan(rng, seed):
    r = np.random.default_rng(seed)
    present = r.random(500) < 0.05
    ours = anticipation_gt_one_phase(present, horizon=5.0)
    oracle = loop_oracle(present, 5.0, DEFAULT_STEP)
    np.testing.assert_allclose(ours, oracle, atol=1e-12)


def test_anticipation_never_present():
    present = np.zeros(100, dtype=bool)
    out = anticipation_gt_one_phase(present, horizon=5.0)
    np.testing.assert_allclose(out, 1.0)


def test_anticipation_gt_shape():
    phases = np.array([0, 0, 1, 1, 2])
    out = anticipation_gt(phases_to_one_hot(phases, 3), horizon=5.0)
    assert out.shape == (5, 3)
    np.testing.assert_allclose(out[:, 0][:2], 0.0)  # present -> 0


# -- cholec80 indexing -----------------------------------------------------------


def make_fake_video(tmp_path, video_id=1, frames_25fps=250):
    root = tmp_path / "cholec80"
    (root / "phase_annotations").mkdir(parents=True, exist_ok=True)
    (root / "tool_annotations").mkdir(exist_ok=True)
    phases = np.repeat(np.arange(7), -(-frames_25fps // 7))[:frames_25fps]
    names = [
        "Preparation", "CalotTriangleDissection", "ClippingCutting",
        "GallbladderDissection", "GallbladderPackaging", "CleaningCoagulation",
        "GallbladderRetraction",
    ]
    pfile = root / "phase_annotations" / f"video{video_id:02d}-phase.txt"
    with open(pfile, "w") as f:
        f.write("Frame\tPhase\n")
        for i, p in enumerate(phases):
            f.write(f"{i}\t{names[p]}\n")
    tfile = root / "tool_annotations" / f"video{video_id:02d}-tool.txt"
    with open(tfile, "w") as f:
        f.write("Frame\t" + "\t".join(f"T{i}" for i in range(7)) + "\n")
        for i in range(0, frames_25fps, 25):
            f.write(f"{i}\t" + "\t".join(str((i // 25 + k) % 2) for k in range(7)) + "\n")
    return str(root), str(pfile), str(tfile), phases


def test_index_video(tmp_path):
    root, pfile, tfile, phases = make_fake_video(tmp_path)
    vi = index_video(1, os.path.join(root, "cutMargin", "1"), pfile, tfile)
    expected_T = len(range(0, len(phases), 25))
    assert vi.num_frames == expected_T
    assert vi.labels.shape == (expected_T, 15)
    np.testing.assert_array_equal(vi.labels[:, 0], phases[::25])
    # anticipation normalized to [0, 1]
    assert (vi.labels[:, 8:] >= 0).all() and (vi.labels[:, 8:] <= 1).all()
    # frame paths follow the cutMargin layout
    assert vi.img_paths[1].endswith("cutMargin/1/25.jpg")


def make_fake_m2cai(tmp_path, num_videos=4, frames_25fps=200):
    from surgical_tpu.data.cholec80 import M2CAI_PHASE_NAMES

    root = tmp_path / "m2cai16"
    (root / "phase_annotations").mkdir(parents=True, exist_ok=True)
    all_phases = {}
    for v in range(1, num_videos + 1):
        phases = np.repeat(np.arange(8), -(-frames_25fps // 8))[:frames_25fps]
        with open(root / "phase_annotations" / f"video{v:02d}-phase.txt", "w") as f:
            f.write("Frame\tPhase\n")
            for i, p in enumerate(phases):
                f.write(f"{i}\t{M2CAI_PHASE_NAMES[p]}\n")
        all_phases[v] = phases
    return str(root), all_phases


def test_index_m2cai(tmp_path):
    """M2CAI16 variant: 8-phase vocab, no tool columns, [phase, 8 x ant]
    rows (get_path_labels.py M2CAI branch; ant_cols (1, 9))."""
    from surgical_tpu.data.cholec80 import index_dataset

    root, all_phases = make_fake_m2cai(tmp_path)
    videos = index_dataset(root, num_videos=4, dataset="m2cai16")
    assert len(videos) == 4
    v = videos[0]
    T_ = len(range(0, len(all_phases[1]), 25))
    assert v.labels.shape == (T_, 9)
    np.testing.assert_array_equal(v.labels[:, 0], all_phases[1][::25])
    assert v.labels[:, 0].max() == 7  # 8-phase ids
    assert (v.labels[:, 1:] >= 0).all() and (v.labels[:, 1:] <= 1).all()


def test_m2cai_splits(tmp_path):
    from surgical_tpu.data.cholec80 import index_dataset

    root, _ = make_fake_m2cai(tmp_path, num_videos=41, frames_25fps=50)
    videos = index_dataset(root, num_videos=41, dataset="m2cai16")
    train, val, test = make_splits(videos, scheme="m2cai")
    assert (len(train.num_each), len(val.num_each), len(test.num_each)) == (27, 7, 14)
    assert train.labels.shape[1] == 9
    tr_all, va, te = make_splits(videos, scheme="m2cai_all")
    assert len(tr_all.num_each) == 41 and len(va.num_each) == 0 == len(te.num_each)
    assert va.labels.shape == (0, 9)
    # split-aware video numbering (prediction txts are named by THESE ids,
    # trans_SV_output.py:304-321): m2cai val = 28-34, test = 28-41 — a
    # 41-offset would misname every output file
    assert val.video_ids == list(range(28, 35))
    assert test.video_ids == list(range(28, 42))
    assert tr_all.video_ids == list(range(1, 42))


def test_reference_pickle_roundtrip(tmp_path):
    labels = np.arange(30, dtype=np.float64).reshape(2, 15)
    s = Split(["a.jpg", "b.jpg"], labels, [2])
    path = str(tmp_path / "train_val_paths_labels.pkl")
    to_reference_pickle(s, s, s, path)
    tr, va, te = from_reference_pickle(path)
    np.testing.assert_array_equal(tr.labels, labels)
    assert te.num_each == [2]
    assert va.paths == ["a.jpg", "b.jpg"]


# -- transforms ------------------------------------------------------------------


def test_clip_sync_and_modality_sync(rng):
    """Same key -> identical geometry for all frames and modalities."""
    T_ = 3
    imgs = jnp.asarray(rng.random((T_, 250, 250, 3)).astype(np.float32))
    segs = imgs  # identical content -> identical output geometry
    flow = jnp.asarray(rng.random((T_, 250, 250, 2)).astype(np.float32))
    key = jax.random.key(42)
    cfg = T.AugConfig()
    p = T.draw_params(key, cfg)
    # crop applied to two modalities gives the same spatial slice
    ci = np.asarray(T.crop(imgs, p.crop_xy, 224))
    cs = np.asarray(T.crop(segs, p.crop_xy, 224))
    np.testing.assert_array_equal(ci, cs)
    # same key -> same params
    p2 = T.draw_params(key, cfg)
    assert int(p.crop_xy[0]) == int(p2.crop_xy[0])
    assert float(p.angle_deg) == float(p2.angle_deg)


def test_flip_negates_u(rng):
    flow = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
    out = T.hflip(flow, jnp.asarray(True), negate_u=True)
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), -np.asarray(flow[..., 0][:, :, ::-1]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out[..., 1]), np.asarray(flow[..., 1][:, :, ::-1]), rtol=1e-6
    )


def test_rotation_rotates_vectors():
    flow = jnp.ones((1, 16, 16, 2))
    out = np.asarray(T.rotate(flow, jnp.asarray(90.0), rotate_vectors=True))
    # interior pixels: (u,v)=(1,1) rotated 90° CCW -> (-1, 1)
    np.testing.assert_allclose(out[0, 8, 8], [-1.0, 1.0], atol=1e-5)


def test_zero_rotation_is_identity(rng):
    x = jnp.asarray(rng.random((2, 10, 10, 3)).astype(np.float32))
    out = T.rotate(x, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_color_jitter_identity_params(rng):
    img = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    p = T.AugParams(
        crop_xy=jnp.zeros(2, jnp.int32), flip=jnp.asarray(False),
        angle_deg=jnp.asarray(0.0), brightness=jnp.asarray(1.0),
        contrast=jnp.asarray(1.0), saturation=jnp.asarray(1.0),
        hue=jnp.asarray(0.0),
    )
    out = T.color_jitter(img, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_hue_matches_torchvision(rng):
    pytest.importorskip("torchvision")
    import torch
    import torchvision.transforms.functional as TF

    img = rng.random((1, 12, 12, 3)).astype(np.float32)
    shift = 0.03
    ours = np.asarray(T.adjust_hue(jnp.asarray(img), jnp.asarray(shift)))
    theirs = (
        TF.adjust_hue(torch.from_numpy(img[0]).permute(2, 0, 1), shift)
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(ours[0], theirs, atol=2e-2)


def test_train_and_eval_stacks_run(rng):
    imgs = jnp.asarray(rng.random((2, 250, 250, 3)).astype(np.float32))
    segs = jnp.asarray(rng.random((2, 250, 250, 3)).astype(np.float32))
    flow = jnp.asarray(rng.random((2, 250, 250, 2)).astype(np.float32))
    i, s, f = T.train_preprocess_clip(imgs, segs, flow, jax.random.key(0))
    assert i.shape == (2, 224, 224, 3) and f.shape == (2, 224, 224, 2)
    i2, s2, f2 = T.eval_preprocess_clip(imgs, segs, flow)
    assert i2.shape == (2, 224, 224, 3)
