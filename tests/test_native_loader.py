"""Native C++ JPEG loader tests (skipped when the toolchain is missing)."""

import numpy as np
import pytest
from PIL import Image

from surgical_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader unavailable (g++/libjpeg)"
)


def make_jpegs(tmp_path, n=6, size=(90, 110)):
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(n):
        arr = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
        p = tmp_path / f"f{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
        arrays.append(arr)
    return paths, arrays


def test_decode_matches_pil(tmp_path):
    paths, _ = make_jpegs(tmp_path)
    out, failures = native.decode_resize_batch(paths, out_size=64)
    assert failures == 0
    assert out.shape == (6, 64, 64, 3)
    for i, p in enumerate(paths):
        pil = np.asarray(Image.open(p).convert("RGB").resize((64, 64), Image.BILINEAR))
        diff = np.abs(out[i].astype(int) - pil.astype(int))
        assert diff.mean() < 6, diff.mean()  # decode identical, resize kernel close


def test_grayscale_channel(tmp_path):
    paths, _ = make_jpegs(tmp_path, n=2)
    out, failures = native.decode_resize_batch(paths, out_size=32, channels=1)
    assert failures == 0 and out.shape == (2, 32, 32, 1)


def test_missing_file_zero_filled(tmp_path):
    paths, _ = make_jpegs(tmp_path, n=2)
    paths.append(str(tmp_path / "missing.jpg"))
    out, failures = native.decode_resize_batch(paths, out_size=32)
    assert failures == 1
    assert (out[2] == 0).all() and not (out[0] == 0).all()


def test_into_preallocated_buffer(tmp_path):
    paths, _ = make_jpegs(tmp_path, n=3)
    buf = np.zeros((3, 48, 48, 3), np.uint8)
    out, _ = native.decode_resize_batch(paths, 48, out=buf)
    assert out is buf and buf.max() > 0


def test_throughput_smoke(tmp_path):
    """Native loader should decode hundreds of frames/s on this host."""
    import time

    paths, _ = make_jpegs(tmp_path, n=64, size=(250, 250))
    native.decode_resize_batch(paths, 250)  # warm
    best = 0.0
    for _ in range(3):  # best-of-3: CI runs share the host with compiles
        t0 = time.perf_counter()
        native.decode_resize_batch(paths, 250)
        best = max(best, 64 / (time.perf_counter() - t0))
    assert best > 25, best
