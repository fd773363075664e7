"""Deployment export round-trip (serving/export.py): the serialized
StableHLO artifact must reproduce the live forward without model code."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.core.config import BackboneConfig, HeadConfig
from surgical_tpu.models.mit_evp import MiTEVP
from surgical_tpu.serving.export import (
    export_feature_extractor,
    load_artifact,
    save_artifact,
)


def _tiny(with_flow=True):
    cfg = BackboneConfig.preset("tiny", with_flow=with_flow)
    head = HeadConfig(embedding_dim=32, hidden=16)
    model = MiTEVP(cfg, head)
    S = 64
    z = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z,
                           jnp.zeros((1, S, S, 2), jnp.float32))
    return model, variables, S


def test_export_roundtrip_features(tmp_path):
    model, variables, S = _tiny()
    B = 2
    exported = export_feature_extractor(model, variables, B, size=S)
    save_artifact(str(tmp_path / "art"), exported, meta={"variant": "tiny"})

    fn = load_artifact(str(tmp_path / "art"))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    seg = rng.integers(0, 255, (B, S, S, 1), dtype=np.uint8)
    flow = rng.standard_normal((B, S, S, 2)).astype(np.float16)

    got = np.asarray(fn(img, seg, flow))
    assert got.shape == (B, 32)

    # parity with the live forward through the same wire-format dequant
    from surgical_tpu.core.config import CHOLEC80_MEAN, CHOLEC80_STD

    mean = (np.asarray(CHOLEC80_MEAN) * 255.0).astype(np.float32)
    std = (np.asarray(CHOLEC80_STD) * 255.0).astype(np.float32)
    imgf = jnp.asarray((img.astype(np.float32) - mean) / std).astype(jnp.bfloat16)
    segf = jnp.broadcast_to(
        jnp.asarray((seg.astype(np.float32) - mean) / std).astype(jnp.bfloat16),
        imgf.shape)
    want = np.asarray(model.apply(
        variables, imgf, segf, jnp.asarray(flow).astype(jnp.bfloat16),
        return_features=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    assert fn.manifest["variant"] == "tiny"
    assert fn.manifest["platforms"] == ["cpu"]


def test_export_no_flow_and_logits(tmp_path):
    model, variables, S = _tiny(with_flow=False)
    B = 2
    exported = export_feature_extractor(
        model, variables, B, size=S, with_flow=False, features=False)
    save_artifact(str(tmp_path / "art2"), exported)
    fn = load_artifact(str(tmp_path / "art2"))
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    seg = rng.integers(0, 255, (B, S, S, 1), dtype=np.uint8)
    phase, ant = fn(img, seg)
    assert np.asarray(phase).shape == (B, 7)
    assert np.asarray(ant).shape == (B, 7)
    assert np.isfinite(np.asarray(phase)).all()
