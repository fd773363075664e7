"""int8 weight quantization (serving/quant.py) — round-trip fidelity and
the opt-in extraction path."""

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.serving.quant import (
    dequantize_tree,
    quantization_error,
    quantize_tree,
)


def _tree(rng):
    return {
        "dense": {"kernel": jnp.asarray(rng.standard_normal((64, 32)),
                                        jnp.float32) * 0.1,
                  "bias": jnp.asarray(rng.standard_normal((32,)), jnp.float32)},
        "conv": {"kernel": jnp.asarray(rng.standard_normal((3, 3, 8, 16)),
                                       jnp.float32)},
        "ln": {"scale": jnp.ones((32,)), "bias": jnp.zeros((32,))},
        "stats": {"count": jnp.asarray(7, jnp.int32)},
    }


def test_quantize_round_trip(rng):
    tree = _tree(rng)
    q, scales = quantize_tree(tree)
    # kernels -> int8; 1-D and integer leaves untouched
    assert q["dense"]["kernel"].dtype == jnp.int8
    assert q["conv"]["kernel"].dtype == jnp.int8
    assert q["dense"]["bias"].dtype == jnp.float32
    assert q["ln"]["scale"].dtype == jnp.float32
    assert q["stats"]["count"].dtype == jnp.int32
    deq = dequantize_tree(q, scales, jnp.float32)
    # per-output-channel symmetric int8: max error <= scale/2 per channel
    w = np.asarray(tree["dense"]["kernel"])
    got = np.asarray(deq["dense"]["kernel"])
    per_col_scale = np.abs(w).max(axis=0) / 127.0
    assert (np.abs(w - got) <= per_col_scale / 2 + 1e-7).all()
    np.testing.assert_array_equal(np.asarray(deq["dense"]["bias"]),
                                  np.asarray(tree["dense"]["bias"]))
    errs = quantization_error(tree, jnp.float32)
    assert all(e < 0.01 for e in errs.values()), errs


def test_quantize_jit_traceable(rng):
    tree = _tree(rng)
    q, scales = quantize_tree(tree)

    @jax.jit
    def f(q, scales, x):
        deq = dequantize_tree(q, scales, jnp.float32)
        return x @ deq["dense"]["kernel"] + deq["dense"]["bias"]

    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    want = x @ dequantize_tree(q, scales, jnp.float32)["dense"]["kernel"] \
        + tree["dense"]["bias"]
    np.testing.assert_allclose(np.asarray(f(q, scales, x)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_extraction_weight_quant_opt_in(rng):
    """make_raw_feature_fn(weight_quant='int8') runs and lands near the
    fp path (flax graph, CPU): median relative feature delta small, argmax
    stable on a downstream linear probe."""
    from surgical_tpu.core.config import BackboneConfig, HeadConfig
    from surgical_tpu.models.mit_evp import MiTEVP
    from surgical_tpu.train.extract import make_raw_feature_fn

    cfg = BackboneConfig(
        variant="tiny", embed_dims=(16, 32, 40, 64), num_heads=(1, 2, 4, 8),
        depths=(1, 1, 1, 1), sr_ratios=(8, 4, 2, 1), qkv_bias=True,
        drop_path_rate=0.0, img_size=64,
    )
    head = HeadConfig(embedding_dim=64, hidden=32)
    model = MiTEVP(cfg, head)
    z = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), z, z, jnp.zeros((1, 64, 64, 2)))

    B = 4
    img = rng.integers(0, 255, (B, 64, 64, 3)).astype(np.uint8)
    seg = rng.integers(0, 255, (B, 64, 64, 1)).astype(np.uint8)
    flw = rng.standard_normal((B, 64, 64, 2)).astype(np.float16)

    from surgical_tpu.parallel import mesh as meshlib

    m1 = meshlib.make_mesh(1)
    fp = make_raw_feature_fn(model, variables, mesh=m1, use_fused=False,
                             d2h_dtype=jnp.float32)
    q8 = make_raw_feature_fn(model, variables, mesh=m1, use_fused=False,
                             d2h_dtype=jnp.float32, weight_quant="int8")
    a = np.asarray(fp(img, seg, flw), np.float32)
    b = np.asarray(q8(img, seg, flw), np.float32)
    denom = np.maximum(np.abs(a), 1e-2)
    assert np.median(np.abs(a - b) / denom) < 0.2, \
        np.median(np.abs(a - b) / denom)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.95, corr
