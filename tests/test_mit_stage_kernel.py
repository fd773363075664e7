"""Whole-stage fused Pallas kernel (fused_mit_stage) vs a straight-line
reference of the same stage: per-depth prompt adds + per-block (LN1 ->
SR-conv/LN/kv -> attention -> LN2 -> MixFFN), in interpret mode on CPU.

The reference composition mirrors models/mit_fused.py's per-block stage loop
(with tanh-GELU everywhere, the kernel's nonlinearity) so the comparison
isolates the kernel's resident-activation / streamed-weight mechanics:
f32 in interpret mode should agree tightly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surgical_tpu.kernels.mit_block import (
    fused_mit_stage,
    stage_weights_from_params,
)
from surgical_tpu.models.mit_evp import MiTBlock

B, H, W, C, HEADS, SR, DEPTH, C4 = 4, 8, 8, 16, 2, 2, 2, 4
CB = 8  # prompt-base width (C // scale_factor in the real model)
N = H * W
STAGE = 3  # arbitrary stage number for param naming


def _ln(x, p, eps=1e-6):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / np.sqrt(v + eps) * np.asarray(p["scale"]) + np.asarray(p["bias"])


def _reference_stage(params, x, base):
    """fused_forward's stage loop in numpy f64 (tanh GELU)."""
    import scipy.special  # noqa: F401  (not needed; tanh gelu is explicit)

    def gelu_tanh(v):
        c = np.sqrt(2.0 / np.pi)
        return 0.5 * v * (1.0 + np.tanh(c * (v + 0.044715 * v ** 3)))

    pg = params["prompt_generator"]
    x = np.asarray(x, np.float64)
    base = np.asarray(base, np.float64)
    for d in range(DEPTH):
        lw = pg[f"lightweight_mlp{STAGE}_{d}"]
        sh = pg[f"shared_mlp{STAGE}"]
        feat = gelu_tanh(base @ np.asarray(lw["kernel"]) + np.asarray(lw["bias"]))
        x = x + (feat @ np.asarray(sh["kernel"]) + np.asarray(sh["bias"]))

        p = params[f"block{STAGE}_{d}"]
        xln = _ln(x, p["norm1"])
        attn = p["attn"]
        # SR conv (stride SR, VALID) + LN
        grid = xln.reshape(B, H, W, C)
        kern = np.asarray(attn["sr"]["kernel"])
        Hk, Wk = H // SR, W // SR
        red = np.zeros((B, Hk, Wk, C), np.float64)
        for i in range(SR):
            for j in range(SR):
                red += np.einsum("bhwc,cd->bhwd", grid[:, i::SR, j::SR, :], kern[i, j])
        red = red.reshape(B, -1, C) + np.asarray(attn["sr"]["bias"])
        kv_in = _ln(red, attn["norm"])
        kv = kv_in @ np.asarray(attn["kv"]["kernel"]) + np.asarray(attn["kv"]["bias"])
        k, v = kv[..., :C], kv[..., C:]
        q = xln @ np.asarray(attn["q"]["kernel"]) + np.asarray(attn["q"]["bias"])
        hd = C // HEADS
        ctx = np.zeros_like(q)
        for h in range(HEADS):
            sl = slice(h * hd, (h + 1) * hd)
            s = q[..., sl] @ k[..., sl].transpose(0, 2, 1) / np.sqrt(hd)
            e = np.exp(s - s.max(-1, keepdims=True))
            ctx[..., sl] = (e / e.sum(-1, keepdims=True)) @ v[..., sl]
        x = x + ctx @ np.asarray(attn["proj"]["kernel"]) + np.asarray(attn["proj"]["bias"])

        mlp = p["mlp"]
        h2 = _ln(x, p["norm2"])
        h2 = h2 @ np.asarray(mlp["fc1"]["kernel"]) + np.asarray(mlp["fc1"]["bias"])
        dw = np.asarray(mlp["dwconv"]["dwconv"]["kernel"])[:, :, 0, :]  # [3,3,hid]
        hb = np.asarray(mlp["dwconv"]["dwconv"]["bias"])
        g = h2.reshape(B, H, W, -1)
        conv = np.zeros_like(g)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                src = np.zeros_like(g)
                ys = slice(max(0, -dy), H - max(0, dy))
                xs = slice(max(0, -dx), W - max(0, dx))
                yd = slice(max(0, dy), H - max(0, -dy))
                xd = slice(max(0, dx), W - max(0, -dx))
                src[:, ys, xs] = g[:, yd, xd]
                conv += src * dw[dy + 1, dx + 1]
        h2 = (conv + hb).reshape(B, N, -1)
        h2 = gelu_tanh(h2)
        x = x + h2 @ np.asarray(mlp["fc2"]["kernel"]) + np.asarray(mlp["fc2"]["bias"])
    return x


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    block = MiTBlock(dim=C, num_heads=HEADS, mlp_ratio=4, sr_ratio=SR,
                     qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0)
    x0 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    params = {}
    for d in range(DEPTH):
        params[f"block{STAGE}_{d}"] = block.init(
            jax.random.key(d), x0, H, W)["params"]
    pg = {}
    for d in range(DEPTH):
        pg[f"lightweight_mlp{STAGE}_{d}"] = {
            "kernel": rng.standard_normal((CB, C4)).astype(np.float32) * 0.3,
            "bias": rng.standard_normal((C4,)).astype(np.float32) * 0.1,
        }
    pg[f"shared_mlp{STAGE}"] = {
        "kernel": rng.standard_normal((C4, C)).astype(np.float32) * 0.3,
        "bias": rng.standard_normal((C,)).astype(np.float32) * 0.1,
    }
    params["prompt_generator"] = pg
    base = jnp.asarray(rng.standard_normal((B, N, CB)).astype(np.float32) * 0.5)
    want = _reference_stage(params, x0, base)
    sw = stage_weights_from_params(params, STAGE, DEPTH, dtype=jnp.float32)
    return params, x0, base, want, sw


@pytest.mark.parametrize("phases", [1, 2])
@pytest.mark.parametrize("bt", [1, 2])
def test_stage_kernel_matches_reference(setup, phases, bt):
    _params, x0, base, want, sw = setup
    got = fused_mit_stage(
        x0, base, sw, heads=HEADS, H=H, W=W, sr=SR, bt=bt, phases=phases,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_stage_kernel_no_base(setup):
    params, x0, _base, _want, sw = setup
    # prompt-free stage (has_base=False): matches reference without the adds
    p2 = {k: v for k, v in params.items() if k != "prompt_generator"}
    pg_zero = {
        f"lightweight_mlp{STAGE}_{d}": {
            "kernel": np.zeros((CB, C4), np.float32),
            "bias": np.zeros((C4,), np.float32)}
        for d in range(DEPTH)
    }
    pg_zero[f"shared_mlp{STAGE}"] = {"kernel": np.zeros((C4, C), np.float32),
                                     "bias": np.zeros((C,), np.float32)}
    want = _reference_stage({**p2, "prompt_generator": pg_zero}, x0,
                            jnp.zeros((B, N, CB), jnp.float32))
    got = fused_mit_stage(
        x0, None, sw, heads=HEADS, H=H, W=W, sr=SR, bt=2, phases=1,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_stage_kernel_sr1(setup):
    """sr == 1 branch (stage-4 shape): kv from xln directly."""
    rng = np.random.default_rng(3)
    block = MiTBlock(dim=C, num_heads=HEADS, mlp_ratio=4, sr_ratio=1,
                     qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0)
    x0 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    params = {f"block{STAGE}_{d}": block.init(jax.random.key(10 + d), x0, H, W)["params"]
              for d in range(DEPTH)}
    sw = stage_weights_from_params(params, STAGE, DEPTH, dtype=jnp.float32)

    # reference: same composition with kv_in = xln
    x = np.asarray(x0, np.float64)
    for d in range(DEPTH):
        p = params[f"block{STAGE}_{d}"]
        xln = _ln(x, p["norm1"])
        attn = p["attn"]
        kv = xln @ np.asarray(attn["kv"]["kernel"]) + np.asarray(attn["kv"]["bias"])
        k, v = kv[..., :C], kv[..., C:]
        q = xln @ np.asarray(attn["q"]["kernel"]) + np.asarray(attn["q"]["bias"])
        hd = C // HEADS
        ctx = np.zeros_like(q)
        for h in range(HEADS):
            sl = slice(h * hd, (h + 1) * hd)
            s = q[..., sl] @ k[..., sl].transpose(0, 2, 1) / np.sqrt(hd)
            e = np.exp(s - s.max(-1, keepdims=True))
            ctx[..., sl] = (e / e.sum(-1, keepdims=True)) @ v[..., sl]
        x = x + ctx @ np.asarray(attn["proj"]["kernel"]) + np.asarray(attn["proj"]["bias"])
        mlp = p["mlp"]
        h2 = _ln(x, p["norm2"])
        h2 = h2 @ np.asarray(mlp["fc1"]["kernel"]) + np.asarray(mlp["fc1"]["bias"])
        dw = np.asarray(mlp["dwconv"]["dwconv"]["kernel"])[:, :, 0, :]
        hb = np.asarray(mlp["dwconv"]["dwconv"]["bias"])
        g = h2.reshape(B, H, W, -1)
        conv = np.zeros_like(g)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                src = np.zeros_like(g)
                ys = slice(max(0, -dy), H - max(0, dy))
                xs = slice(max(0, -dx), W - max(0, dx))
                yd = slice(max(0, dy), H - max(0, -dy))
                xd = slice(max(0, dx), W - max(0, -dx))
                src[:, ys, xs] = g[:, yd, xd]
                conv += src * dw[dy + 1, dx + 1]
        h2 = (conv + hb).reshape(B, N, -1)
        c = np.sqrt(2.0 / np.pi)
        h2 = 0.5 * h2 * (1.0 + np.tanh(c * (h2 + 0.044715 * h2 ** 3)))
        x = x + h2 @ np.asarray(mlp["fc2"]["kernel"]) + np.asarray(mlp["fc2"]["bias"])

    got = fused_mit_stage(
        x0, None, sw, heads=HEADS, H=H, W=W, sr=1, bt=2, phases=2,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-4)
