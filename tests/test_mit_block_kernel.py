"""Fused MiT-block Pallas kernel vs the flax reference block (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surgical_tpu.kernels.mit_block import block_weights_from_params, fused_mit_block
from surgical_tpu.models.mit_evp import MiTBlock


def reference_and_kernel(rng, B=2, H=8, W=8, C=64, heads=1, sr=4, mlp_ratio=4):
    N = H * W
    block = MiTBlock(
        dim=C, num_heads=heads, mlp_ratio=mlp_ratio, sr_ratio=sr,
        qkv_bias=True, drop=0.0, attn_drop=0.0, drop_path=0.0,
    )
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    variables = block.init(jax.random.key(0), x, H, W)
    ref = np.asarray(block.apply(variables, x, H, W))

    p = variables["params"]
    # reproduce the XLA-side pieces the kernel takes as inputs
    ln1 = p["norm1"]
    x32 = np.asarray(x, np.float64)
    m = x32.mean(-1, keepdims=True)
    v = ((x32 - m) ** 2).mean(-1, keepdims=True)
    xln = ((x32 - m) / np.sqrt(v + 1e-6)) * np.asarray(ln1["scale"]) + np.asarray(ln1["bias"])
    xln = jnp.asarray(xln.astype(np.float32))

    attn = p["attn"]
    if sr > 1:
        grid = np.asarray(xln).reshape(B, H, W, C)
        kern = np.asarray(attn["sr"]["kernel"])  # [sr, sr, C, C]
        Hk, Wk = H // sr, W // sr
        red = np.zeros((B, Hk, Wk, C), np.float64)
        for i in range(sr):
            for j in range(sr):
                red += np.einsum("bhwc,cd->bhwd", grid[:, i::sr, j::sr, :], kern[i, j])
        red += np.asarray(attn["sr"]["bias"])
        red = red.reshape(B, -1, C)
        nm = attn["norm"]
        mm = red.mean(-1, keepdims=True)
        vv = ((red - mm) ** 2).mean(-1, keepdims=True)
        kv_in = (red - mm) / np.sqrt(vv + 1e-6) * np.asarray(nm["scale"]) + np.asarray(nm["bias"])
    else:
        kv_in = np.asarray(xln, np.float64)
    wkv = np.asarray(attn["kv"]["kernel"])
    bkv = np.asarray(attn["kv"]["bias"])
    kv = kv_in @ wkv + bkv
    k, v_ = kv[..., :C], kv[..., C:]

    weights = block_weights_from_params(p)
    out = fused_mit_block(
        x, xln, jnp.asarray(k.astype(np.float32)), jnp.asarray(v_.astype(np.float32)),
        {kk: jnp.asarray(np.asarray(vv_, np.float32)) for kk, vv_ in weights.items()},
        heads=heads, H=H, W=W, bt=1, interpret=True,
    )
    return ref, np.asarray(out)


@pytest.mark.parametrize("heads,sr", [(1, 4), (2, 2), (4, 1)])
def test_fused_block_matches_reference(rng, heads, sr):
    ref, out = reference_and_kernel(rng, heads=heads, sr=sr)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    # tighter check on the bulk of values
    assert np.median(np.abs(out - ref)) < 1e-3


def test_flattened_bt_matches_bt1(rng):
    """bt>1 (flattened batch tile) must bit-match bt=1 per-image runs."""
    B, H, W, C, heads, sr = 4, 8, 8, 64, 1, 4
    N, Nkv = H * W, (H // sr) * (W // sr)
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    xln = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Nkv, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Nkv, C)).astype(np.float32))
    hidden = C * 4
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    weights = {
        "wq": r(C, C), "bq": r(C), "wo": r(C, C), "bo": r(C),
        "ln2_scale": jnp.ones(C), "ln2_bias": jnp.zeros(C),
        "w1": r(C, hidden), "b1": r(hidden),
        "wdw": r(9, hidden), "bdw": r(hidden),
        "w2": r(hidden, C), "b2": r(C),
    }
    out1 = fused_mit_block(x, xln, k, v, weights, heads=heads, H=H, W=W,
                           bt=1, interpret=True)
    out2 = fused_mit_block(x, xln, k, v, weights, heads=heads, H=H, W=W,
                           bt=2, interpret=True)
    out4 = fused_mit_block(x, xln, k, v, weights, heads=heads, H=H, W=W,
                           bt=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(out1), rtol=1e-5, atol=1e-5)


def test_lane_packed2_matches_unpacked(rng):
    """2-image lane-packed C=64 kernel == the per-image kernel."""
    from surgical_tpu.kernels.mit_block import fused_mit_block_packed2, pack_weights2

    B, H, W, C, sr = 4, 8, 8, 64, 4
    N, Nkv = H * W, (H // sr) * (W // sr)
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Nkv, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Nkv, C)).astype(np.float32))
    hidden = C * 4
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    weights = {
        "ln1_scale": 1.0 + 0.1 * r(C), "ln1_bias": r(C),
        "wq": r(C, C), "bq": r(C), "wo": r(C, C), "bo": r(C),
        "ln2_scale": 1.0 + 0.1 * r(C), "ln2_bias": r(C),
        "w1": r(C, hidden), "b1": r(hidden),
        "wdw": r(9, hidden), "bdw": r(hidden),
        "w2": r(hidden, C), "b2": r(C),
    }
    # packed2 always computes LN1 in-kernel; feed the reference kernel the
    # same LN1(x)
    want = fused_mit_block(x, None, k, v, weights, heads=1, H=H, W=W,
                           bt=1, interpret=True)
    got = fused_mit_block_packed2(x, k, v, pack_weights2(weights),
                                  H=H, W=W, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # spatial row-chunking (round 5): halo'd band tiles must be EXACT vs the
    # unchunked kernel, including the image top/bottom rows where the halo
    # blocks hold clamped garbage that the global-row dwconv mask discards
    for rc in (2, 4):
        tiled = fused_mit_block_packed2(x, k, v, pack_weights2(weights),
                                        H=H, W=W, row_chunks=rc,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(got),
                                   rtol=1e-5, atol=1e-5)


# -- training kernel: custom VJP ------------------------------------------------


def _train_oracle(w, m1, m2, heads, H, W):
    """Pure-jnp oracle of the fused train block (tanh GELU, f32)."""
    C = w["wq"].shape[0]
    hd = C // heads
    scale = hd ** -0.5

    def dwconv(h, B, N):
        Ch = h.shape[-1]
        g = h.reshape(B, H, W, Ch)
        ker = w["wdw"].reshape(3, 3, 1, Ch)
        out = jax.lax.conv_general_dilated(
            g, ker, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=Ch,
        )
        return (out + w["bdw"]).reshape(B, N, Ch)

    def fwd(x, xln, k, v):
        B, N, _ = x.shape
        Nkv = k.shape[1]
        q = (xln @ w["wq"] + w["bq"]).reshape(B, N, heads, hd)
        kk = k.reshape(B, Nkv, heads, hd)
        vv = v.reshape(B, Nkv, heads, hd)
        s = jnp.einsum("bnhd,bmhd->bhnm", q, kk) * scale
        p = jax.nn.softmax(s, -1)
        ctx = jnp.einsum("bhnm,bmhd->bnhd", p, vv).reshape(B, N, C)
        x1 = x + m1[:, None, None] * (ctx @ w["wo"] + w["bo"])
        mu = x1.mean(-1, keepdims=True)
        var = ((x1 - mu) ** 2).mean(-1, keepdims=True)
        h2 = (x1 - mu) * jax.lax.rsqrt(var + 1e-6) * w["ln2_scale"] + w["ln2_bias"]
        a1 = h2 @ w["w1"] + w["b1"]
        g = jax.nn.gelu(dwconv(a1, B, N), approximate=True)
        return x1 + m2[:, None, None] * (g @ w["w2"] + w["b2"])

    return fwd


@pytest.mark.parametrize("heads,bt", [(1, 1), (2, 2)])
def test_fused_block_train_vjp_matches_autodiff(rng, heads, bt):
    """Forward AND all four input gradients of the train kernel == autodiff
    of a jnp oracle, including zeroed DropPath branches."""
    from surgical_tpu.kernels.mit_block import fused_mit_block_train

    B, H, W, C, sr = 4, 8, 8, 64, 4
    N, Nkv = H * W, (H // sr) * (W // sr)
    hidden = 4 * C
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    w = {
        "wq": r(C, C), "bq": r(C), "wo": r(C, C), "bo": r(C),
        "ln2_scale": 1.0 + 0.1 * r(C), "ln2_bias": r(C),
        "w1": r(C, hidden), "b1": r(hidden),
        "wdw": r(9, hidden), "bdw": r(hidden),
        "w2": r(hidden, C), "b2": r(C),
    }
    x, xln = r(B, N, C) * 10, r(B, N, C) * 10
    k, v = r(B, Nkv, C) * 10, r(B, Nkv, C) * 10
    # one sample with a dropped attention branch, one with a dropped MLP branch
    m1 = jnp.asarray([1.25, 0.0, 1.25, 1.25], jnp.float32)
    m2 = jnp.asarray([1.25, 1.25, 0.0, 1.25], jnp.float32)

    oracle = _train_oracle(w, m1, m2, heads, H, W)
    fused = lambda x, xln, k, v: fused_mit_block_train(
        x, xln, k, v, w, m1, m2, heads=heads, H=H, W=W, bt=bt, interpret=True)

    np.testing.assert_allclose(
        np.asarray(fused(x, xln, k, v)), np.asarray(oracle(x, xln, k, v)),
        rtol=1e-4, atol=1e-4)

    co = r(B, N, C)
    g_ref = jax.grad(lambda *a: jnp.sum(oracle(*a) * co), argnums=(0, 1, 2, 3))(
        x, xln, k, v)
    g_fus = jax.grad(lambda *a: jnp.sum(fused(*a) * co), argnums=(0, 1, 2, 3))(
        x, xln, k, v)
    for name, a, b in zip(("dx", "dxln", "dk", "dv"), g_ref, g_fus):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale,
            rtol=1e-4, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("heads,bt", [(2, 1), (5, 2)])
def test_head_batched_matches_loop(rng, heads, bt):
    """fused_mit_block_hb (one dot over head-block-diagonal k/v + segment
    softmax) == the per-head-loop kernel."""
    from surgical_tpu.kernels.mit_block import fused_mit_block, fused_mit_block_hb

    B, H, W, sr = 4, 8, 8, 4
    C = heads * 64
    N, Nkv = H * W, (H // sr) * (W // sr)
    hidden = 2 * C
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    w = {
        "wq": r(C, C), "bq": r(C), "wo": r(C, C), "bo": r(C),
        "ln2_scale": 1.0 + 0.1 * r(C), "ln2_bias": r(C),
        "w1": r(C, hidden), "b1": r(hidden),
        "wdw": r(9, hidden), "bdw": r(hidden),
        "w2": r(hidden, C), "b2": r(C),
    }
    x, xln = r(B, N, C) * 5, r(B, N, C) * 5
    k, v = r(B, Nkv, C) * 5, r(B, Nkv, C) * 5
    want = fused_mit_block(x, xln, k, v, w, heads=heads, H=H, W=W, bt=bt,
                           interpret=True)
    got = fused_mit_block_hb(x, xln, k, v, w, heads=heads, H=H, W=W, bt=bt,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ln1_in_kernel_matches_precomputed(rng):
    """xln=None (in-kernel LN1 from weights['ln1_scale'/'ln1_bias']) == the
    precomputed-xln path, for both the loop and head-batched kernels."""
    from surgical_tpu.kernels.mit_block import fused_mit_block, fused_mit_block_hb

    B, H, W, heads, sr = 4, 8, 8, 2, 4
    C = heads * 64
    N, Nkv = H * W, (H // sr) * (W // sr)
    hidden = 2 * C
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    w = {
        "ln1_scale": 1.0 + 0.1 * r(C), "ln1_bias": r(C),
        "wq": r(C, C), "bq": r(C), "wo": r(C, C), "bo": r(C),
        "ln2_scale": 1.0 + 0.1 * r(C), "ln2_bias": r(C),
        "w1": r(C, hidden), "b1": r(hidden),
        "wdw": r(9, hidden), "bdw": r(hidden),
        "w2": r(hidden, C), "b2": r(C),
    }
    x = r(B, N, C) * 5
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    xln = ((x32 - mu) * jax.lax.rsqrt(var + 1e-6) * w["ln1_scale"]
           + w["ln1_bias"]).astype(x.dtype)
    k, v = r(B, Nkv, C) * 5, r(B, Nkv, C) * 5

    for fn in (fused_mit_block, fused_mit_block_hb):
        want = fn(x, xln, k, v, w, heads=heads, H=H, W=W, bt=2, interpret=True)
        got = fn(x, None, k, v, w, heads=heads, H=H, W=W, bt=2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5, err_msg=fn.__name__)


def test_pnext_and_ln_next_fold(rng):
    """The round-4 folded tail — the next block's prompt (C4 feat through
    the shared_mlp) added into the residual write and LN(y) emitted under
    ln_next — equals the unfused composition (kernel, then XLA-style
    dense + add + LayerNorm), for both kernel variants."""
    from surgical_tpu.kernels.mit_block import fused_mit_block, fused_mit_block_hb

    B, H, W, heads, sr = 4, 8, 8, 2, 4
    C = heads * 64
    C4 = C // 4
    N, Nkv = H * W, (H // sr) * (W // sr)
    hidden = 2 * C
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    w = {
        "ln1_scale": 1.0 + 0.1 * r(C), "ln1_bias": r(C),
        "wq": r(C, C), "bq": r(C), "wo": r(C, C), "bo": r(C),
        "ln2_scale": 1.0 + 0.1 * r(C), "ln2_bias": r(C),
        "w1": r(C, hidden), "b1": r(hidden),
        "wdw": r(9, hidden), "bdw": r(hidden),
        "w2": r(hidden, C), "b2": r(C),
    }
    x = r(B, N, C) * 5
    k, v = r(B, Nkv, C) * 5, r(B, Nkv, C) * 5
    pfeat = r(B, N, C4)
    shared = {"kernel": r(C4, C), "bias": r(C)}
    ln_next = {"scale": 1.0 + 0.1 * r(C), "bias": r(C)}

    def ln(y):
        y32 = y.astype(jnp.float32)
        mu = y32.mean(-1, keepdims=True)
        var = ((y32 - mu) ** 2).mean(-1, keepdims=True)
        return ((y32 - mu) * jax.lax.rsqrt(var + 1e-6) * ln_next["scale"]
                + ln_next["bias"]).astype(y.dtype)

    prompt = (jnp.dot(pfeat, shared["kernel"],
                      preferred_element_type=jnp.float32)
              + shared["bias"]).astype(x.dtype)

    for fn in (fused_mit_block, fused_mit_block_hb):
        base = fn(x, None, k, v, w, heads=heads, H=H, W=W, bt=2, interpret=True)
        want_y = base + prompt
        want_ln = ln(want_y)
        got_y, got_ln = fn(x, None, k, v, w, heads=heads, H=H, W=W, bt=2,
                           pnext_feat=pfeat, prompt_shared=shared,
                           ln_next=ln_next, interpret=True)
        np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                                   rtol=1e-5, atol=1e-5, err_msg=fn.__name__)
        np.testing.assert_allclose(np.asarray(got_ln), np.asarray(want_ln),
                                   rtol=1e-5, atol=1e-5, err_msg=fn.__name__)
        # ln_next without the prompt fold: y unchanged from the base call
        got_y2, got_ln2 = fn(x, None, k, v, w, heads=heads, H=H, W=W, bt=2,
                             ln_next=ln_next, interpret=True)
        np.testing.assert_allclose(np.asarray(got_y2), np.asarray(base),
                                   rtol=1e-6, atol=1e-6, err_msg=fn.__name__)
