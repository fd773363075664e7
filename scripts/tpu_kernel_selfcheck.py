"""Kernel numerics ON THE REAL TPU (Mosaic lowering, not interpret mode).

The pytest suite checks every Pallas kernel against oracles in interpret
mode on CPU; this script re-checks the serving/train kernels as actually
lowered by Mosaic on the chip, in f32 (tight tolerance) and bf16 (loose),
against the XLA reference computation. Catches interpret-vs-Mosaic
divergences (e.g. transcendental approximations, accumulation orders).

Usage: python scripts/tpu_kernel_selfcheck.py      # prints one OK/FAIL line each
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from surgical_tpu.kernels.mit_block import (
    fused_mit_block,
    fused_mit_block_hb,
    fused_mit_block_train,
    fused_mit_stage,
)


def _oracle(x, xln, k, v, w, heads, H, W):
    """XLA reference of the fused block (tanh GELU to match the kernel).

    Runs under highest matmul precision — the axon build defaults matmuls
    to LOW precision even in f32, which would make the ORACLE the noisy
    side. The precision override is scoped here because setting it
    globally leaks into the Pallas kernels' in-kernel dots, where Mosaic
    rejects an fp32-precision contraction of bf16 vectors ("Bad lhs
    type"); in-kernel dots intentionally run the MXU default with explicit
    f32 accumulation (preferred_element_type).
    """
    with jax.default_matmul_precision("highest"):
        return _oracle_body(x, xln, k, v, w, heads, H, W)


def _oracle_body(x, xln, k, v, w, heads, H, W):
    B, N, C = x.shape
    hd = C // heads
    q = (xln @ w["wq"] + w["bq"]).reshape(B, N, heads, hd)
    kk = k.reshape(B, -1, heads, hd)
    vv = v.reshape(B, -1, heads, hd)
    s = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32),
                   kk.astype(jnp.float32)) / np.sqrt(hd)
    p = jax.nn.softmax(s, -1).astype(x.dtype)
    ctx = jnp.einsum("bhnm,bmhd->bnhd", p, vv).reshape(B, N, C)
    x1 = x + ctx @ w["wo"] + w["bo"]
    x32 = x1.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    h = ((x32 - mu) * jax.lax.rsqrt(var + 1e-6) * w["ln2_scale"]
         + w["ln2_bias"]).astype(x.dtype)
    a = (h @ w["w1"] + w["b1"]).reshape(B, H, W, -1)
    ker = w["wdw"].reshape(3, 3, 1, a.shape[-1]).astype(a.dtype)
    g = jax.lax.conv_general_dilated(
        a, ker, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=a.shape[-1],
    ).reshape(B, N, -1) + w["bdw"]
    g = jax.nn.gelu(g.astype(jnp.float32), approximate=True).astype(x.dtype)
    return x1 + g @ w["w2"] + w["b2"]


def check(name, got, want, rtol, atol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    scale = np.abs(want).max() + 1e-9
    err = np.abs(got - want).max() / scale
    ok = np.allclose(got / scale, want / scale, rtol=rtol, atol=atol)
    print(f"{'OK  ' if ok else 'FAIL'} {name}: max rel err {err:.2e}"
          f" (tol rtol={rtol}, atol={atol})", flush=True)
    return ok


def main():
    rng = np.random.default_rng(0)
    all_ok = True
    # f32 rows: in-kernel dots run the MXU's default (3-pass bf16) passes
    # with f32 accumulation — ~1e-3 relative vs a highest-precision oracle
    for dtype, rtol, atol in ((jnp.float32, 5e-3, 5e-4),
                              (jnp.bfloat16, 4e-2, 1e-2)):
        for heads, sr in ((1, 4), (2, 4), (5, 2)):
            B, H, W = 4, 8, 8
            C = heads * 64
            N, Nkv = H * W, (H // sr) * (W // sr)
            hidden = 4 * C
            r = lambda *s: jnp.asarray(
                rng.standard_normal(s).astype(np.float32) * 0.1, dtype)
            w = {
                "ln1_scale": 1.0 + 0.1 * r(C), "ln1_bias": r(C),
                "wq": r(C, C), "bq": r(C), "wo": r(C, C), "bo": r(C),
                "ln2_scale": 1.0 + 0.1 * r(C), "ln2_bias": r(C),
                "w1": r(C, hidden), "b1": r(hidden),
                "wdw": r(9, hidden), "bdw": r(hidden),
                "w2": r(hidden, C), "b2": r(C),
            }
            x, xln = r(B, N, C) * 5, r(B, N, C) * 5
            k, v = r(B, Nkv, C) * 5, r(B, Nkv, C) * 5
            want = _oracle(x, xln, k, v, w, heads, H, W)
            tag = f"heads={heads} {np.dtype(np.float32).name if dtype == jnp.float32 else 'bf16'}"

            got = fused_mit_block(x, xln, k, v, w, heads=heads, H=H, W=W, bt=2)
            all_ok &= check(f"loop   {tag}", got, want, rtol, atol)
            if heads > 1:
                got = fused_mit_block_hb(x, xln, k, v, w, heads=heads,
                                         H=H, W=W, bt=2)
                all_ok &= check(f"hb     {tag}", got, want, rtol, atol)
            m = jnp.ones((B,), jnp.float32)
            got = fused_mit_block_train(x, xln, k, v, w, m, m,
                                        heads=heads, H=H, W=W, bt=2)
            all_ok &= check(f"train  {tag}", got, want, rtol, atol)

    # train backward vs XLA autodiff, f32, heads=2
    heads, sr = 2, 4
    B, H, W = 4, 8, 8
    C = heads * 64
    N, Nkv = H * W, (H // sr) * (W // sr)
    hidden = 4 * C
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    w = {
        "ln1_scale": 1.0 + 0.1 * r(C), "ln1_bias": r(C),
        "wq": r(C, C), "bq": r(C), "wo": r(C, C), "bo": r(C),
        "ln2_scale": 1.0 + 0.1 * r(C), "ln2_bias": r(C),
        "w1": r(C, hidden), "b1": r(hidden),
        "wdw": r(9, hidden), "bdw": r(hidden),
        "w2": r(hidden, C), "b2": r(C),
    }
    x, xln = r(B, N, C) * 5, r(B, N, C) * 5
    k, v = r(B, Nkv, C) * 5, r(B, Nkv, C) * 5
    m = jnp.ones((B,), jnp.float32)
    co = r(B, N, C)
    g_ref = jax.grad(
        lambda *a: jnp.sum(_oracle(*a, w, heads, H, W) * co), argnums=(0, 1, 2, 3)
    )(x, xln, k, v)
    g_fus = jax.grad(
        lambda *a: jnp.sum(fused_mit_block_train(
            *a, w, m, m, heads=heads, H=H, W=W, bt=2) * co),
        argnums=(0, 1, 2, 3),
    )(x, xln, k, v)
    for nm, a, b in zip(("dx", "dxln", "dk", "dv"), g_ref, g_fus):
        all_ok &= check(f"bwd {nm} f32", b, a, 5e-3, 5e-4)

    # whole-stage kernel: Mosaic lowering vs the interpret-mode baseline
    # (interpret is the side the CPU suite verified against a straight-line
    # f64 reference, test_mit_stage_kernel.py) — isolates lowering exactly
    for dtype, rtol, atol in ((jnp.float32, 5e-3, 5e-4),
                              (jnp.bfloat16, 4e-2, 1e-2)):
        heads, sr, depth = 2, 2, 2
        B, H, W = 4, 8, 8
        C = heads * 64
        hidden = 4 * C
        Cb, C4 = 32, C // 4
        N = H * W
        r = lambda *s: jnp.asarray(
            rng.standard_normal(s).astype(np.float32) * 0.1, dtype)
        ln = lambda: jnp.stack([jnp.stack([1.0 + 0.1 * r(C), r(C)])
                                for _ in range(depth)])
        st = lambda *shape: jnp.stack([r(*shape) for _ in range(depth)])
        row = lambda n: jnp.stack([r(1, n) for _ in range(depth)])
        sw = {
            "ln1": ln(), "ln2": ln(),
            "wq": st(C, C), "bq": row(C), "wo": st(C, C), "bo": row(C),
            "w1": st(C, hidden), "b1": row(hidden),
            "wdw": st(9, hidden), "bdw": row(hidden),
            "w2": st(hidden, C), "b2": row(C),
            "wkv": st(C, 2 * C), "bkv": row(2 * C),
            "srw": st(sr * sr * C, C), "srb": row(C), "lnkv": ln(),
            "lww": st(Cb, C4), "lwb": row(C4),
            "sharedw": r(C4, C), "sharedb": r(1, C),
        }
        x = r(B, N, C) * 5
        base = r(B, N, Cb) * 3
        kw = dict(heads=heads, H=H, W=W, sr=sr, bt=2, phases=2)
        want = fused_mit_stage(x, base, sw, interpret=True, **kw)
        got = fused_mit_stage(x, base, sw, **kw)
        tag = "f32" if dtype == jnp.float32 else "bf16"
        all_ok &= check(f"stage  {tag}", got, want, rtol, atol)

    print("ALL OK" if all_ok else "FAILURES PRESENT", flush=True)
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
