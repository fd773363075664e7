"""Feasibility probe for in-kernel SR conv via row-sliced + column-shifted
taps (the 'no-sr²-waste' formulation for a fully-fused MiT block):

  For each row-tap di (sr of them): select rows r ≡ di (mod sr) by a
  STRIDED SLICE ON THE UNTILED LEADING DIM of [H, W, C] (whole-tile row
  gather — cheap if Mosaic lowers it); then for each column-tap dj,
  static-shift by dj and matmul against W[di,dj] over the REDUCED rows
  (sr× FLOP waste instead of the tap-shift's sr²×); finally select output
  columns c ≡ 0 with one indicator matmul.

Checks numerics vs the XLA conv path and times it at s1/s2/s3 shapes.
Run on TPU: python scripts/probe_sr_extract.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128
ROUNDS = 4
LO, HI = 8, 24


from scripts._timing import chain_time as _chain_time
from surgical_tpu.kernels.mit_block import _shift_rows as shift_rows


def chain_time(fn, args):
    return _chain_time(fn, args, LO, HI, ROUNDS)


def make_sel(bt, H, W, sr):
    """Indicator [bt*Nkv, bt*H'*W] selecting columns c ≡ 0 (mod sr)."""
    Hp, Wp = H // sr, W // sr
    rows = bt * Hp * Wp
    cols = bt * Hp * W
    sel = np.zeros((rows, cols), np.float32)
    for b in range(bt):
        for i in range(Hp):
            for j in range(Wp):
                sel[b * Hp * Wp + i * Wp + j, b * Hp * W + i * W + j * sr] = 1.0
    return sel


def sr_kernel(x_ref, w_ref, sel_ref, y_ref, *, H, W, sr, bt, C):
    """x [1, bt*N, C] -> y [1, bt*Nkv, C] = stride-sr sr×sr VALID conv."""
    x = x_ref[0]
    Hp = H // sr
    acc = None
    for di in range(sr):
        # rows r ≡ di: [bt*H, W, C] -> strided slice on the leading dim
        xg = x.reshape(bt * H, W, C)
        # rows r ≡ di (mod sr): Mosaic supports neither >2-D gather nor
        # stride>1 slices — bt*Hp static unit-stride plane slices + concat
        sel_rows = jnp.concatenate(
            [xg[u * sr + di : u * sr + di + 1] for u in range(bt * Hp)], 0)
        flat = sel_rows.reshape(bt * Hp * W, C)
        for dj in range(sr):
            shifted = shift_rows(flat, dj)
            contrib = jnp.dot(
                shifted, w_ref[0][(di * sr + dj) * C : (di * sr + dj + 1) * C, :],
                preferred_element_type=jnp.float32,
            )
            acc = contrib if acc is None else acc + contrib
    y_ref[0] = jnp.dot(
        sel_ref[0], acc.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(y_ref.dtype)


def run_stage(si, N, C, H, sr, bt, interpret=False):
    W = H
    Nkv = (H // sr) ** 2
    G = B // bt
    rng = np.random.default_rng(si)
    x = jnp.asarray((rng.standard_normal((G, bt * N, C)) * 0.3), jnp.float32).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((sr * sr * C, C)) * (1.0 / np.sqrt(sr * sr * C)), jnp.float32).astype(jnp.bfloat16)
    sel = jnp.asarray(make_sel(bt, H, W, sr)).astype(jnp.bfloat16)

    f = pl.pallas_call(
        functools.partial(sr_kernel, H=H, W=W, sr=sr, bt=bt, C=C),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, bt * N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sr * sr * C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt * Nkv, bt * (H // sr) * W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt * Nkv, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, bt * Nkv, C), jnp.bfloat16),
        interpret=interpret,
    )

    # XLA reference: conv_general_dilated stride sr VALID
    wk = w.reshape(sr, sr, C, C)

    def xla_ref(x):
        xi = x.reshape(G * bt, H, W, C)
        y = jax.lax.conv_general_dilated(
            xi, wk, (sr, sr), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y.reshape(G, bt * Nkv, C).astype(jnp.bfloat16)

    got = np.asarray(f(x, w[None], sel[None]), np.float32)
    want = np.asarray(xla_ref(x), np.float32)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-6)
    print(f"s{si+1} rel err: {err:.2e}", flush=True)

    def dep(fn):
        # carry stays x-shaped; the tiny scalar add keeps a runtime data
        # dependency so the scan cannot hoist or reorder the call
        def g(x):
            y = fn(x)
            return x + (jnp.sum(y.astype(jnp.float32)) * 1e-20).astype(x.dtype)
        return g

    t_k = chain_time(dep(lambda x: f(x, w[None], sel[None])), x)
    t_x = chain_time(dep(xla_ref), x)
    print(f"s{si+1} [{bt}*{N},{C}] sr={sr}: kernel {t_k*1e3:.3f} ms  "
          f"xla-conv {t_x*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    interp = os.environ.get("SR_INTERPRET", "") == "1"
    run_stage(0, 3136, 64, 56, 8, 1, interpret=interp)
    run_stage(1, 784, 128, 28, 4, 2, interpret=interp)
    run_stage(2, 196, 320, 14, 2, 4, interpret=interp)
