"""Selective-scan (Mamba S6) recurrence — the flagship custom kernel.

Replaces the ``mamba_ssm`` CUDA selective-scan extension the reference's
``CausalMambaModel`` hard-depends on (mstcn.py:8-11,317-323; SURVEY §2.8).

Recurrence (per channel d, state n):
    h_t = exp(dt_t[d] * A[d,n]) * h_{t-1} + dt_t[d] * B_t[n] * x_t[d]
    y_t[d] = sum_n h_t[d,n] * C_t[n] + D[d] * x_t[d]

Three implementations:
- ``selective_scan_ref``: naive lax.scan over time (oracle; O(T) sequential).
- ``selective_scan_xla``: jax.lax.associative_scan over the affine maps
  (h -> a*h + b composes associatively) — log2(T) parallel passes.
- ``selective_scan_pallas``: single-pass Pallas TPU kernel — a sequential
  grid over time-chunks carries the [D, N] state in VMEM scratch while each
  chunk's inner scan runs as an in-VMEM associative scan; one HBM read per
  element instead of log2(T).

All take time-major [T, D] inputs and per-step [T, N] B/C (batch handled by
vmap), fp32 state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _affine_combine(left, right):
    """Compose h -> a*h + b maps: right ∘ left."""
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, a2 * b1 + b2


def _make_terms(x, dt, A, B):
    """a_t = exp(dt_t ⊗ A), b_t = (dt_t * x_t) ⊗ B_t; shapes [T, D, N]."""
    dtx = dt * x  # [T, D]
    a = jnp.exp(dt[:, :, None] * A[None, :, :])
    b = dtx[:, :, None] * B[:, None, :]
    return a, b


def selective_scan_ref(x, dt, A, B, C, D):
    """Sequential oracle. x, dt: [T, D]; A: [D, N]; B, C: [T, N]; D: [D]."""
    a, b = _make_terms(x, dt, A, B)

    def step(h, inputs):
        a_t, b_t, c_t = inputs
        h = a_t * h + b_t
        return h, h @ c_t  # [D, N] @ [N] -> [D]

    h0 = jnp.zeros(A.shape, dtype=jnp.float32)
    _, ys = jax.lax.scan(step, h0, (a, b, C))
    return ys + D[None, :] * x


def selective_scan_xla(x, dt, A, B, C, D):
    """Parallel associative scan (baseline for CPU / correctness)."""
    a, b = _make_terms(x, dt, A, B)
    _, h = jax.lax.associative_scan(_affine_combine, (a, b), axis=0)
    y = jnp.einsum("tdn,tn->td", h, C)
    return y + D[None, :] * x


# -- Pallas TPU kernel -------------------------------------------------------


def _scan_kernel(x_ref, dt_ref, a_log_ref, bmat_ref, c_ref, d_ref, y_ref, h_scratch):
    """One grid step = one time chunk. Carries h in VMEM scratch across the
    sequential grid (TPU grids execute in order on one core).

    Block shapes: x/dt [Tc, D]; a_log (A) [D, N]; bmat/c [Tc, N];
    d [1, D]; y [Tc, D]; h_scratch [D, N].
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scratch[:] = jnp.zeros_like(h_scratch)

    x = x_ref[:].astype(jnp.float32)  # [Tc, D]
    dt = dt_ref[:].astype(jnp.float32)
    A = a_log_ref[:].astype(jnp.float32)  # [D, N]
    B = bmat_ref[:].astype(jnp.float32)  # [Tc, N]
    C = c_ref[:].astype(jnp.float32)

    # state layout [Tc, N, D]: D (usually 128) in the lane dimension, and the
    # final contraction over N becomes a sublane reduction (Mosaic cannot
    # lower the lane-reduction form — "only constant accumulators supported")
    a = jnp.exp(dt[:, None, :] * A.T[None, :, :])  # [Tc, N, D]
    b = B[:, :, None] * (dt * x)[:, None, :]

    # in-chunk inclusive scan of the affine maps — manual Hillis-Steele
    # doubling (lax.associative_scan's recursive halving emits zero-size
    # slices that Mosaic cannot lower)
    Tc = a.shape[0]
    a_cum, b_cum = a, b
    shift = 1
    while shift < Tc:
        # element t combines with element t-shift (identity map for t<shift)
        a_prev = jnp.concatenate(
            [jnp.ones_like(a_cum[:shift]), a_cum[:-shift]], axis=0
        )
        b_prev = jnp.concatenate(
            [jnp.zeros_like(b_cum[:shift]), b_cum[:-shift]], axis=0
        )
        a_cum, b_cum = a_prev * a_cum, a_cum * b_prev + b_cum
        shift *= 2

    # fold in the carried state: h_t = a_cum_t * h_in + b_cum_t
    h_in = h_scratch[:][None, :, :]
    h = a_cum * h_in + b_cum  # [Tc, N, D]

    # static slice (negative indexing lowers to dynamic_slice, which Mosaic
    # does not implement)
    h_scratch[:] = jax.lax.slice_in_dim(h, Tc - 1, Tc, axis=0)[0]

    # y[t, d] = sum_n h[t, n, d] * C[t, n]: a sublane reduction
    y = jnp.sum(h * C[:, :, None], axis=1)  # [Tc, D]
    skip = d_ref[0, :][None, :] * x
    y_ref[:] = (y + skip).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def selective_scan_pallas(x, dt, A, B, C, D, chunk: int = 128, interpret: bool = False):
    """Single-pass chunked scan. T must be padded to a multiple of `chunk`
    (right-padding is exact for this causal op)."""
    T, d_inner = x.shape
    N = A.shape[1]
    if T % chunk != 0:
        pad = chunk - T % chunk
        x = jnp.pad(x, ((0, pad), (0, 0)))
        dt = jnp.pad(dt, ((0, pad), (0, 0)))
        B = jnp.pad(B, ((0, pad), (0, 0)))
        C = jnp.pad(C, ((0, pad), (0, 0)))
    Tp = x.shape[0]
    grid = (Tp // chunk,)

    out = pl.pallas_call(
        _scan_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, d_inner), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d_inner), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_inner, N), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, N), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, N), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, d_inner), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, d_inner), x.dtype),
        scratch_shapes=[pltpu.VMEM((N, d_inner), jnp.float32)],
        interpret=interpret,
    )(x, dt, A, B, C, D[None, :])
    return out[:T]


def selective_scan(x, dt, A, B, C, D, backend: str = "auto"):
    """Dispatch: Pallas on TPU, associative-scan XLA elsewhere."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        return selective_scan_pallas(x, dt, A, B, C, D)
    if backend == "xla":
        return selective_scan_xla(x, dt, A, B, C, D)
    return selective_scan_ref(x, dt, A, B, C, D)
