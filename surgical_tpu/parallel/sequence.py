"""Sequence parallelism for causal temporal models: shard TIME over the mesh.

The reference handles long videos (T up to ~6k frames) single-device by
compressing frames to a 2048-d LFB and using bounded-context temporal ops
(SURVEY §5 long-context row). The TPU-native extension here shards the time
axis across the mesh: each device holds T/n frames and fetches the frames
to its left via ``jax.lax.ppermute`` hops over ICI (multi-hop when the
needed context exceeds the local chunk).

Two exactness regimes:

- ``sp_mstcn_infer`` exchanges halos PER DILATED LAYER (the textbook
  halo-exchange convolution): each conv fetches its own 2*dilation left
  frames, so ppermute's zero fill at device 0 coincides with that layer's
  causal zero padding — the result is EXACTLY the single-device output.
  (Prepending zero INPUT frames instead is NOT exact: biases turn zero
  frames into nonzero activations in upper layers, unlike layer-internal
  padding.)
- ``sequence_parallel_infer`` is the generic input-halo helper for causal
  functions whose before-the-start semantics IS zero input frames
  (out[t] = f(in[t-H..t]) with zero extension).

Mamba (``sp_mamba_infer``) carries unbounded left context in its recurrent
state, so halos cannot make it exact; instead each device scans its chunk
from a ZERO state and the true incoming state is reconstructed by an
inter-device affine-map composition: the S6 recurrence h_t = a_t h_{t-1} +
b_t over a chunk composes to h_out = A_prod * h_in + h_fin with
A_prod = exp(sum_t dt_t * A) (the per-chunk transition is an elementwise
exponential of a SUM, because a_t = exp(dt_t A)), so one small all-gather
of (A_prod [D,N], h_fin [D,N]) + a length-n prefix composition gives every
device its exact h_in, and outputs are corrected by
y_t += <exp(cumsum(dt)_t * A) * h_in, C_t>.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from surgical_tpu.parallel.mesh import DATA_AXIS

try:  # jax>=0.4.35 moved shard_map out of experimental
    from jax import shard_map as _shard_map_mod  # type: ignore

    shard_map = _shard_map_mod  # noqa: N816
except ImportError:  # pragma: no cover
    # legacy API: experimental shard_map spells check_vma as check_rep
    from jax.experimental.shard_map import shard_map as _legacy_shard_map  # type: ignore

    def shard_map(*args, **kwargs):  # noqa: N816
        if "check_vma" in kwargs:
            kwargs["check_rep"] = kwargs.pop("check_vma")
        return _legacy_shard_map(*args, **kwargs)


def mstcn_left_context(stages: int, layers: int) -> int:
    """Exact causal receptive field of the stacked dilated TCN: each stage's
    L layers (k=3, dilation 2^l, left-pad 2*2^l) see 2*(2^L - 1) frames
    back; stages compose additively (stage s+1 reads stage s outputs)."""
    return stages * 2 * (2 ** layers - 1)


def _gather_left(x: jax.Array, n_frames: int, axis: str, n_devices: int):
    """The ``n_frames`` of left context for each device's chunk, fetched by
    right-shifting whole chunks over ICI; the left edge (device 0) receives
    ppermute's zero fill."""
    Tl = x.shape[0]
    hops = -(-n_frames // Tl)
    perm = [(i, i + 1) for i in range(n_devices - 1)]
    parts, carry = [], x
    for _ in range(hops):
        carry = jax.lax.ppermute(carry, axis, perm)
        parts.insert(0, carry)
    return jnp.concatenate(parts, axis=0)[-n_frames:]


def _sp_dilated_layer(p: dict, h: jax.Array, d: int, axis: str, n: int):
    """DilatedResidualLayer (models/mstcn.py:40-70) with its 2*d-frame left
    pad realized as a cross-device halo: zero fill at device 0 == the causal
    zero padding, so this is exact."""
    halo = _gather_left(h, 2 * d, axis, n)
    hp = jnp.concatenate([halo, h], axis=0)[None]  # [1, 2d + Tl, C]
    y = jax.lax.conv_general_dilated(
        hp, p["conv_dilated"]["kernel"], (1,), "VALID",
        rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"),
    )[0] + p["conv_dilated"]["bias"]
    y = jax.nn.relu(y)
    y = y @ p["conv_1x1"]["kernel"] + p["conv_1x1"]["bias"]
    return h + y


def sp_mstcn_infer(model, params, lfb: jax.Array, mesh: Mesh,
                   *, axis: str = DATA_AXIS) -> jax.Array:
    """Time-sharded MultiStageTCN inference: lfb [T, f_dim] -> [S, T, out].

    Pure-function re-expression of ``MultiStageTCN.__call__`` over the SAME
    param tree, with every dilated conv's left pad exchanged as a halo.
    Exact vs ``model.apply(params, lfb[None])[:, 0]`` (tested on the
    8-device CPU mesh, both halo < chunk and multi-hop halo > chunk).
    """
    cfg = model.cfg
    n = mesh.shape[axis]
    T = lfb.shape[0]
    assert T % n == 0, (T, n)
    assert cfg.causal, "sequence parallelism requires the causal variant"
    tree = params["params"] if "params" in params else params

    def shard_fn(x):  # x: [T/n, f_dim]
        outs = []
        inp = x
        for s in range(cfg.stages):
            sp = tree[f"stage_{s}"]
            h = inp @ sp["in_proj"]["kernel"] + sp["in_proj"]["bias"]
            for i in range(cfg.layers):
                h = _sp_dilated_layer(sp[f"layer_{i}"], h, 2 ** i, axis, n)
            out = h @ sp["out_proj"]["kernel"] + sp["out_proj"]["bias"]
            outs.append(out)
            inp = jax.nn.softmax(out, axis=-1)
        return jnp.stack(outs, axis=0)  # [S, T/n, out]

    fn = shard_map(
        shard_fn, mesh=mesh, in_specs=P(axis), out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(lfb)


def _sp_selective_scan(x, dt, A, B, C, D, axis: str, n: int):
    """Time-sharded selective scan, exact vs the single-device scan.

    x, dt: [Tl, D]; A: [D, N]; B, C: [Tl, N]; D: [D] — the per-device chunk
    of the kernels/selective_scan contract. Local scan from zero state +
    one all-gather of per-chunk (A_prod, h_fin) affine maps + closed-form
    correction (module docstring)."""
    from surgical_tpu.kernels.selective_scan import selective_scan

    y_loc = selective_scan(x, dt, A, B, C, D)  # zero initial state

    dt32 = dt.astype(jnp.float32)
    cs = jnp.cumsum(dt32, axis=0)              # [Tl, D] inclusive
    total = cs[-1]                             # [D]
    A32 = A.astype(jnp.float32)
    # per-chunk transition & final state from zero init:
    #   h_fin = sum_t exp((cs_T - cs_t) * A) * dt_t * B_t * x_t
    A_prod = jnp.exp(total[:, None] * A32)     # [D, N]
    b = (dt32 * x.astype(jnp.float32))[:, :, None] * B.astype(jnp.float32)[:, None, :]
    decay = jnp.exp((total[None, :] - cs)[:, :, None] * A32[None])  # [Tl, D, N]
    h_fin = jnp.sum(decay * b, axis=0)         # [D, N]

    # exclusive prefix composition over the device axis:
    # (A2, b2) o (A1, b1) = (A2*A1, A2*b1 + b2), scanned in device order
    gA = jax.lax.all_gather(A_prod, axis)      # [n, D, N]
    gb = jax.lax.all_gather(h_fin, axis)

    def compose(h, s):
        return gA[s] * h + gb[s], gA[s] * h + gb[s]

    _, prefixes = jax.lax.scan(compose, jnp.zeros_like(h_fin), jnp.arange(n))
    idx = jax.lax.axis_index(axis)
    # h_in(k) = composition of devices 0..k-1; device 0 gets zero state
    h_in = jnp.where(
        idx > 0,
        jnp.take(prefixes, jnp.maximum(idx - 1, 0), axis=0),
        jnp.zeros_like(h_fin),
    )

    # correction: true h_t = h_loc_t + exp(cs_t * A) * h_in
    carry = jnp.exp(cs[:, :, None] * A32[None]) * h_in[None]  # [Tl, D, N]
    y_corr = jnp.einsum("tdn,tn->td", carry, C.astype(jnp.float32))
    return y_loc + y_corr.astype(y_loc.dtype)


def sp_mamba_infer(model, params, x: jax.Array, mesh: Mesh,
                   *, axis: str = DATA_AXIS) -> jax.Array:
    """Time-sharded CausalMambaModel inference: x [T, f_dim] -> [T, out].

    Pure-function re-expression of ``models.mamba.CausalMambaModel`` over
    the SAME param tree: in_proj/LN/head and the per-block projections are
    local in time; the depthwise causal conv exchanges a (d_conv-1)-frame
    halo (zero fill at device 0 == its causal padding); the selective scan
    uses the inter-device state handoff (``_sp_selective_scan``). Exact vs
    ``model.apply(params, x[None])[0, 0]`` up to fp reassociation.
    """
    cfg = model.cfg
    n = mesh.shape[axis]
    T = x.shape[0]
    assert T % n == 0, (T, n)
    tree = params["params"] if "params" in params else params

    def block_fn(p, u):  # u: [Tl, d_model]
        xz = u @ p["in_proj"]["kernel"]
        xx, z = jnp.split(xz, 2, axis=-1)
        # depthwise causal conv over time: halo = d_conv - 1 left frames
        halo = _gather_left(xx, cfg.d_conv - 1, axis, n)
        hp = jnp.concatenate([halo, xx], axis=0)[None]  # [1, halo+Tl, d_in]
        conv = jax.lax.conv_general_dilated(
            hp, p["conv1d"]["kernel"], (1,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=cfg.d_inner,
        )[0] + p["conv1d"]["bias"]
        xx = jax.nn.silu(conv)
        dbc = xx @ p["x_proj"]["kernel"]
        dt_rank = cfg.resolved_dt_rank
        dt, Bc, Cc = jnp.split(dbc, [dt_rank, dt_rank + cfg.d_state], axis=-1)
        dt = jax.nn.softplus(dt @ p["dt_proj"]["kernel"] + p["dt_proj"]["bias"])
        A = -jnp.exp(p["A_log"])
        y = _sp_selective_scan(
            xx.astype(jnp.float32), dt.astype(jnp.float32), A,
            Bc.astype(jnp.float32), Cc.astype(jnp.float32), p["D"],
            axis, n,
        ).astype(u.dtype)
        y = y * jax.nn.silu(z)
        return y @ p["out_proj"]["kernel"]

    def shard_fn(xl):  # [T/n, f_dim]
        h = xl @ tree["in_proj"]["kernel"] + tree["in_proj"]["bias"]
        for i in range(cfg.layers):
            h = h + block_fn(tree[f"block_{i}"], h)
        ln = tree["norm"]
        mu = jnp.mean(h, -1, keepdims=True)
        var = jnp.mean((h - mu) ** 2, -1, keepdims=True)
        h = (h - mu) * jax.lax.rsqrt(var + 1e-6) * ln["scale"] + ln["bias"]
        return h @ tree["head"]["kernel"] + tree["head"]["bias"]

    fn = shard_map(
        shard_fn, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
        check_vma=False,
    )
    return fn(x)


def sequence_parallel_infer(
    apply_fn: Callable[[Any], jax.Array],
    inputs: Any,
    mesh: Mesh,
    halo: int,
    *,
    axis: str = DATA_AXIS,
    time_axis: int = -2,
    out_prefix_rank: int = 1,
):
    """Run a causal ``apply_fn`` over time-sharded inputs with an INPUT halo.

    Exact only for functions whose before-the-start semantics is zero input
    frames: out[t] = f(in[t-halo .. t]) with zero extension (true for
    windowed reductions over raw inputs; NOT for multi-layer networks with
    per-layer causal padding — use per-layer exchange like sp_mstcn_infer).

    ``inputs``: pytree of arrays with leading TIME dimension T (T % n == 0).
    ``apply_fn`` maps the time-extended local pytree (halo + T/n frames) to
    an array whose ``time_axis`` has the extended length; returns the
    gathered [..., T, ...] result. ``out_prefix_rank`` counts the leading
    non-time axes of the output.
    """
    n = mesh.shape[axis]
    leaves = jax.tree.leaves(inputs)
    T = leaves[0].shape[0]
    assert all(l.shape[0] == T for l in leaves), "inputs must share T"
    assert T % n == 0, (T, n)
    Tl = T // n

    def shard_fn(local):
        def extend(x):
            if halo == 0:
                return x
            return jnp.concatenate(
                [_gather_left(x, halo, axis, n), x], axis=0)

        out = apply_fn(jax.tree.map(extend, local))
        t = out.shape[time_axis]
        return jax.lax.slice_in_dim(out, t - Tl, t, axis=time_axis)

    # in_specs is a prefix pytree of the ARGUMENT TUPLE — wrap the per-input
    # spec tree so a tuple-valued `inputs` is one argument, not several
    in_specs = (jax.tree.map(lambda _: P(axis), inputs),)
    out_spec = P(*([None] * out_prefix_rank), axis)
    fn = shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
        check_vma=False,
    )
    return fn(inputs)
