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

Mamba is NOT eligible — its recurrent state carries unbounded left context
(a sequential inter-device state handoff would be needed instead).
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
    from jax.experimental.shard_map import shard_map  # type: ignore


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
