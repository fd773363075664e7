"""Streaming per-frame temporal inference with exact offline parity.

The causal temporal models admit a constant-state streaming form:

- ``OnlineMSTCN``: each dilated residual layer (models/mstcn.py:41-71,
  reference mstcn.py:181-214) reads x[t], x[t-d], x[t-2d]; a ring buffer of
  the last ``2d`` layer inputs per layer replays exactly the left-zero-pad
  semantics of the offline forward (zero-initialised buffers ARE the causal
  padding). State: sum over stages/layers of 2*2^i rows of f_maps floats —
  ~510 frames x f_maps per stage at layers=8, a few hundred KB.
- ``OnlineMamba``: each block (models/mamba.py:27-87) carries the
  depthwise-conv window (d_conv-1 frames) and the SSM state [d_inner,
  d_state]; the recurrence is kernels/selective_scan.py's
      h_t = exp(dt_t * A) * h_{t-1} + (dt_t * x_t) * B_t,
      y_t = h_t @ C_t + D * x_t.

Both expose ``step(state, feat) -> (state, logits)`` (one jitted dispatch
per frame) and ``run(feats)`` (lax.scan over the same step — used by the
parity tests and for high-throughput catch-up processing of a backlog).
``OnlineSession`` chains the frozen backbone's feature extraction in front
for a frame-in / phase-out pipeline.

Dropout is inference-disabled, matching ``deterministic=True`` offline.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _tree(params: dict) -> dict:
    return params["params"] if "params" in params else params


def run_pipeline(temporal, refiner, feats: jax.Array) -> jax.Array:
    """Whole-sequence streaming composition: temporal run -> final stage ->
    refiner run. THE one place the temporal->refiner chaining rule lives
    (MS-TCN runs emit [S, T, out]; Mamba [T, out]); cli predict --online,
    bench, and the tests all route through it."""
    g = temporal.run(feats)
    if g.ndim == 3:  # MS-TCN stage axis
        g = g[-1]
    return refiner.run(g, feats)


# --------------------------------------------------------------- MS-TCN


class OnlineMSTCN:
    """Streaming MultiStageTCN (models/mstcn.py:113-148).

    ``feat`` per step is the [f_dim] LFB feature of one frame; logits are
    [stages, out_features] — same stage-major stack as the offline
    ``[S, B, T, out]`` at the current frame.
    """

    def __init__(self, model, params: dict):
        self.cfg = model.cfg
        self.params = _tree(params)
        self._step = jax.jit(self._step_impl)

    def init_state(self) -> list[list[jax.Array]]:
        """Zero ring buffers == the offline causal left-padding."""
        cfg = self.cfg
        return [
            [
                jnp.zeros((2 * 2**i, cfg.f_maps), jnp.float32)
                for i in range(cfg.layers)
            ]
            for _ in range(cfg.stages)
        ]

    def _stage_step(self, sp: dict, bufs: list, x: jax.Array):
        """One frame through one stage. x: [in_features] -> ([out], bufs')."""
        h = x @ sp["in_proj"]["kernel"] + sp["in_proj"]["bias"]
        new_bufs = []
        for i, buf in enumerate(bufs):
            d = 2**i
            lp = sp[f"layer_{i}"]
            k = lp["conv_dilated"]["kernel"]  # [3, C, C]: taps t-2d, t-d, t
            hc = (
                buf[0] @ k[0] + buf[d] @ k[1] + h @ k[2]
                + lp["conv_dilated"]["bias"]
            )
            hc = jax.nn.relu(hc)
            hc = hc @ lp["conv_1x1"]["kernel"] + lp["conv_1x1"]["bias"]
            new_bufs.append(jnp.roll(buf, -1, axis=0).at[-1].set(h))
            h = h + hc
        out = h @ sp["out_proj"]["kernel"] + sp["out_proj"]["bias"]
        return out, new_bufs

    def _step_impl(self, state, feat):
        outs = []
        x = feat
        new_state = []
        for s in range(self.cfg.stages):
            out, bufs = self._stage_step(self.params[f"stage_{s}"], state[s], x)
            outs.append(out)
            new_state.append(bufs)
            x = jax.nn.softmax(out, axis=-1)
        return new_state, jnp.stack(outs, axis=0)

    def step(self, state, feat: jax.Array):
        """feat [f_dim] -> (state', logits [stages, out_features])."""
        return self._step(state, feat)

    def run(self, feats: jax.Array) -> jax.Array:
        """feats [T, f_dim] -> [stages, T, out] via lax.scan over step."""
        state = self.init_state()
        _, outs = jax.lax.scan(self._step_impl, state, feats)
        return jnp.moveaxis(outs, 0, 1)  # [T, S, out] -> [S, T, out]


# ---------------------------------------------------------------- Mamba


class OnlineMamba:
    """Streaming CausalMambaModel (models/mamba.py:105-123).

    State per block: the depthwise-conv input window ([d_conv-1, d_inner])
    and the selective-scan SSM state ([d_inner, d_state], f32).
    """

    def __init__(self, model, params: dict):
        self.cfg = model.cfg
        self.params = _tree(params)
        self._step = jax.jit(self._step_impl)

    def init_state(self):
        cfg = self.cfg
        return [
            (
                jnp.zeros((cfg.d_conv - 1, cfg.d_inner), jnp.float32),
                jnp.zeros((cfg.d_inner, cfg.d_state), jnp.float32),
            )
            for _ in range(cfg.layers)
        ]

    def _block_step(self, bp: dict, state, u: jax.Array):
        cfg = self.cfg
        conv_buf, h = state
        xz = u @ bp["in_proj"]["kernel"]
        x, z = jnp.split(xz, 2, axis=-1)
        # depthwise causal conv: kernel [d_conv, 1, d_inner]
        window = jnp.concatenate([conv_buf, x[None]], axis=0)  # [d_conv, d_in]
        k = bp["conv1d"]["kernel"][:, 0, :]  # [d_conv, d_in]
        xc = jnp.sum(window * k, axis=0) + bp["conv1d"]["bias"]
        xc = jax.nn.silu(xc)

        dbc = xc @ bp["x_proj"]["kernel"]
        dt_rank = cfg.resolved_dt_rank
        dt, B, C = jnp.split(dbc, [dt_rank, dt_rank + cfg.d_state], axis=-1)
        dt = jax.nn.softplus(dt @ bp["dt_proj"]["kernel"] + bp["dt_proj"]["bias"])
        A = -jnp.exp(bp["A_log"])  # [d_in, N]

        xc32 = xc.astype(jnp.float32)
        dt32 = dt.astype(jnp.float32)
        a = jnp.exp(dt32[:, None] * A)                      # [d_in, N]
        b = (dt32 * xc32)[:, None] * B.astype(jnp.float32)[None, :]
        h = a * h + b
        y = h @ C.astype(jnp.float32) + bp["D"] * xc32       # [d_in]
        y = y.astype(u.dtype) * jax.nn.silu(z)
        # window[1:] drops the oldest frame: the next step's conv window is
        # concat(window[1:], x_new)
        return (window[1:], h), y @ bp["out_proj"]["kernel"]

    def _step_impl(self, state, feat):
        tree = self.params
        h = feat @ tree["in_proj"]["kernel"] + tree["in_proj"]["bias"]
        new_state = []
        for i in range(self.cfg.layers):
            st, y = self._block_step(tree[f"block_{i}"], state[i], h)
            new_state.append(st)
            h = h + y
        ln = tree["norm"]
        mu = jnp.mean(h, -1, keepdims=True)
        var = jnp.mean((h - mu) ** 2, -1, keepdims=True)
        h = (h - mu) * jax.lax.rsqrt(var + 1e-6) * ln["scale"] + ln["bias"]
        logits = h @ tree["head"]["kernel"] + tree["head"]["bias"]
        return new_state, logits

    def step(self, state, feat: jax.Array):
        """feat [f_dim] -> (state', logits [out_features])."""
        return self._step(state, feat)

    def run(self, feats: jax.Array) -> jax.Array:
        """feats [T, f_dim] -> [T, out] via lax.scan over step."""
        state = self.init_state()
        _, outs = jax.lax.scan(self._step_impl, state, feats)
        return outs


# -------------------------------------------------------------- refiner


class OnlineRefiner:
    """Streaming RefinementTransformer (models/transsv.py:196-231).

    The refiner is STRICTLY CAUSAL: frame t consumes the zero-left-padded
    window of the last ``len_q`` temporal logits plus its own LFB feature —
    so the online state is one ring buffer of ``len_q`` logits and the
    streaming output is exact with ZERO added latency. The step runs
    ``RefinementTransformer.refine_window`` on the buffer (the buffer IS
    frame t's causal window; zero-filled pre-history matches the offline
    ``causal_windows`` padding exactly) — one window, not the offline
    all-rows application.
    """

    def __init__(self, model, params: dict):
        self.cfg = model.cfg
        self.model = model
        # accept bare trees too (import_refiner_state_dict returns one),
        # matching the OnlineMSTCN/OnlineMamba convention
        self.params = {"params": _tree(params)}
        self._step = jax.jit(self._step_impl)

    def init_state(self) -> jax.Array:
        return jnp.zeros((self.cfg.len_q, self.cfg.out_features), jnp.float32)

    def _step_impl(self, buf, g_t, lfb_t):
        buf = jnp.roll(buf, -1, axis=0).at[-1].set(g_t)
        out = self.model.apply(
            self.params, buf, lfb_t,
            method=type(self.model).refine_window,
        )
        return buf, out

    def step(self, state, g_t: jax.Array, lfb_t: jax.Array):
        """(buffer, final-stage temporal logits [out], LFB feature [f_dim])
        -> (buffer', refined logits [out])."""
        return self._step(state, g_t, lfb_t)

    def run(self, temporal_logits: jax.Array, lfb: jax.Array) -> jax.Array:
        """[T, out], [T, f_dim] -> [T, out] via lax.scan over step."""
        state = self.init_state()

        def body(buf, inp):
            g_t, lfb_t = inp
            return self._step_impl(buf, g_t, lfb_t)

        _, outs = jax.lax.scan(body, state, (temporal_logits, lfb))
        return outs


# -------------------------------------------------------------- session


class OnlineSession:
    """Frame-in / phase-out streaming pipeline: frozen backbone features
    (the generate_evp_LFB.py extraction contract, one micro-batch per frame)
    chained into a streaming temporal model.

    ``temporal`` is an OnlineMSTCN or OnlineMamba; backbone inputs follow
    train/extract.py's wire format (uint8 image/segmap, f16 flow).
    """

    def __init__(self, backbone, variables: dict, temporal,
                 refiner: Optional["OnlineRefiner"] = None,
                 use_fused: Optional[bool] = None,
                 feature_dtype=jnp.float16):
        from surgical_tpu.parallel.mesh import make_mesh
        from surgical_tpu.train.extract import make_raw_feature_fn

        # a flow-trained backbone gates its flow fusion on `flow is not None`
        # (mit_evp.py): serving it without flow would silently produce wrong
        # features — refuse at step() (mirrors cli extract-features'
        # frame-cache modality guard)
        self._needs_flow = bool(getattr(getattr(backbone, "cfg", None),
                                        "with_flow", False))
        # feature_dtype defaults to the extraction wire (f16,
        # make_raw_feature_fn d2h_dtype): temporal params are trained on
        # f16-rounded stores, so live-streamed features round identically
        self._feature_dtype = feature_dtype
        # online serving is a B=1 micro-batch per frame: pin a single-device
        # mesh (the data-parallel extraction mesh would require B % n == 0)
        self._feature_fn = make_raw_feature_fn(
            backbone, variables, mesh=make_mesh(1), use_fused=use_fused,
            d2h_dtype=feature_dtype)
        self.temporal = temporal
        self.refiner = refiner
        self.state = temporal.init_state()
        self.refiner_state = refiner.init_state() if refiner else None
        self.frame_idx = 0
        if refiner is not None:
            # ONE jitted dispatch for temporal + refiner per frame (two tiny
            # steps; a separate dispatch each would double the fixed
            # per-call cost on the latency path)
            def _tr(ts, rs, feat):
                ts2, logits = temporal._step_impl(ts, feat)
                g_t = logits[-1] if logits.ndim == 2 else logits
                rs2, refined = refiner._step_impl(rs, g_t, feat)
                return ts2, rs2, refined

            self._tr_step = jax.jit(_tr)

    def reset(self):
        self.state = self.temporal.init_state()
        if self.refiner:
            self.refiner_state = self.refiner.init_state()
        self.frame_idx = 0

    def step(self, img_u8: np.ndarray, seg_u8: np.ndarray,
             flow_f16: Optional[np.ndarray]) -> np.ndarray:
        """One frame ([H, W, 3] u8, [H, W, 1] u8, [H, W, 2] f16|None) ->
        this frame's logits: refined (when a refiner is attached — the full
        reference pipeline, online) or the temporal model's final stage."""
        if self._needs_flow and flow_f16 is None:
            raise ValueError(
                "backbone was built with with_flow=True: serving without a "
                "flow frame silently skips the flow cross-attention and "
                "produces wrong features; pass flow_f16 (precompute with "
                "models/raft.py) or rebuild the backbone with with_flow=False")
        feat = self._feature_fn(
            img_u8[None], seg_u8[None],
            None if flow_f16 is None else flow_f16[None],
        )[0].astype(jnp.float32)
        self.frame_idx += 1
        if self.refiner is not None:
            self.state, self.refiner_state, refined = self._tr_step(
                self.state, self.refiner_state, feat)
            return np.asarray(refined)
        self.state, logits = self.temporal.step(self.state, feat)
        return np.asarray(logits[-1] if logits.ndim == 2 else logits)
