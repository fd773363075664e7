"""Deployment export: serialize the serving graph to a self-contained
StableHLO artifact (`jax.export`) loadable WITHOUT the model code.

The reference deploys by shipping the training repo + a .pth and rebuilding
the torch module graph at load time (generate_evp_LFB.py:400-437). Here the
whole serving computation — wire-format dequant/normalize + the frozen
MiT-EVP forward with weights baked in as constants — exports to one
versioned-stable blob that any process with jax installed can call:

    art = export_feature_extractor(model, variables, batch_size=128)
    save_artifact("serving/", art)
    ...
    fn = load_artifact("serving/")           # no surgical_tpu import needed
    feats = fn(img_u8, seg_u8, flow_f16)     # [B, 2048]

Artifacts are platform-bound (exported on TPU -> runs on TPU); export the
portable flax graph by default — the Pallas-fused graph contains Mosaic
custom calls that pin the exact hardware generation (pass use_fused=True
only for same-fleet serving).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

_BLOB = "serving_graph.jaxexport"
_MANIFEST = "manifest.json"


def export_feature_extractor(
    model,
    variables: dict,
    batch_size: int,
    *,
    size: int = 224,
    with_flow: Optional[bool] = None,
    features: bool = True,
    use_fused: bool = False,
    d2h_dtype=jnp.float32,
):
    """Export the wire-format serving forward with weights baked in.

    Inputs of the exported fn: uint8 image [B, S, S, 3], uint8 segmap
    [B, S, S, 1], float16 flow [B, S, S, 2] (omitted when with_flow=False).
    Output: [B, D] features (``features=True``, the LFB extraction
    contract) or (phase logits, anticipation logits).

    ``with_flow`` defaults from the model config; passing it explicitly must
    agree with ``model.cfg.with_flow`` — a flow-trained model exported
    without the flow input would bake a graph that silently skips the flow
    cross-attention.
    """
    cfg_flow = bool(getattr(getattr(model, "cfg", None), "with_flow", True))
    if with_flow is None:
        with_flow = cfg_flow
    elif bool(with_flow) != cfg_flow:
        raise ValueError(
            f"with_flow={with_flow} contradicts model.cfg.with_flow="
            f"{cfg_flow}: the exported graph would not match the weights "
            "(rebuild the model with the intended with_flow instead)")
    # the SAME dequant + fused/flax forward selection the extraction path
    # runs (train/extract.py) — a second copy would silently desync the
    # artifact from the features the temporal models were trained on
    from surgical_tpu.train.extract import _serving_forward, wire_dequant

    dequant = wire_dequant()
    if features:
        forward = _serving_forward(model, use_fused)
    elif use_fused:
        from surgical_tpu.models.mit_fused import fused_forward

        def forward(variables, img, seg, flow):
            return fused_forward(
                variables["params"], variables["batch_stats"], img, seg, flow,
                model.cfg, model.head_cfg, return_features=False, bt=32,
            )
    else:
        def forward(variables, img, seg, flow):
            return model.apply(variables, img, seg, flow,
                               return_features=False)

    def serve(img_u8, seg_u8, flow_f16=None):
        img, seg = dequant(img_u8, seg_u8)
        flow = None if flow_f16 is None else flow_f16.astype(jnp.bfloat16)
        out = forward(variables, img, seg, flow)
        if features:
            return out.astype(d2h_dtype)
        return tuple(o.astype(d2h_dtype) for o in out)

    B, S = batch_size, size
    specs = [
        jax.ShapeDtypeStruct((B, S, S, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B, S, S, 1), jnp.uint8),
    ]
    if with_flow:
        specs.append(jax.ShapeDtypeStruct((B, S, S, 2), jnp.float16))
        exported = jexport.export(jax.jit(serve))(*specs)
    else:
        exported = jexport.export(jax.jit(lambda i, s: serve(i, s, None)))(*specs)
    return exported


def export_online_temporal(online, feat_dim: int):
    """Export a streaming temporal step (serving/online.py OnlineMSTCN or
    OnlineMamba) as a jax.export artifact: fn(state..., feat) ->
    (state'..., logits), with the zero initial state recorded in the
    manifest shapes. Together with the backbone artifact this deploys the
    full frame-in/phase-out pipeline without any model code."""
    state0 = online.init_state()
    flat, treedef = jax.tree.flatten(state0)

    def step(*args):
        state = jax.tree.unflatten(treedef, args[:-1])
        new_state, logits = online._step_impl(state, args[-1])
        return (*jax.tree.leaves(new_state), logits)

    specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in flat]
    specs.append(jax.ShapeDtypeStruct((feat_dim,), jnp.float32))
    return jexport.export(jax.jit(step))(*specs)


def export_online_refiner(online):
    """Export the streaming refiner step (serving/online.py OnlineRefiner):
    fn(buffer, g_t, lfb_t) -> (buffer', refined). With the backbone and
    temporal-step artifacts, the ENTIRE reference pipeline (backbone ->
    MS-TCN -> refinement) deploys as three model-code-free artifacts.
    The LFB dim comes from the refiner config (it is frozen into the baked
    fc kernel; a parameter could only ever restate it)."""
    buf0 = online.init_state()

    def step(buf, g_t, lfb_t):
        return online._step_impl(buf, g_t, lfb_t)

    specs = (
        jax.ShapeDtypeStruct(buf0.shape, buf0.dtype),
        jax.ShapeDtypeStruct((online.cfg.out_features,), jnp.float32),
        jax.ShapeDtypeStruct((online.cfg.f_dim,), jnp.float32),
    )
    return jexport.export(jax.jit(step))(*specs)


def save_artifact(directory: str, exported, meta: Optional[dict] = None) -> None:
    os.makedirs(directory, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(directory, _BLOB), "wb") as f:
        f.write(blob)
    manifest = {
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "calling_convention_version": exported.calling_convention_version,
        "bytes": len(blob),
        **(meta or {}),
    }
    with open(os.path.join(directory, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)


def load_artifact(directory: str):
    """Load a saved serving artifact; returns fn(*wire_inputs) -> outputs.
    Requires only jax — no surgical_tpu model code."""
    with open(os.path.join(directory, _BLOB), "rb") as f:
        exported = jexport.deserialize(f.read())

    # jit ONCE: Exported.call builds a fresh traceable per invocation, so an
    # unjitted per-frame loop would re-trace every call (milliseconds/frame)
    fn_jit = jax.jit(exported.call)

    def fn(*args):
        return fn_jit(*args)

    fn.manifest = json.load(open(os.path.join(directory, _MANIFEST)))
    fn.exported = exported
    return fn
