"""Torch-layout state-dict ⇄ flax params converters.

The reference pipeline hands stages off through torch ``.pth`` state dicts
(ImageNet ``segformer_ckp/mit_b3.pth`` loaded at train_evp.py:365-375;
stage checkpoints throughout). These converters let our models load/save
those layouts so a reference user can bring their weights:

- conv2d:  torch [out, in, kh, kw]  <->  flax [kh, kw, in, out]
- depthwise conv2d: torch [C, 1, kh, kw] <-> flax [kh, kw, 1, C]
- conv1d:  torch [out, in, k]       <->  flax [k, in, out]
- linear:  torch [out, in]          <->  flax [in, out]
- batchnorm: weight/bias -> scale/bias; running stats -> batch_stats
- layernorm: weight -> scale

All functions operate on plain dicts of numpy arrays (a torch state_dict
mapped through ``.numpy()``), so no torch dependency at import time.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _lin(sd, key):
    return np.asarray(sd[f"{key}.weight"]).T, np.asarray(sd.get(f"{key}.bias"))


def _conv2d(sd, key):
    w = np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)
    return w, np.asarray(sd.get(f"{key}.bias"))


def _dwconv2d(sd, key):
    # torch [C, 1, kh, kw] -> flax [kh, kw, 1, C]
    w = np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)
    return w, np.asarray(sd.get(f"{key}.bias"))


def _conv1d(sd, key):
    w = np.asarray(sd[f"{key}.weight"]).transpose(2, 1, 0)
    return w, np.asarray(sd.get(f"{key}.bias"))


def _ln(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"]), "bias": np.asarray(sd[f"{key}.bias"])}


def _dense(sd, key, bias=True):
    k, b = _lin(sd, key)
    out = {"kernel": k}
    if bias and b is not None:
        out["bias"] = b
    return out


def _conv(sd, key, depthwise=False, bias=True):
    k, b = (_dwconv2d if depthwise else _conv2d)(sd, key)
    out = {"kernel": k}
    if bias and b is not None:
        out["bias"] = b
    return out


def _bn(sd, key):
    params = {"scale": np.asarray(sd[f"{key}.weight"]), "bias": np.asarray(sd[f"{key}.bias"])}
    stats = {
        "mean": np.asarray(sd[f"{key}.running_mean"]),
        "var": np.asarray(sd[f"{key}.running_var"]),
    }
    return params, stats


# -- MS-TCN (mstcn.py MultiStageModel_S layout) -------------------------------

def import_mstcn_state_dict(sd: Mapping[str, np.ndarray], stages: int, layers: int) -> dict:
    """Torch ``MultiStageModel_S`` state dict -> MultiStageTCN params.

    torch 1x1 Conv1d == our Dense: kernel [out,in,1] -> [in,out].
    """
    def dense_from_conv1x1(key):
        w = np.asarray(sd[f"{key}.weight"])[:, :, 0].T
        return {"kernel": w, "bias": np.asarray(sd[f"{key}.bias"])}

    def stage(prefix):
        p = {"in_proj": dense_from_conv1x1(f"{prefix}.conv_1x1"),
             "out_proj": dense_from_conv1x1(f"{prefix}.conv_out_classes")}
        for i in range(layers):
            w, b = _conv1d(sd, f"{prefix}.layers.{i}.conv_dilated")
            p[f"layer_{i}"] = {
                "conv_dilated": {"kernel": w, "bias": b},
                "conv_1x1": dense_from_conv1x1(f"{prefix}.layers.{i}.conv_1x1"),
            }
        return p

    params = {"stage_0": stage("stage1_phase")}
    for s in range(1, stages):
        params[f"stage_{s}"] = stage(f"stages.{s - 1}")
    return params


def export_mstcn_state_dict(params: Mapping, stages: int, layers: int) -> dict:
    """MultiStageTCN params -> torch MultiStageModel_S layout (round-trip)."""
    sd = {}

    def put_conv1x1(key, p):
        sd[f"{key}.weight"] = np.asarray(p["kernel"]).T[:, :, None]
        sd[f"{key}.bias"] = np.asarray(p["bias"])

    def put_stage(prefix, p):
        put_conv1x1(f"{prefix}.conv_1x1", p["in_proj"])
        put_conv1x1(f"{prefix}.conv_out_classes", p["out_proj"])
        for i in range(layers):
            lp = p[f"layer_{i}"]
            sd[f"{prefix}.layers.{i}.conv_dilated.weight"] = (
                np.asarray(lp["conv_dilated"]["kernel"]).transpose(2, 1, 0)
            )
            sd[f"{prefix}.layers.{i}.conv_dilated.bias"] = np.asarray(lp["conv_dilated"]["bias"])
            put_conv1x1(f"{prefix}.layers.{i}.conv_1x1", lp["conv_1x1"])

    put_stage("stage1_phase", params["stage_0"])
    for s in range(1, stages):
        put_stage(f"stages.{s - 1}", params[f"stage_{s}"])
    return sd


# -- MiT backbone (mix_transformer_evp.py layout) ------------------------------

def import_mit_state_dict(
    sd: Mapping[str, np.ndarray],
    depths=(3, 4, 18, 3),
    drop_head_and_prompt: bool = True,
) -> dict:
    """ImageNet SegFormer ``mit_b*.pth`` -> MiTEVP trunk params.

    Reproduces the reference's partial load: head/prompt keys dropped and
    loaded strict=False (train_evp.py:365-375) — only the 4-stage trunk is
    imported; prompt generator, flow encoder, cross-attention and head keep
    their fresh init.
    """
    params: dict = {}
    for s in range(1, 5):
        if f"patch_embed{s}.proj.weight" not in sd:
            continue  # partial checkpoint: import whatever stages exist
        params[f"patch_embed{s}"] = {
            "proj": _conv(sd, f"patch_embed{s}.proj"),
            "norm": _ln(sd, f"patch_embed{s}.norm"),
        }
        params[f"norm{s}"] = _ln(sd, f"norm{s}")
        for d in range(depths[s - 1]):
            pre = f"block{s}.{d}"
            blk = {
                "norm1": _ln(sd, f"{pre}.norm1"),
                "norm2": _ln(sd, f"{pre}.norm2"),
                "attn": {
                    "q": _dense(sd, f"{pre}.attn.q"),
                    "kv": _dense(sd, f"{pre}.attn.kv"),
                    "proj": _dense(sd, f"{pre}.attn.proj"),
                },
                "mlp": {
                    "fc1": _dense(sd, f"{pre}.mlp.fc1"),
                    "fc2": _dense(sd, f"{pre}.mlp.fc2"),
                    "dwconv": {"dwconv": _conv(sd, f"{pre}.mlp.dwconv.dwconv", depthwise=True)},
                },
            }
            if f"{pre}.attn.sr.weight" in sd:
                blk["attn"]["sr"] = _conv(sd, f"{pre}.attn.sr")
                blk["attn"]["norm"] = _ln(sd, f"{pre}.attn.norm")
            params[f"block{s}_{d}"] = blk
    return params


# -- RAFT (upstream princeton-vl raft-things.pth layout) -----------------------

def _frozen_bn(sd, key):
    """Eval-mode BatchNorm2d -> FrozenBatchNorm params (models/raft.py)."""
    return {
        "scale": np.asarray(sd[f"{key}.weight"]),
        "bias": np.asarray(sd[f"{key}.bias"]),
        "mean": np.asarray(sd[f"{key}.running_mean"]),
        "var": np.asarray(sd[f"{key}.running_var"]),
    }


def _raft_encoder(sd: Mapping[str, np.ndarray], enc: str, norm: str) -> dict:
    """BasicEncoder (conv1 + three 2-block residual layers + conv2).

    fnet uses non-affine instance norm (no keys in the torch dict); cnet
    uses BatchNorm2d whose running stats become FrozenBatchNorm params.
    """
    p = {"conv1": _conv(sd, f"{enc}.conv1"), "conv2": _conv(sd, f"{enc}.conv2")}
    if norm == "batch":
        p["norm1"] = _frozen_bn(sd, f"{enc}.norm1")
    for L in (1, 2, 3):
        for b in (0, 1):
            pre = f"{enc}.layer{L}.{b}"
            unit = {
                "conv1": _conv(sd, f"{pre}.conv1"),
                "conv2": _conv(sd, f"{pre}.conv2"),
            }
            if norm == "batch":
                unit["norm1"] = _frozen_bn(sd, f"{pre}.norm1")
                unit["norm2"] = _frozen_bn(sd, f"{pre}.norm2")
            if f"{pre}.downsample.0.weight" in sd:
                unit["downsample"] = _conv(sd, f"{pre}.downsample.0")
                if norm == "batch":
                    unit["norm3"] = _frozen_bn(sd, f"{pre}.downsample.1")
            p[f"layer{L}_{b}"] = unit
    return p


def import_raft_state_dict(sd: Mapping[str, np.ndarray]) -> dict:
    """raft-things.pth (DataParallel prefix already stripped by
    load_torch_pth) -> models.raft.RAFT params (RAFT.py:36,129-135)."""
    gru = {}
    for g in "zrq":
        for suffix, i in (("h", 1), ("v", 2)):
            gru[f"conv{g}_{suffix}"] = _conv(sd, f"update_block.gru.conv{g}{i}")
    return {
        "fnet": _raft_encoder(sd, "fnet", "instance"),
        "cnet": _raft_encoder(sd, "cnet", "batch"),
        "update_block": {
            "encoder": {
                k: _conv(sd, f"update_block.encoder.{k}")
                for k in ("convc1", "convc2", "convf1", "convf2", "conv")
            },
            "gru": gru,
            "flow_head1": _conv(sd, "update_block.flow_head.conv1"),
            "flow_head2": _conv(sd, "update_block.flow_head.conv2"),
            "mask1": _conv(sd, "update_block.mask.0"),
            "mask2": _conv(sd, "update_block.mask.2"),
        },
    }


def merge_pretrained(init_params: dict, imported: dict) -> dict:
    """Overlay imported subtrees onto freshly initialized params
    (the strict=False partial-load semantics)."""
    out = dict(init_params)
    for k, v in imported.items():
        if k in out and isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = merge_pretrained(out[k], v)
        else:
            out[k] = v
    return out


def load_torch_pth(path: str) -> dict:
    """Load a .pth into a numpy dict (strips DataParallel 'module.' prefixes,
    RAFT.py:129-135 semantics)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k.removeprefix("module."): v.detach().numpy() for k, v in sd.items()}
