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


# -- Full EVP stage-2 checkpoint (mix_transformer_evp.py + segformer_head.py) --

def _mha_to_split_proj(sd: Mapping[str, np.ndarray], key: str, dim: int) -> dict:
    """torch nn.MultiheadAttention (joint in_proj) -> separate q/k/v Dense
    (MotionGuidedCrossAttention, mix_transformer_evp.py:862-890)."""
    w = np.asarray(sd[f"{key}.cross_attn.in_proj_weight"])  # [3C, C]
    b = np.asarray(sd[f"{key}.cross_attn.in_proj_bias"])
    out = {}
    for name, wi, bi in (
        ("q_proj", w[:dim], b[:dim]),
        ("k_proj", w[dim : 2 * dim], b[dim : 2 * dim]),
        ("v_proj", w[2 * dim :], b[2 * dim :]),
    ):
        out[name] = {"kernel": wi.T, "bias": bi}
    out["out_proj"] = _dense(sd, f"{key}.cross_attn.out_proj")
    out["norm"] = _ln(sd, f"{key}.norm")
    return out


def import_evp_state_dict(
    sd: Mapping[str, np.ndarray],
    depths=(3, 4, 18, 3),
) -> tuple[dict, dict]:
    """Reference stage-2 ``.pth`` (the FULL MixVisionTransformerEVP state
    dict: trunk + prompt generator + flow encoder + cross-attention + pooled
    head) -> (MiTEVP params, batch_stats).

    Complements import_mit_state_dict (trunk-only ImageNet load) with every
    trained key of train_evp.py/finetune_evp.py checkpoints, so extraction
    can run reference weights end-to-end (generate_evp_LFB.py:412-437).
    """
    params: dict = dict(import_mit_state_dict(sd, depths))
    batch_stats: dict = {}

    # prompt generator (mix_transformer_evp.py:550-815)
    pg: dict = {}
    P = "prompt_generator"
    if f"{P}.bimask_pos_embed" in sd:
        pg["bimask_pos_embed"] = np.asarray(sd[f"{P}.bimask_pos_embed"]).transpose(1, 2, 0)
    for s in range(1, 5):
        if f"{P}.handcrafted_generator{s}.proj.weight" in sd:
            pg[f"handcrafted_generator{s}"] = {
                "proj": _conv(sd, f"{P}.handcrafted_generator{s}.proj"),
                "norm": _ln(sd, f"{P}.handcrafted_generator{s}.norm"),
            }
        if f"{P}.embedding_generator{s}.weight" in sd:
            pg[f"embedding_generator{s}"] = _dense(sd, f"{P}.embedding_generator{s}")
        if f"{P}.shared_mlp{s}.weight" in sd:
            pg[f"shared_mlp{s}"] = _dense(sd, f"{P}.shared_mlp{s}")
        if f"{P}.fully_shared_mlp{s}.0.weight" in sd:
            pg[f"fully_shared_mlp{s}_0"] = _dense(sd, f"{P}.fully_shared_mlp{s}.0")
            pg[f"fully_shared_mlp{s}_1"] = _dense(sd, f"{P}.fully_shared_mlp{s}.2")
        for d in range(depths[s - 1]):
            if f"{P}.lightweight_mlp{s}_{d}.0.weight" in sd:
                pg[f"lightweight_mlp{s}_{d}"] = _dense(sd, f"{P}.lightweight_mlp{s}_{d}.0")
            if f"{P}.fully_unshared_mlp{s}_{d}.0.weight" in sd:
                pg[f"fully_unshared_mlp{s}_{d}_0"] = _dense(sd, f"{P}.fully_unshared_mlp{s}_{d}.0")
                pg[f"fully_unshared_mlp{s}_{d}_1"] = _dense(sd, f"{P}.fully_unshared_mlp{s}_{d}.2")
    if pg:
        params["prompt_generator"] = pg

    # optical-flow encoder (mix_transformer_evp.py:818-859)
    if "flow_encoder.conv1.weight" in sd:
        fe_p, fe_s = {}, {}
        for i in (1, 2, 3, 4):
            fe_p[f"conv{i}"] = _conv(sd, f"flow_encoder.conv{i}")
            bnp, bns = _bn(sd, f"flow_encoder.bn{i}")
            fe_p[f"bn{i}"] = bnp
            fe_s[f"bn{i}"] = bns
        params["flow_encoder"] = fe_p
        batch_stats["flow_encoder"] = fe_s

    # motion-guided cross attention, stages 3-4
    for name, dim_key in (("cross_attn_s3", 2), ("cross_attn_s4", 3)):
        if f"{name}.cross_attn.in_proj_weight" in sd:
            dim = np.asarray(sd[f"{name}.cross_attn.in_proj_weight"]).shape[1]
            params[name] = _mha_to_split_proj(sd, name, dim)

    # pooled head (segformer_head.py:46-179)
    if "head.linear_c4.proj.weight" in sd:
        hp: dict = {}
        for i in (1, 2, 3, 4):
            hp[f"linear_c{i}"] = _dense(sd, f"head.linear_c{i}.proj")
        hp["linear_fuse"] = {
            "kernel": np.asarray(sd["head.linear_fuse.conv.weight"]).transpose(2, 3, 1, 0)
        }
        bnp, bns = _bn(sd, "head.linear_fuse.bn")
        hp["fuse_bn"] = bnp
        batch_stats["head"] = {"fuse_bn": bns}
        hp["fc_1"] = _dense(sd, "head.fc.0")
        hp["fc_2"] = _dense(sd, "head.fc.2")
        hp["fc_ant_1"] = _dense(sd, "head.fc_ant.0")
        hp["fc_ant_2"] = _dense(sd, "head.fc_ant.2")
        params["head"] = hp

    return params, batch_stats


# -- Refinement Transformer (adapter_transformer.py Transformer wrapper) -------

def _attn_import(sd: Mapping[str, np.ndarray], pre: str) -> dict:
    """Trans-SVNet MultiHeadAttention -> transsv.MultiHeadAttention params.

    Public Trans-SVNet layout (the missing transformer2_3_1.py, SURVEY §2.9):
    ``W_Q/W_K/W_V`` Linear(bias=False), output ``fc`` Linear(bias=False),
    and a LayerNorm constructed INLINE in forward — so it carries no state
    and is always identity-affine.  If a fork moved the LN into __init__
    (``layernorm.weight`` present) it is imported instead.
    """
    p = {
        "w_q": {"kernel": np.asarray(sd[f"{pre}.W_Q.weight"]).T},
        "w_k": {"kernel": np.asarray(sd[f"{pre}.W_K.weight"]).T},
        "w_v": {"kernel": np.asarray(sd[f"{pre}.W_V.weight"]).T},
        "w_o": {"kernel": np.asarray(sd[f"{pre}.fc.weight"]).T},
    }
    d_model = p["w_q"]["kernel"].shape[0]
    if f"{pre}.layernorm.weight" in sd:
        p["ln"] = _ln(sd, f"{pre}.layernorm")
    else:
        p["ln"] = {"scale": np.ones(d_model, np.float32),
                   "bias": np.zeros(d_model, np.float32)}
    return p


def _ffn_import(sd: Mapping[str, np.ndarray], pre: str) -> dict:
    """PoswiseFeedForwardNet (``fc`` = Sequential(Linear(bias=False), ReLU,
    Linear(bias=False)) + inline LayerNorm) -> transsv.PoswiseFFN params.
    Our Dense layers carry biases; the torch layout has none, so they are
    zeroed for exact equivalence."""
    w1 = np.asarray(sd[f"{pre}.fc.0.weight"]).T
    w2 = np.asarray(sd[f"{pre}.fc.2.weight"]).T
    d_model = w1.shape[0]
    ln = (_ln(sd, f"{pre}.layernorm") if f"{pre}.layernorm.weight" in sd
          else {"scale": np.ones(d_model, np.float32),
                "bias": np.zeros(d_model, np.float32)})
    return {
        "fc1": {"kernel": w1, "bias": np.zeros(w1.shape[1], np.float32)},
        "fc2": {"kernel": w2, "bias": np.zeros(w2.shape[1], np.float32)},
        "ln": ln,
    }


def import_refiner_state_dict(sd: Mapping[str, np.ndarray], n_layers: int = 1) -> dict:
    """Reference refiner checkpoint (``TeCNOevp_trans1_3_5_1_...pth``, the
    ``Transformer`` wrapper of adapter_transformer.py:290-352 loaded at
    trans_SV_output.py:205-211) -> RefinementTransformer params.

    Expected keys (public Trans-SVNet naming for the snapshot-missing
    ``Transformer2_3_1``): ``fc.weight`` plus
    ``transformer.encoder.layers.{i}.enc_self_attn/pos_ffn.*`` and
    ``transformer.decoder.layers.{i}.dec_self_attn/dec_enc_attn/pos_ffn.*``.
    Non-parameter buffers (e.g. positional-encoding ``pe``) are ignored.
    """
    t = {}
    for i in range(n_layers):
        enc = f"transformer.encoder.layers.{i}"
        t[f"enc_{i}"] = {
            "self_attn": _attn_import(sd, f"{enc}.enc_self_attn"),
            "ffn": _ffn_import(sd, f"{enc}.pos_ffn"),
        }
        dec = f"transformer.decoder.layers.{i}"
        t[f"dec_{i}"] = {
            "self_attn": _attn_import(sd, f"{dec}.dec_self_attn"),
            "cross_attn": _attn_import(sd, f"{dec}.dec_enc_attn"),
            "ffn": _ffn_import(sd, f"{dec}.pos_ffn"),
        }
    return {
        "fc": {"kernel": np.asarray(sd["fc.weight"]).T},
        "transformer": t,
    }


def export_refiner_state_dict(params: Mapping, n_layers: int = 1) -> dict:
    """RefinementTransformer params -> the reference ``Transformer`` wrapper
    layout (inverse of import_refiner_state_dict; LN/bias state that has no
    torch slot — inline LayerNorms, FFN biases — must be identity/zero and is
    asserted so a lossy export cannot pass silently)."""
    sd = {"fc.weight": np.asarray(params["fc"]["kernel"]).T}

    def put_attn(pre, p):
        sd[f"{pre}.W_Q.weight"] = np.asarray(p["w_q"]["kernel"]).T
        sd[f"{pre}.W_K.weight"] = np.asarray(p["w_k"]["kernel"]).T
        sd[f"{pre}.W_V.weight"] = np.asarray(p["w_v"]["kernel"]).T
        sd[f"{pre}.fc.weight"] = np.asarray(p["w_o"]["kernel"]).T
        assert np.allclose(p["ln"]["scale"], 1.0) and np.allclose(p["ln"]["bias"], 0.0), \
            f"{pre}: non-identity LayerNorm has no slot in the torch layout"

    def put_ffn(pre, p):
        sd[f"{pre}.fc.0.weight"] = np.asarray(p["fc1"]["kernel"]).T
        sd[f"{pre}.fc.2.weight"] = np.asarray(p["fc2"]["kernel"]).T
        assert np.allclose(p["fc1"]["bias"], 0.0) and np.allclose(p["fc2"]["bias"], 0.0), \
            f"{pre}: nonzero FFN bias has no slot in the torch layout"
        assert np.allclose(p["ln"]["scale"], 1.0) and np.allclose(p["ln"]["bias"], 0.0), \
            f"{pre}: non-identity LayerNorm has no slot in the torch layout"

    t = params["transformer"]
    for i in range(n_layers):
        put_attn(f"transformer.encoder.layers.{i}.enc_self_attn", t[f"enc_{i}"]["self_attn"])
        put_ffn(f"transformer.encoder.layers.{i}.pos_ffn", t[f"enc_{i}"]["ffn"])
        put_attn(f"transformer.decoder.layers.{i}.dec_self_attn", t[f"dec_{i}"]["self_attn"])
        put_attn(f"transformer.decoder.layers.{i}.dec_enc_attn", t[f"dec_{i}"]["cross_attn"])
        put_ffn(f"transformer.decoder.layers.{i}.pos_ffn", t[f"dec_{i}"]["ffn"])
    return sd


# -- Causal Mamba (mstcn.py:282-343 + mamba_ssm Mamba layout) ------------------

def import_mamba_state_dict(sd: Mapping[str, np.ndarray], layers: int) -> dict:
    """Reference ``CausalMambaModel`` checkpoint (mstcn.py:300-343: ``in_proj``
    Linear, ``blocks.{i}`` = mamba_ssm ``Mamba`` modules, ``norm`` LayerNorm,
    ``head`` Linear) -> models.mamba.CausalMambaModel params.

    mamba_ssm Mamba key map (mamba_simple.py public layout):
      in_proj [2*d_inner, d_model] (no bias) | conv1d [d_inner, 1, d_conv] +
      bias | x_proj [dt_rank + 2*d_state, d_inner] (no bias) | dt_proj
      [d_inner, dt_rank] + bias | A_log [d_inner, d_state] | D [d_inner] |
      out_proj [d_model, d_inner] (no bias).
    """
    params: dict = {
        "in_proj": _dense(sd, "in_proj"),
        "norm": _ln(sd, "norm"),
        "head": _dense(sd, "head"),
    }
    for i in range(layers):
        pre = f"blocks.{i}"
        w_conv = np.asarray(sd[f"{pre}.conv1d.weight"]).transpose(2, 1, 0)
        params[f"block_{i}"] = {
            "in_proj": {"kernel": np.asarray(sd[f"{pre}.in_proj.weight"]).T},
            "conv1d": {"kernel": w_conv, "bias": np.asarray(sd[f"{pre}.conv1d.bias"])},
            "x_proj": {"kernel": np.asarray(sd[f"{pre}.x_proj.weight"]).T},
            "dt_proj": _dense(sd, f"{pre}.dt_proj"),
            "A_log": np.asarray(sd[f"{pre}.A_log"]),
            "D": np.asarray(sd[f"{pre}.D"]),
            "out_proj": {"kernel": np.asarray(sd[f"{pre}.out_proj.weight"]).T},
        }
    return params


def export_mamba_state_dict(params: Mapping, layers: int) -> dict:
    """CausalMambaModel params -> reference torch layout (round-trip)."""
    sd = {
        "in_proj.weight": np.asarray(params["in_proj"]["kernel"]).T,
        "in_proj.bias": np.asarray(params["in_proj"]["bias"]),
        "norm.weight": np.asarray(params["norm"]["scale"]),
        "norm.bias": np.asarray(params["norm"]["bias"]),
        "head.weight": np.asarray(params["head"]["kernel"]).T,
        "head.bias": np.asarray(params["head"]["bias"]),
    }
    for i in range(layers):
        p = params[f"block_{i}"]
        pre = f"blocks.{i}"
        sd[f"{pre}.in_proj.weight"] = np.asarray(p["in_proj"]["kernel"]).T
        sd[f"{pre}.conv1d.weight"] = np.asarray(p["conv1d"]["kernel"]).transpose(2, 1, 0)
        sd[f"{pre}.conv1d.bias"] = np.asarray(p["conv1d"]["bias"])
        sd[f"{pre}.x_proj.weight"] = np.asarray(p["x_proj"]["kernel"]).T
        sd[f"{pre}.dt_proj.weight"] = np.asarray(p["dt_proj"]["kernel"]).T
        sd[f"{pre}.dt_proj.bias"] = np.asarray(p["dt_proj"]["bias"])
        sd[f"{pre}.A_log"] = np.asarray(p["A_log"])
        sd[f"{pre}.D"] = np.asarray(p["D"])
        sd[f"{pre}.out_proj.weight"] = np.asarray(p["out_proj"]["kernel"]).T
    return sd


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


# -- Checkpoint-shape inference (turnkey reference parity) ---------------------

def infer_mstcn_dims(sd: Mapping[str, np.ndarray]) -> dict:
    """Model dims of a reference ``MultiStageModel_S`` checkpoint, read off
    the state dict itself so ``reference-parity`` needs no dim flags
    (trans_SV_output.py:196-201 hardcodes stages=2 layers=8 f_maps=32
    f_dim=2048; training used f_maps=64, tecno.py:105)."""
    layers = sum(1 for k in sd if k.startswith("stage1_phase.layers.")
                 and k.endswith(".conv_dilated.weight"))
    stages = 1 + len({k.split(".")[1] for k in sd if k.startswith("stages.")})
    f_maps, f_dim, _ = np.asarray(sd["stage1_phase.conv_1x1.weight"]).shape
    out_features = np.asarray(sd["stage1_phase.conv_out_classes.weight"]).shape[0]
    return {"stages": stages, "layers": layers, "f_maps": int(f_maps),
            "f_dim": int(f_dim), "out_features": int(out_features)}


def infer_refiner_dims(sd: Mapping[str, np.ndarray]) -> dict:
    """Model dims of a reference refiner checkpoint (``Transformer`` wrapper,
    trans_SV_output.py:205-211). Uses the reference invariant
    ``d_k = min(64, d_ff)`` (adapter_transformer.py:315) to split the fused
    W_Q width into n_heads."""
    n_layers = len({k.split(".")[3] for k in sd
                    if k.startswith("transformer.encoder.layers.")})
    d_ff, d_model = np.asarray(
        sd["transformer.encoder.layers.0.pos_ffn.fc.0.weight"]).shape
    out_features, f_dim = np.asarray(sd["fc.weight"]).shape
    d_k = min(64, int(d_ff))
    wq = np.asarray(sd["transformer.encoder.layers.0.enc_self_attn.W_Q.weight"])
    assert wq.shape[0] % d_k == 0, (wq.shape, d_k)
    return {"n_layers": int(n_layers), "f_maps": int(d_ff), "f_dim": int(f_dim),
            "out_features": int(out_features), "n_heads": int(wq.shape[0] // d_k)}
