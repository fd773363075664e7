"""Refiner torch-checkpoint parity: a torch oracle of the reference
``Transformer`` wrapper (adapter_transformer.py:290-352) with the
snapshot-missing ``Transformer2_3_1`` in the public Trans-SVNet layout
(W_Q/W_K/W_V/fc Linears bias=False, FFN = Sequential(Linear, ReLU, Linear)
bias=False, and LayerNorms constructed INLINE in forward — no state) drives
RefinementTransformer to the same outputs through import_refiner_state_dict.
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from surgical_tpu.core.config import RefinerConfig  # noqa: E402
from surgical_tpu.models.convert import (  # noqa: E402
    export_refiner_state_dict,
    import_refiner_state_dict,
)
from surgical_tpu.models.transsv import RefinementTransformer  # noqa: E402

D_MODEL = 14
D_FF = 8
D_K = 8
HEADS = 2
LEN_Q = 6
F_DIM = 12
T = 17


class _MHA(tnn.Module):
    """Trans-SVNet MultiHeadAttention: inline (stateless) LayerNorm."""

    def __init__(self):
        super().__init__()
        self.W_Q = tnn.Linear(D_MODEL, D_K * HEADS, bias=False)
        self.W_K = tnn.Linear(D_MODEL, D_K * HEADS, bias=False)
        self.W_V = tnn.Linear(D_MODEL, D_K * HEADS, bias=False)
        self.fc = tnn.Linear(HEADS * D_K, D_MODEL, bias=False)

    def forward(self, q_in, k_in, v_in):
        B, Lq, _ = q_in.shape
        Lk = k_in.shape[1]
        q = self.W_Q(q_in).view(B, Lq, HEADS, D_K).transpose(1, 2)
        k = self.W_K(k_in).view(B, Lk, HEADS, D_K).transpose(1, 2)
        v = self.W_V(v_in).view(B, Lk, HEADS, D_K).transpose(1, 2)
        scores = q @ k.transpose(-1, -2) / np.sqrt(D_K)
        ctx = scores.softmax(-1) @ v
        out = self.fc(ctx.transpose(1, 2).reshape(B, Lq, HEADS * D_K))
        return tnn.LayerNorm(D_MODEL)(out + q_in)  # inline LN: identity affine


class _FFN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.fc = tnn.Sequential(
            tnn.Linear(D_MODEL, D_FF, bias=False),
            tnn.ReLU(),
            tnn.Linear(D_FF, D_MODEL, bias=False),
        )

    def forward(self, x):
        return tnn.LayerNorm(D_MODEL)(self.fc(x) + x)


class _EncLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.enc_self_attn = _MHA()
        self.pos_ffn = _FFN()

    def forward(self, x):
        return self.pos_ffn(self.enc_self_attn(x, x, x))


class _DecLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.dec_self_attn = _MHA()
        self.dec_enc_attn = _MHA()
        self.pos_ffn = _FFN()

    def forward(self, dec, enc):
        dec = self.dec_self_attn(dec, dec, dec)
        dec = self.dec_enc_attn(dec, enc, enc)
        return self.pos_ffn(dec)


class _Oracle(tnn.Module):
    """The reference Transformer wrapper: transformer.* + fc."""

    def __init__(self):
        super().__init__()
        enc = tnn.Module()
        enc.layers = tnn.ModuleList([_EncLayer()])
        dec = tnn.Module()
        dec.layers = tnn.ModuleList([_DecLayer()])
        self.transformer = tnn.Module()
        self.transformer.encoder = enc
        self.transformer.decoder = dec
        self.fc = tnn.Linear(F_DIM, D_MODEL, bias=False)

    def original_forward(self, gt, lfb):
        """gt [1, D_MODEL, T] final-stage logits; lfb [T, F_DIM].

        Reproduces adapter_transformer.py:327-348: zero-left-padded windows
        (python loop — this is the oracle, so the loop is fine), l̃ₜ =
        tanh(fc(lfb)), transformer(windows, l̃ₜ)."""
        out_features = gt.transpose(1, 2)  # [1, T, C]
        inputs = []
        for i in range(out_features.size(1)):
            if i < LEN_Q - 1:
                pad = torch.zeros((1, LEN_Q - 1 - i, D_MODEL))
                inputs.append(torch.cat([pad, out_features[:, : i + 1]], dim=1))
            else:
                inputs.append(out_features[:, i - LEN_Q + 1 : i + 1])
        windows = torch.stack(inputs, dim=0).squeeze(1)  # [T, LEN_Q, C]
        feas = torch.tanh(self.fc(lfb))[:, None, :]  # [T, 1, C]
        enc = windows
        for layer in self.transformer.encoder.layers:
            enc = layer(enc)
        dec = feas
        for layer in self.transformer.decoder.layers:
            dec = layer(dec, enc)
        return dec[:, 0, :]


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    oracle = _Oracle().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    cfg = RefinerConfig(f_maps=D_FF, f_dim=F_DIM, out_features=D_MODEL,
                        len_q=LEN_Q, n_heads=HEADS)
    assert cfg.d_k == D_K
    model = RefinementTransformer(cfg)
    rng = np.random.default_rng(0)
    gt = rng.standard_normal((T, D_MODEL)).astype(np.float32)
    lfb = rng.standard_normal((T, F_DIM)).astype(np.float32)
    with torch.no_grad():
        want = oracle.original_forward(
            torch.from_numpy(gt.T[None]), torch.from_numpy(lfb)
        ).numpy()
    return sd, cfg, model, gt, lfb, want


def test_refiner_import_forward_parity(setup):
    sd, cfg, model, gt, lfb, want = setup
    params = import_refiner_state_dict(sd, n_layers=cfg.n_layers)
    got = np.asarray(model.apply({"params": params}, gt, lfb))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_refiner_import_covers_all_torch_keys(setup):
    sd, cfg, *_ = setup
    params = import_refiner_state_dict(sd, n_layers=cfg.n_layers)
    exported = export_refiner_state_dict(params, n_layers=cfg.n_layers)
    assert set(exported) == set(sd)
    for k in sd:
        np.testing.assert_allclose(exported[k], sd[k], rtol=1e-6)


def test_refiner_import_shapes_match_init(setup):
    sd, cfg, model, gt, lfb, _ = setup
    init = model.init(jax.random.key(0), gt, lfb)["params"]
    params = import_refiner_state_dict(sd, n_layers=cfg.n_layers)
    want_shapes = jax.tree.map(lambda a: a.shape, init)
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert want_shapes == got_shapes
