"""Mamba torch-checkpoint parity: a torch oracle of the reference
``CausalMambaModel`` (mstcn.py:282-343) with each block an independent
re-implementation of the public ``mamba_ssm.Mamba`` layer (in_proj ->
[x, z]; causal depthwise conv + SiLU; x_proj -> dt/B/C; dt_proj + softplus;
sequential selective state scan in f64; y + D*x; gate by SiLU(z); out_proj)
drives models.mamba.CausalMambaModel to the same outputs through
import_mamba_state_dict.
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from surgical_tpu.core.config import MambaConfig  # noqa: E402
from surgical_tpu.models.convert import (  # noqa: E402
    export_mamba_state_dict,
    import_mamba_state_dict,
)
from surgical_tpu.models.mamba import CausalMambaModel  # noqa: E402

D_MODEL = 8
D_STATE = 4
D_CONV = 4
EXPAND = 2
D_INNER = EXPAND * D_MODEL
DT_RANK = -(-D_MODEL // 16)
F_DIM = 12
CLASSES = 14
LAYERS = 2
T = 33


class _MambaOracle(tnn.Module):
    """mamba_ssm.Mamba layer at tiny dims (public key layout)."""

    def __init__(self):
        super().__init__()
        self.in_proj = tnn.Linear(D_MODEL, 2 * D_INNER, bias=False)
        self.conv1d = tnn.Conv1d(D_INNER, D_INNER, D_CONV, padding=D_CONV - 1,
                                 groups=D_INNER)
        self.x_proj = tnn.Linear(D_INNER, DT_RANK + 2 * D_STATE, bias=False)
        self.dt_proj = tnn.Linear(DT_RANK, D_INNER)
        self.A_log = tnn.Parameter(
            torch.log(torch.arange(1, D_STATE + 1, dtype=torch.float32)
                      .repeat(D_INNER, 1)))
        self.D = tnn.Parameter(torch.ones(D_INNER))
        self.out_proj = tnn.Linear(D_INNER, D_MODEL, bias=False)

    def forward(self, u):
        # u: [B, T, D_MODEL]
        xz = self.in_proj(u)
        x, z = xz.chunk(2, dim=-1)
        x = self.conv1d(x.transpose(1, 2))[..., : u.shape[1]].transpose(1, 2)
        x = tF.silu(x)
        dbc = self.x_proj(x)
        dt, B, C = torch.split(dbc, [DT_RANK, D_STATE, D_STATE], dim=-1)
        dt = tF.softplus(self.dt_proj(dt))  # [B, T, D_INNER]
        A = -torch.exp(self.A_log.double())  # [D_INNER, D_STATE]
        # sequential scan in f64
        x64, dt64 = x.double(), dt.double()
        B64, C64 = B.double(), C.double()
        h = torch.zeros(u.shape[0], D_INNER, D_STATE, dtype=torch.float64)
        ys = []
        for t in range(u.shape[1]):
            dA = torch.exp(dt64[:, t, :, None] * A[None])  # [B, D_INNER, N]
            dB = dt64[:, t, :, None] * B64[:, t, None, :]
            h = dA * h + dB * x64[:, t, :, None]
            ys.append((h * C64[:, t, None, :]).sum(-1))
        y = torch.stack(ys, dim=1) + self.D.double()[None, None] * x64
        y = y.float() * tF.silu(z)
        return self.out_proj(y)


class _Oracle(tnn.Module):
    """CausalMambaModel (mstcn.py:300-343): in_proj, blocks, norm, head."""

    def __init__(self):
        super().__init__()
        self.in_proj = tnn.Linear(F_DIM, D_MODEL)
        self.blocks = tnn.ModuleList([_MambaOracle() for _ in range(LAYERS)])
        self.norm = tnn.LayerNorm(D_MODEL)
        self.head = tnn.Linear(D_MODEL, CLASSES)

    def forward(self, x):
        # x: [B, C, T] -> [1, B, classes, T] (reference contract)
        x = x.transpose(1, 2)
        x = self.in_proj(x)
        for blk in self.blocks:
            x = x + blk(x)  # eval mode: dropout is identity
        x = self.norm(x)
        return self.head(x).transpose(1, 2).unsqueeze(0)


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    oracle = _Oracle().eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    cfg = MambaConfig(layers=LAYERS, d_model=D_MODEL, f_dim=F_DIM,
                      out_features=CLASSES, d_state=D_STATE, d_conv=D_CONV,
                      expand=EXPAND)
    model = CausalMambaModel(cfg, backend="xla")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, T, F_DIM)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x).transpose(1, 2)).numpy()
    return sd, cfg, model, x, want


def test_mamba_import_forward_parity(setup):
    sd, cfg, model, x, want = setup
    params = import_mamba_state_dict(sd, layers=cfg.layers)
    got = np.asarray(model.apply({"params": params}, x))
    # [1, B, T, C] vs reference [1, B, C, T]
    np.testing.assert_allclose(
        got, np.swapaxes(want, 2, 3), rtol=2e-4, atol=2e-5
    )


def test_mamba_import_covers_all_torch_keys(setup):
    sd, cfg, *_ = setup
    params = import_mamba_state_dict(sd, layers=cfg.layers)
    exported = export_mamba_state_dict(params, layers=cfg.layers)
    assert set(exported) == set(sd)
    for k in sd:
        np.testing.assert_allclose(exported[k], sd[k], rtol=1e-6)


def test_mamba_import_shapes_match_init(setup):
    sd, cfg, model, x, _ = setup
    init = model.init(jax.random.key(0), x)["params"]
    params = import_mamba_state_dict(sd, layers=cfg.layers)
    want_shapes = jax.tree.map(lambda a: a.shape, init)
    got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert want_shapes == got_shapes
