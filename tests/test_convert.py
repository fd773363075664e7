"""Checkpoint interop: torch-layout state dicts drive our models to the same
outputs as a torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from surgical_tpu.core.config import MSTCNConfig
from surgical_tpu.models.convert import (
    export_mstcn_state_dict,
    import_mstcn_state_dict,
    merge_pretrained,
)
from surgical_tpu.models.mstcn import MultiStageTCN


class TorchStage(tnn.Module):
    """Independent torch oracle with the reference's parameter layout."""

    def __init__(self, layers, f_maps, dim, out):
        super().__init__()
        self.conv_1x1 = tnn.Conv1d(dim, f_maps, 1)
        self.layers = tnn.ModuleList()
        for i in range(layers):
            m = tnn.Module()
            m.conv_dilated = tnn.Conv1d(f_maps, f_maps, 3, dilation=2**i,
                                        padding=2**i * 2)
            m.conv_1x1 = tnn.Conv1d(f_maps, f_maps, 1)
            self.layers.append(m)
        self.conv_out_classes = tnn.Conv1d(f_maps, out, 1)

    def forward(self, x):
        h = self.conv_1x1(x)
        for m in self.layers:
            y = tF.relu(m.conv_dilated(h))
            d = m.conv_dilated.dilation[0]
            y = y[:, :, : -(2 * d)]
            h = h + m.conv_1x1(y)
        return self.conv_out_classes(h)


class TorchMSTCN(tnn.Module):
    def __init__(self, stages, layers, f_maps, dim, out):
        super().__init__()
        self.stage1_phase = TorchStage(layers, f_maps, dim, out)
        self.stages = tnn.ModuleList(
            [TorchStage(layers, f_maps, out, out) for _ in range(stages - 1)]
        )

    def forward(self, x):
        out = self.stage1_phase(x)
        outs = [out]
        for s in self.stages:
            out = s(torch.softmax(out, dim=1))
            outs.append(out)
        return torch.stack(outs)


def test_mstcn_torch_roundtrip(rng):
    cfg = MSTCNConfig(stages=2, layers=3, f_maps=8, f_dim=16, dropout=0.0)
    oracle = TorchMSTCN(cfg.stages, cfg.layers, cfg.f_maps, cfg.f_dim, cfg.out_features)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    params = import_mstcn_state_dict(sd, cfg.stages, cfg.layers)
    model = MultiStageTCN(cfg)

    x = rng.standard_normal((1, 40, cfg.f_dim)).astype(np.float32)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    # theirs: [S, 1, C, T] -> [S, 1, T, C]
    theirs = theirs.transpose(0, 1, 3, 2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

    # and back: export reproduces the torch layout bit-for-bit
    sd2 = export_mstcn_state_dict(params, cfg.stages, cfg.layers)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], rtol=1e-6)


def test_merge_pretrained_partial():
    init = {"a": {"x": np.zeros(2), "y": np.zeros(2)}, "b": np.zeros(3)}
    imported = {"a": {"x": np.ones(2)}}
    merged = merge_pretrained(init, imported)
    np.testing.assert_array_equal(merged["a"]["x"], 1)
    np.testing.assert_array_equal(merged["a"]["y"], 0)
    np.testing.assert_array_equal(merged["b"], 0)
