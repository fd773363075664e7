"""RAFT weight import: forward parity vs a torch oracle in the upstream
raft-things layout (princeton-vl RAFT naming), covering the full pipeline —
encoders, correlation pyramid + window lookup, SepConvGRU iterations, flow
head, and convex upsampling (reference RAFT.py:36,129-135 depends on
raft-things.pth; SURVEY §2.9).

The oracle is an original re-implementation of the architecture in torch
(not upstream code) whose state_dict uses the upstream key names, so the
test validates import_raft_state_dict's complete key mapping.
"""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from surgical_tpu.models.convert import import_raft_state_dict  # noqa: E402
from surgical_tpu.models.raft import RAFT  # noqa: E402

ITERS = 2
RADIUS = 4
LEVELS = 4


class TResidual(tnn.Module):
    def __init__(self, cin, cout, norm, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride=stride, padding=1)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        mk = (lambda c: tnn.InstanceNorm2d(c)) if norm == "instance" else (
            lambda c: tnn.BatchNorm2d(c))
        self.norm1, self.norm2 = mk(cout), mk(cout)
        if stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride=stride), mk(cout))
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class TEncoder(tnn.Module):
    def __init__(self, out_dim, norm):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.norm1 = (tnn.InstanceNorm2d(64) if norm == "instance"
                      else tnn.BatchNorm2d(64))
        self.layer1 = tnn.Sequential(TResidual(64, 64, norm), TResidual(64, 64, norm))
        self.layer2 = tnn.Sequential(TResidual(64, 96, norm, 2), TResidual(96, 96, norm))
        self.layer3 = tnn.Sequential(TResidual(96, 128, norm, 2), TResidual(128, 128, norm))
        self.conv2 = tnn.Conv2d(128, out_dim, 1)

    def forward(self, x):
        x = F.relu(self.norm1(self.conv1(x)))
        return self.conv2(self.layer3(self.layer2(self.layer1(x))))


class TMotionEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        cor_planes = LEVELS * (2 * RADIUS + 1) ** 2
        self.convc1 = tnn.Conv2d(cor_planes, 256, 1)
        self.convc2 = tnn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = tnn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = tnn.Conv2d(128, 64, 3, padding=1)
        self.conv = tnn.Conv2d(64 + 192, 128 - 2, 3, padding=1)

    def forward(self, flow, corr):
        c = F.relu(self.convc2(F.relu(self.convc1(corr))))
        f = F.relu(self.convf2(F.relu(self.convf1(flow))))
        out = F.relu(self.conv(torch.cat([c, f], dim=1)))
        return torch.cat([out, flow], dim=1)


class TGRU(tnn.Module):
    def __init__(self, h=128, x=256):
        super().__init__()
        for g in "zrq":
            setattr(self, f"conv{g}1", tnn.Conv2d(h + x, h, (1, 5), padding=(0, 2)))
            setattr(self, f"conv{g}2", tnn.Conv2d(h + x, h, (5, 1), padding=(2, 0)))

    def forward(self, h, x):
        for i in (1, 2):
            hx = torch.cat([h, x], dim=1)
            z = torch.sigmoid(getattr(self, f"convz{i}")(hx))
            r = torch.sigmoid(getattr(self, f"convr{i}")(hx))
            q = torch.tanh(getattr(self, f"convq{i}")(torch.cat([r * h, x], dim=1)))
            h = (1 - z) * h + z * q
        return h


class TUpdateBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TMotionEncoder()
        self.gru = TGRU()
        self.flow_head = tnn.Sequential()
        self.flow_head.add_module("conv1", tnn.Conv2d(128, 256, 3, padding=1))
        self.flow_head.add_module("conv2", tnn.Conv2d(256, 2, 3, padding=1))
        self.mask = tnn.Sequential(
            tnn.Conv2d(128, 256, 3, padding=1), tnn.ReLU(), tnn.Conv2d(256, 64 * 9, 1))

    def forward(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        net = self.gru(net, torch.cat([inp, motion], dim=1))
        delta = self.flow_head.conv2(F.relu(self.flow_head.conv1(net)))
        mask = 0.25 * self.mask(net)
        return net, delta, mask


def t_bilinear_sampler(img, coords):
    """img [N,1,h,w]; coords [N,K1,K2,2] (x,y) -> zeros-padded grid_sample."""
    h, w = img.shape[-2:]
    xgrid = 2 * coords[..., 0] / (w - 1) - 1
    ygrid = 2 * coords[..., 1] / (h - 1) - 1
    grid = torch.stack([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


def t_corr_lookup(pyramid, coords, r=RADIUS):
    """coords [1,2,H,W] absolute (x,y). Returns [1, levels*K^2, H, W]."""
    _, _, H, W = coords.shape
    coords = coords.permute(0, 2, 3, 1)  # [1,H,W,2]
    out = []
    for i, corr in enumerate(pyramid):
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), dim=-1)
        centroid = coords.reshape(H * W, 1, 1, 2) / 2**i
        sampled = t_bilinear_sampler(corr, centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2))
        out.append(sampled.view(1, H, W, -1))
    return torch.cat(out, dim=-1).permute(0, 3, 1, 2).contiguous()


class TRaft(tnn.Module):
    def __init__(self):
        super().__init__()
        self.fnet = TEncoder(256, "instance")
        self.cnet = TEncoder(256, "batch")
        self.update_block = TUpdateBlock()

    def forward(self, image1, image2, iters=ITERS):
        f1, f2 = self.fnet(image1), self.fnet(image2)
        N, C, h, w = f1.shape
        corr = torch.matmul(
            f1.view(C, h * w).t(), f2.view(C, h * w)) / np.sqrt(C)
        corr = corr.view(h * w, 1, h, w)
        pyramid = [corr]
        for _ in range(LEVELS - 1):
            pyramid.append(F.avg_pool2d(pyramid[-1], 2, stride=2))

        ctx = self.cnet(image1)
        net, inp = torch.tanh(ctx[:, :128]), F.relu(ctx[:, 128:])
        ys, xs = torch.meshgrid(
            torch.arange(h).float(), torch.arange(w).float(), indexing="ij")
        coords0 = torch.stack([xs, ys])[None]
        coords1 = coords0.clone()
        for _ in range(iters):
            corr_feat = t_corr_lookup(pyramid, coords1)
            flow = coords1 - coords0
            net, delta, mask = self.update_block(net, inp, corr_feat, flow)
            coords1 = coords1 + delta
        return self.upsample(coords1 - coords0, mask)

    @staticmethod
    def upsample(flow, mask):
        N, _, H, W = flow.shape
        mask = mask.view(N, 1, 9, 8, 8, H, W)
        mask = torch.softmax(mask, dim=2)
        up = F.unfold(8 * flow, [3, 3], padding=1).view(N, 2, 9, 1, 1, H, W)
        up = torch.sum(mask * up, dim=2)
        up = up.permute(0, 1, 4, 2, 5, 3)
        return up.reshape(N, 2, 8 * H, 8 * W)


@pytest.fixture(scope="module")
def oracle_and_params():
    torch.manual_seed(0)
    oracle = TRaft()
    # give cnet batch norms non-trivial running stats (fresh ones are 0/1,
    # which would make the frozen-BN import vacuous)
    with torch.no_grad():
        oracle.train()
        oracle.cnet(torch.randn(2, 3, 64, 64))
    oracle.eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = import_raft_state_dict(sd)
    return oracle, params


def test_import_full_forward_parity(oracle_and_params, rng):
    oracle, params = oracle_and_params
    img1 = rng.standard_normal((128, 128, 3)).astype(np.float32)
    img2 = (0.7 * img1 + 0.3 * rng.standard_normal((128, 128, 3))).astype(np.float32)

    with torch.no_grad():
        want = oracle(
            torch.from_numpy(img1).permute(2, 0, 1)[None],
            torch.from_numpy(img2).permute(2, 0, 1)[None],
        )[0].permute(1, 2, 0).numpy()

    model = RAFT(iters=ITERS, corr_levels=LEVELS, corr_radius=RADIUS)
    init = model.init(jax.random.key(0), img1, img2)
    # every imported leaf must exist in the init tree with the same shape
    jax.tree.map(lambda a, b: None, init["params"], params)
    got = np.asarray(model.apply({"params": params}, img1, img2))

    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_import_covers_every_torch_key(oracle_and_params):
    """No torch parameter may be silently dropped (num_batches_tracked and
    non-affine instance norms excepted)."""
    oracle, params = oracle_and_params
    sd = oracle.state_dict()
    expected = {
        k for k in sd
        if "num_batches_tracked" not in k
    }
    # count leaves: every expected key maps to exactly one imported array
    n_imported = len(jax.tree.leaves(params))
    assert n_imported == len(expected)
