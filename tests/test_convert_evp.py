"""Full-model EVP parity: a torch oracle of the ENTIRE reference spatial
model (mix_transformer_evp.py:218-449 + segformer_head.py:46-179) — trunk,
Gaussian prompt cascade, embedding/adaptor prompts, flow encoder,
motion-guided cross-attention, pooled head — drives MiTEVP to the same
outputs through import_evp_state_dict, including return_features.

The oracle is an original re-implementation at tiny dims whose state_dict
uses the reference key names, so the test validates the complete stage-2
checkpoint key mapping (train_evp.py/finetune_evp.py checkpoints).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from surgical_tpu.core.config import BackboneConfig, HeadConfig  # noqa: E402
from surgical_tpu.models.convert import import_evp_state_dict, merge_pretrained  # noqa: E402
from surgical_tpu.models.mit_evp import MiTEVP  # noqa: E402

IMG = 64
DIMS = (8, 16, 24, 32)
HEADS = (1, 2, 4, 8)
SRS = (8, 4, 2, 1)
DEPTHS = (2, 1, 1, 1)
SF = 4  # prompt scale factor
E = 16  # head embedding dim
HID = 8


def _block(dim, heads, sr):
    b = tnn.Module()
    b.norm1 = tnn.LayerNorm(dim, eps=1e-6)
    attn = tnn.Module()
    attn.q = tnn.Linear(dim, dim, bias=True)
    attn.kv = tnn.Linear(dim, dim * 2, bias=True)
    attn.proj = tnn.Linear(dim, dim)
    if sr > 1:
        attn.sr = tnn.Conv2d(dim, dim, sr, sr)
        attn.norm = tnn.LayerNorm(dim)
    b.attn = attn
    b.norm2 = tnn.LayerNorm(dim, eps=1e-6)
    mlp = tnn.Module()
    mlp.fc1 = tnn.Linear(dim, dim * 4)
    dw = tnn.Module()
    dw.dwconv = tnn.Conv2d(dim * 4, dim * 4, 3, 1, 1, groups=dim * 4)
    mlp.dwconv = dw
    mlp.fc2 = tnn.Linear(dim * 4, dim)
    b.mlp = mlp
    return b


def _run_block(b, x, H, W, heads, sr):
    B, N, C = x.shape
    h = b.norm1(x)
    q = b.attn.q(h).reshape(B, -1, heads, C // heads).permute(0, 2, 1, 3)
    if sr > 1:
        g = h.permute(0, 2, 1).reshape(B, C, H, W)
        g = b.attn.sr(g).reshape(B, C, -1).permute(0, 2, 1)
        g = b.attn.norm(g)
    else:
        g = h
    kv = b.attn.kv(g).reshape(B, -1, 2, heads, C // heads).permute(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    a = (q @ k.transpose(-2, -1)) * (C // heads) ** -0.5
    a = a.softmax(dim=-1)
    o = (a @ v).transpose(1, 2).reshape(B, -1, C)
    x = x + b.attn.proj(o)
    h2 = b.norm2(x)
    h2 = b.mlp.fc1(h2)
    h2 = h2.transpose(1, 2).view(B, -1, H, W)
    h2 = b.mlp.dwconv.dwconv(h2)
    h2 = h2.flatten(2).transpose(1, 2)
    h2 = tF.gelu(h2)
    return x + b.mlp.fc2(h2)


def _patch_embed(in_ch, dim, patch, stride):
    pe = tnn.Module()
    pe.proj = tnn.Conv2d(in_ch, dim, patch, stride, patch // 2)
    pe.norm = tnn.LayerNorm(dim)
    return pe


def _run_patch_embed(pe, x):
    x = pe.proj(x)
    B, C, H, W = x.shape
    return pe.norm(x.flatten(2).transpose(1, 2)), H, W


GAUSS = torch.tensor(
    [[1.0, 4, 6, 4, 1], [4, 16, 24, 16, 4], [6, 24, 36, 24, 6],
     [4, 16, 24, 16, 4], [1, 4, 6, 4, 1]]) / 256.0


def _gauss_blur(x):
    k = GAUSS.repeat(3, 1, 1, 1)
    x = tF.pad(x, (2, 2, 2, 2), mode="reflect")
    return tF.conv2d(x, k, groups=3)


class TorchEVP(tnn.Module):
    """Reference-named oracle of the full MixVisionTransformerEVP."""

    def __init__(self):
        super().__init__()
        ins = (3,) + DIMS[:3]
        for s in range(1, 5):
            p, st = (7, 4) if s == 1 else (3, 2)
            setattr(self, f"patch_embed{s}", _patch_embed(ins[s - 1], DIMS[s - 1], p, st))
            setattr(self, f"block{s}", tnn.ModuleList(
                [_block(DIMS[s - 1], HEADS[s - 1], SRS[s - 1]) for _ in range(DEPTHS[s - 1])]))
            setattr(self, f"norm{s}", tnn.LayerNorm(DIMS[s - 1], eps=1e-6))

        pg = tnn.Module()
        pins = (3,) + tuple(d // SF for d in DIMS[:3])
        for s in range(1, 5):
            p, st = (7, 4) if s == 1 else (3, 2)
            setattr(pg, f"handcrafted_generator{s}",
                    _patch_embed(pins[s - 1], DIMS[s - 1] // SF, p, st))
            setattr(pg, f"embedding_generator{s}", tnn.Linear(DIMS[s - 1], DIMS[s - 1] // SF))
            for d in range(DEPTHS[s - 1]):
                setattr(pg, f"lightweight_mlp{s}_{d}", tnn.Sequential(
                    tnn.Linear(DIMS[s - 1] // SF, DIMS[s - 1] // SF), tnn.GELU()))
            setattr(pg, f"shared_mlp{s}", tnn.Linear(DIMS[s - 1] // SF, DIMS[s - 1]))
        self.prompt_generator = pg

        fe = tnn.Module()
        fe.conv1 = tnn.Conv2d(2, 64, 7, 4, 3)
        fe.bn1 = tnn.BatchNorm2d(64)
        fe.conv2 = tnn.Conv2d(64, 128, 3, 2, 1)
        fe.bn2 = tnn.BatchNorm2d(128)
        fe.conv3 = tnn.Conv2d(128, DIMS[2], 3, 2, 1)
        fe.bn3 = tnn.BatchNorm2d(DIMS[2])
        fe.conv4 = tnn.Conv2d(DIMS[2], DIMS[3], 3, 2, 1)
        fe.bn4 = tnn.BatchNorm2d(DIMS[3])
        self.flow_encoder = fe

        for name, dim in (("cross_attn_s3", DIMS[2]), ("cross_attn_s4", DIMS[3])):
            ca = tnn.Module()
            ca.cross_attn = tnn.MultiheadAttention(dim, 8, batch_first=True)
            ca.norm = tnn.LayerNorm(dim)
            setattr(self, name, ca)

        head = tnn.Module()
        for i, d in enumerate(DIMS, start=1):
            m = tnn.Module()
            m.proj = tnn.Linear(d, E)
            setattr(head, f"linear_c{i}", m)
        fuse = tnn.Module()
        fuse.conv = tnn.Conv2d(4 * E, E, 1, bias=False)
        fuse.bn = tnn.BatchNorm2d(E)
        head.linear_fuse = fuse
        head.fc = tnn.Sequential(tnn.Linear(E, HID), tnn.ReLU(), tnn.Linear(HID, 7))
        head.fc_ant = tnn.Sequential(tnn.Linear(E, HID), tnn.ReLU(), tnn.Linear(HID, 7))
        self.head = head

    def _flow_tokens(self, flow):
        fe = self.flow_encoder
        x = tF.relu(fe.bn1(fe.conv1(flow)))
        x = tF.relu(fe.bn2(fe.conv2(x)))
        s3 = tF.relu(fe.bn3(fe.conv3(x)))
        s4 = tF.relu(fe.bn4(fe.conv4(s3)))
        return s3.flatten(2).transpose(1, 2), s4.flatten(2).transpose(1, 2)

    def _cross(self, ca, vis, flow_tokens):
        out, _ = ca.cross_attn(query=vis, key=flow_tokens, value=flow_tokens)
        return ca.norm(vis + out)

    def forward(self, img, seg, flow, return_features=False):
        pg = self.prompt_generator
        # handcrafted cascade over the blurred segmap (init_prompts :718-747)
        hand, prev = {}, _gauss_blur(seg)
        for s in range(1, 5):
            t, H, W = _run_patch_embed(getattr(pg, f"handcrafted_generator{s}"), prev)
            hand[s] = t
            prev = t.reshape(t.shape[0], H, W, -1).permute(0, 3, 1, 2).contiguous()

        x = img
        outs = []
        for s in range(1, 5):
            x, H, W = _run_patch_embed(getattr(self, f"patch_embed{s}"), x)
            emb = getattr(pg, f"embedding_generator{s}")(x)
            for d, blk in enumerate(getattr(self, f"block{s}")):
                feat = hand[s] + emb
                feat = getattr(pg, f"lightweight_mlp{s}_{d}")(feat)
                feat = getattr(pg, f"shared_mlp{s}")(feat)
                x = x + feat
                x = _run_block(blk, x, H, W, HEADS[s - 1], SRS[s - 1])
            x = getattr(self, f"norm{s}")(x)
            x = x.reshape(x.shape[0], H, W, -1).permute(0, 3, 1, 2).contiguous()
            outs.append(x)

        f3, f4 = self._flow_tokens(flow)
        for idx, (ca, ft) in ((2, (self.cross_attn_s3, f3)), (3, (self.cross_attn_s4, f4))):
            c = outs[idx]
            B, C, H, W = c.shape
            fused = self._cross(ca, c.flatten(2).transpose(1, 2), ft)
            outs[idx] = fused.transpose(1, 2).reshape(B, C, H, W)

        # head (segformer_head.py:137-179): project THEN resize (ours
        # resizes then projects — exact by linearity; this verifies it)
        c1, c2, c3, c4 = outs
        h = self.head
        n = c4.shape[0]
        cs = []
        for i, c in ((4, c4), (3, c3), (2, c2), (1, c1)):
            t = getattr(h, f"linear_c{i}").proj(c.flatten(2).transpose(1, 2))
            t = t.permute(0, 2, 1).reshape(n, E, c.shape[2], c.shape[3])
            if c.shape[2:] != c4.shape[2:]:
                t = tF.interpolate(t, size=c4.shape[2:], mode="bilinear", align_corners=False)
            cs.append(t)
        fused = h.linear_fuse.bn(h.linear_fuse.conv(torch.cat(cs, dim=1)))
        fused = tF.relu(fused)
        pooled = fused.mean(dim=(2, 3))
        if return_features:
            return pooled
        return h.fc(pooled), h.fc_ant(pooled)


@pytest.fixture(scope="module")
def parity_setup():
    torch.manual_seed(1)
    oracle = TorchEVP()
    # give the BNs non-trivial running stats, then freeze in eval mode
    with torch.no_grad():
        oracle.train()
        oracle._flow_tokens(torch.randn(4, 2, IMG, IMG))
        oracle.head.linear_fuse.bn(torch.randn(4, E, 2, 2))
    oracle.eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    cfg = BackboneConfig(
        variant="tiny_evp", embed_dims=DIMS, num_heads=HEADS, depths=DEPTHS,
        sr_ratios=SRS, qkv_bias=True, drop_path_rate=0.0, img_size=IMG,
        input_type="gaussian", adaptor="adaptor", tuning_stage="1234",
        handcrafted_tune=True, embedding_tune=True, with_flow=True,
    )
    model = MiTEVP(cfg, HeadConfig(embedding_dim=E, hidden=HID))

    rng = np.random.default_rng(3)
    img = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    seg = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    flow = rng.standard_normal((2, IMG, IMG, 2)).astype(np.float32)

    variables = model.init(jax.random.key(0), jnp.asarray(img), jnp.asarray(seg), jnp.asarray(flow))
    params, batch_stats = import_evp_state_dict(sd, DEPTHS)
    params = merge_pretrained(dict(variables["params"]), params)
    batch_stats = merge_pretrained(dict(variables["batch_stats"]), batch_stats)
    return oracle, model, {"params": params, "batch_stats": batch_stats}, img, seg, flow


def test_evp_full_forward_parity(parity_setup):
    oracle, model, variables, img, seg, flow = parity_setup
    with torch.no_grad():
        want_y, want_ant = oracle(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(seg.transpose(0, 3, 1, 2)),
            torch.from_numpy(flow.transpose(0, 3, 1, 2)),
        )
    y, y_ant = model.apply(variables, img, seg, flow)
    np.testing.assert_allclose(np.asarray(y), want_y.numpy(), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(y_ant), want_ant.numpy(), rtol=5e-3, atol=5e-3)


def test_evp_features_parity(parity_setup):
    """return_features (the LFB extraction contract) matches too."""
    oracle, model, variables, img, seg, flow = parity_setup
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(seg.transpose(0, 3, 1, 2)),
            torch.from_numpy(flow.transpose(0, 3, 1, 2)),
            return_features=True,
        ).numpy()
    got = np.asarray(model.apply(variables, img, seg, flow, return_features=True))
    assert got.shape == want.shape == (2, E)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_import_covers_all_torch_keys(parity_setup):
    """Every torch parameter/buffer maps to an imported leaf (BN
    num_batches_tracked excepted)."""
    oracle, *_ = parity_setup
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params, batch_stats = import_evp_state_dict(sd, DEPTHS)
    n_expected = sum(1 for k in sd if "num_batches_tracked" not in k)
    # each MHA joint in_proj_{weight,bias} (2 keys) splits into q/k/v
    # kernel+bias (6 leaves): +4 per cross-attention module
    n_expected += 4 * sum(1 for k in sd if k.endswith("in_proj_weight"))
    n_imported = len(jax.tree.leaves(params)) + len(jax.tree.leaves(batch_stats))
    assert n_imported == n_expected
