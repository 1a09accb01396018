"""End-to-end coarse-matcher parity vs a torch oracle.

The oracle replicates the reference's published matcher semantics (dual
softmax over L2-normalized projected features with a trainable temperature,
LoFTR sine PE, pre-norm transformer blocks) with the reference's state-dict
naming, at tiny dims.  Converting its weights through the checkpoint bridge
and comparing conf matrices validates the *entire* matcher stack: backbone
path excluded (covered by the ConvFormer block test) by feeding precomputed
image features through the projection+PE+attention+matching path.
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from nerfmatch_tpu.models.matcher_coarse import CoarseMatcherConfig, \
    NeRFMatcherCoarse  # noqa: E402
from nerfmatch_tpu.train.checkpoint import convert_torch_params  # noqa: E402
from nerfmatch_tpu.ops.matching import dual_softmax  # noqa: E402
from nerfmatch_tpu.models.position_encoding import sine_position_encoding_2d  # noqa: E402


CF = 64     # cfeat dim
PD = 32     # pt feat dim (== tiny backbone dim so projections exist)
HGRID = 4   # coarse grid
NPTS = 24


class TorchSinePE(nn.Module):
    def __init__(self, d_model, max_shape=(256, 256)):
        super().__init__()
        pe = torch.zeros((d_model, *max_shape))
        y_pos = torch.ones(max_shape).cumsum(0).float().unsqueeze(0)
        x_pos = torch.ones(max_shape).cumsum(1).float().unsqueeze(0)
        div = torch.exp(torch.arange(0, d_model // 2, 2).float()
                        * (-math.log(10000.0) / (d_model // 2)))
        div = div[:, None, None]
        pe[0::4] = torch.sin(x_pos * div)
        pe[1::4] = torch.cos(x_pos * div)
        pe[2::4] = torch.sin(y_pos * div)
        pe[3::4] = torch.cos(y_pos * div)
        self.register_buffer("pe", pe.unsqueeze(0), persistent=False)

    def forward(self, x):
        return x + self.pe[:, :, : x.size(2), : x.size(3)]


class TorchSABlock(nn.Module):
    """Pre-norm self-attention block with reference naming (layers.N...)."""

    class Layer(nn.Module):
        def __init__(self, dim, heads, head_dim):
            super().__init__()
            inner = heads * head_dim
            self.heads = heads
            att = nn.Module()
            att.proj_q = nn.Linear(dim, inner, bias=False)
            att.proj_k = nn.Linear(dim, inner, bias=False)
            att.proj_v = nn.Linear(dim, inner, bias=False)
            att.proj_out = nn.Sequential(nn.Linear(inner, dim, bias=False))
            self.attention = att
            self.norm1 = nn.Sequential(nn.LayerNorm(dim))
            ff = nn.Module()
            ff.layers = nn.Sequential(nn.Linear(dim, dim), nn.GELU(),
                                      nn.Linear(dim, dim))
            self.feedforward = ff
            self.norm2 = nn.LayerNorm(dim)

        def forward(self, x):
            a = self.attention
            xn = self.norm1(x)
            B, L, _ = xn.shape
            q = a.proj_q(xn).view(B, L, self.heads, -1)
            k = a.proj_k(xn).view(B, L, self.heads, -1)
            v = a.proj_v(xn).view(B, L, self.heads, -1)
            att = torch.softmax(
                torch.einsum("blhd,bshd->blsh", q / q.shape[-1] ** 0.5, k), 2)
            o = torch.einsum("blsh,bshd->blhd", att, v).reshape(B, L, -1)
            out = xn + a.proj_out(o)
            h = self.feedforward.layers(self.norm2(out))
            # Reference forward_pre_norm rebinds x to norm1(x): the final
            # residual is xn + ffn(...), NOT out + ffn(...)
            # (reference modules/attention.py:222-240).
            return xn + h

    def __init__(self, n, dim, heads, head_dim):
        super().__init__()
        self.layers = nn.Sequential(*[self.Layer(dim, heads, head_dim)
                                      for _ in range(n)])

    def forward(self, x):
        return self.layers(x)


class TorchCoarseMatcher(nn.Module):
    """Reference-semantics coarse matcher head (post-backbone)."""

    def __init__(self):
        super().__init__()
        self.cfeat_proj = nn.Linear(PD, CF)  # backbone_dim -> cfeat
        self.pt_proj = nn.Linear(PD, CF)
        self.temperature = nn.Parameter(torch.tensor(10.0))
        self.im_pe = TorchSinePE(CF, max_shape=(HGRID, HGRID))
        self.pt_sa = TorchSABlock(1, CF, 8, CF // 8)

    def forward(self, im_feat_map, pt_feat):
        # im_feat_map: (B, PD, H, W) raw "backbone" features.
        B, _, H, W = im_feat_map.shape
        cfeat = im_feat_map.flatten(-2).permute(0, 2, 1)
        cfeat = self.cfeat_proj(cfeat)
        cfeat = cfeat.permute(0, 2, 1).reshape(B, CF, H, W)
        cfeat = self.im_pe(cfeat).flatten(-2).permute(0, 2, 1)
        # share: image tokens go through the pt self-attention.
        cfeat = self.pt_sa(cfeat)

        ptf = self.pt_proj(pt_feat)
        ptf = self.pt_sa(ptf)

        nf = lambda f: f / (f.norm(dim=-1, keepdim=True) + 1e-6)
        sim = torch.einsum("bmd,bnd->bmn", nf(cfeat), nf(ptf)) * self.temperature
        return torch.softmax(sim, 1) * torch.softmax(sim, 2)


def test_coarse_matcher_head_parity():
    torch.manual_seed(0)
    oracle = TorchCoarseMatcher().eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    cfg = CoarseMatcherConfig(
        backbone="tiny", pretrained=False, cfeat_dim=CF, pt_dim=PD,
        im_pe=True, im_sa=1, im_sa_type="share", pt_sa=1, pt_sa_type="full",
        pt_pe=False, coarse_layers=0, temp_type="mul")
    model = NeRFMatcherCoarse(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    params, missing = convert_torch_params(params, state)
    # backbone leaves stay at init (oracle starts at the projection) — all
    # matcher-head leaves must be found.
    head_missing = [m for m in missing if not m.startswith("backbone")]
    assert not head_missing, head_missing

    rng = np.random.default_rng(0)
    im_map = rng.normal(size=(2, HGRID, HGRID, PD)).astype(np.float32)
    pt_feat = rng.normal(size=(2, NPTS, PD)).astype(np.float32)
    pt3d = rng.normal(size=(2, NPTS, 3)).astype(np.float32)

    with torch.no_grad():
        conf_t = oracle(torch.from_numpy(im_map).permute(0, 3, 1, 2),
                        torch.from_numpy(pt_feat)).numpy()

    # Drive our matcher's post-backbone path on the same features.
    from nerfmatch_tpu.models.layers import linear
    from nerfmatch_tpu.models.position_encoding import add_sine_pe
    from nerfmatch_tpu.models.attention import self_attention_block_apply

    feat = jnp.asarray(im_map.reshape(2, -1, PD))
    feat = linear(params["cfeat_proj"], feat)
    feat = add_sine_pe(feat.reshape(2, HGRID, HGRID, CF)).reshape(2, -1, CF)
    feat = self_attention_block_apply(params["pt_sa"], feat, head_num=8)
    ptf = model.extract_pt_feat(params, jnp.asarray(pt_feat), jnp.asarray(pt3d))
    conf_j, _, _ = dual_softmax(feat, ptf, params["temperature"],
                                temp_type="mul")

    assert np.allclose(np.asarray(conf_j), conf_t, atol=5e-5), \
        np.abs(np.asarray(conf_j) - conf_t).max()


def test_sine_pe_matches_torch():
    t = TorchSinePE(CF, max_shape=(8, 8))
    ours = np.asarray(sine_position_encoding_2d(CF, 8, 8))
    theirs = t.pe[0].permute(1, 2, 0).numpy()
    assert np.allclose(ours, theirs, atol=1e-6)


def test_lsa_attention_matches_torch_reference_behavior():
    """Reference LSA (``modules/attention.py:60-81``) builds a diagonal mask
    but softmaxes the UNMASKED logits (the mask is dead code), so the trained
    behavior is temperature-scaled attention.  Our lsa_attention must match
    that — including the softmax over the key axis of the 'blsh' layout."""
    from nerfmatch_tpu.models.attention import lsa_attention

    B, L, H, D = 2, 7, 4, 8
    rng = np.random.default_rng(3)
    q = rng.normal(size=(B, L, H, D)).astype(np.float32)
    k = rng.normal(size=(B, L, H, D)).astype(np.float32)
    v = rng.normal(size=(B, L, H, D)).astype(np.float32)
    log_scale = float(np.log(D**-0.5)) + 0.17

    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    with torch.no_grad():
        qk = torch.einsum("blhd,bshd->blsh", tq, tk) * math.exp(log_scale)
        # (reference computes a masked copy here and never uses it)
        z = torch.softmax(qk, dim=2)
        ref = torch.einsum("blsh,bshd->blhd", z, tv).numpy()

    out = np.asarray(lsa_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), jnp.asarray(log_scale)))
    assert np.allclose(out, ref, atol=1e-5), np.abs(out - ref).max()
