"""Checkpoint bridge tests: torch-oracle parity + native save/load roundtrip.

The torch oracles here are small freshly-written modules that replicate the
*published semantics* (LoFTR/Aspanformer-style pre-norm encoder, NeRF MLP,
MetaFormer block) with the reference's state-dict naming, so converting their
weights through the bridge and comparing outputs validates both the key
mapping and the math.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from nerfmatch_tpu.train.checkpoint import (  # noqa: E402
    convert_torch_params,
    save_checkpoint,
    load_checkpoint,
    latest_checkpoint,
    infer_appearance_vocab,
)
from nerfmatch_tpu.models.attention import (  # noqa: E402
    init_encoder_layer,
    encoder_layer_apply,
)
from nerfmatch_tpu.nerf.model import NerfConfig, init_nerf_params, nerf_apply  # noqa: E402


# ---------------------------------------------------------------------------
# Torch oracles (reference-named modules)
# ---------------------------------------------------------------------------

class TorchMHA(nn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads = heads
        self.proj_q = nn.Linear(dim, inner, bias=False)
        self.proj_k = nn.Linear(dim, inner, bias=False)
        self.proj_v = nn.Linear(dim, inner, bias=False)
        self.proj_out = nn.Sequential(nn.Linear(inner, dim, bias=False))

    def forward(self, q, k, v):
        B, L, _ = q.shape
        hq = self.proj_q(q).view(B, L, self.heads, -1)
        hk = self.proj_k(k).view(B, k.shape[1], self.heads, -1)
        hv = self.proj_v(v).view(B, v.shape[1], self.heads, -1)
        scale = hq.shape[-1] ** 0.5
        att = torch.softmax(
            torch.einsum("blhd,bshd->blsh", hq / scale, hk), dim=2)
        out = torch.einsum("blsh,bshd->blhd", att, hv).reshape(B, L, -1)
        return self.proj_out(out)


class TorchEncoderLayer(nn.Module):
    """Pre-norm self-attention encoder layer w/ reference naming."""

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.attention = TorchMHA(dim, heads, head_dim)
        self.norm1 = nn.Sequential(nn.LayerNorm(dim))
        self.feedforward = nn.Module()
        self.feedforward.layers = nn.Sequential(
            nn.Linear(dim, dim), nn.GELU(), nn.Linear(dim, dim))
        self.norm2 = nn.LayerNorm(dim)

    def forward(self, x):
        xn = self.norm1(x)
        out = xn + self.attention(xn, xn, xn)
        h = self.feedforward.layers(self.norm2(out))
        # Reference forward_pre_norm residual quirk: xn + ffn(...), see
        # modules/attention.py:222-240.
        return xn + h


def test_encoder_layer_parity_with_torch():
    dim, heads, head_dim = 32, 4, 8
    torch.manual_seed(0)
    oracle = TorchEncoderLayer(dim, heads, head_dim).eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    template = init_encoder_layer(
        jax.random.PRNGKey(0), model_dim=dim, head_num=heads,
        head_dim=head_dim, att_mode="self")
    params, missing = convert_torch_params(template, state)
    assert not missing, f"missing: {missing}"

    x = np.random.default_rng(1).normal(size=(2, 10, dim)).astype(np.float32)
    with torch.no_grad():
        y_t = oracle(torch.from_numpy(x)).numpy()
    y_j = np.asarray(encoder_layer_apply(params, jnp.asarray(x), head_num=heads))
    assert np.allclose(y_j, y_t, atol=2e-5), np.abs(y_j - y_t).max()


class TorchNeRF(nn.Module):
    """Reference-semantics NeRF MLP (viewdir branch, skip at 4)."""

    def __init__(self, xyz_dim, dirs_dim, hid=64, layers=8, skips=(4,)):
        super().__init__()
        self.skips = skips
        self.xyz_dim = xyz_dim
        self.dirs_dim = dirs_dim
        mods = [nn.Linear(xyz_dim, hid)]
        for i in range(layers - 1):
            mods.append(nn.Linear(hid + xyz_dim if i in skips else hid, hid))
        self.pts_linears = nn.ModuleList(mods)
        self.feature_linear = nn.Linear(hid, hid)
        self.alpha_linear = nn.Linear(hid, 1)
        self.views_linears = nn.ModuleList([nn.Linear(dirs_dim + hid, hid // 2)])
        self.rgb_linear = nn.Linear(hid // 2, 3)

    def forward(self, x):
        pts, views = torch.split(x, [self.xyz_dim, self.dirs_dim], dim=-1)
        h = pts
        for i, l in enumerate(self.pts_linears):
            h = torch.relu(l(h))
            if i in self.skips:
                h = torch.cat([pts, h], -1)
        alpha = self.alpha_linear(h)
        feat = self.feature_linear(h)
        hr = torch.cat([feat, views], -1)
        for l in self.views_linears:
            hr = torch.relu(l(hr))
        rgb = torch.sigmoid(self.rgb_linear(hr))
        return torch.cat([rgb, alpha], -1)


def test_nerf_mlp_parity_with_torch():
    xyz, dirs = 30, 12
    torch.manual_seed(0)
    oracle = TorchNeRF(xyz, dirs).eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    cfg = NerfConfig(layer_num=8, hid_dim=64, xyz_dim=xyz, dirs_dim=dirs,
                     use_viewdirs=True, skips=(4,))
    template = init_nerf_params(jax.random.PRNGKey(0), cfg)
    params, missing = convert_torch_params(template, state)
    assert not missing, missing

    x = np.random.default_rng(2).normal(size=(64, xyz + dirs)).astype(np.float32)
    with torch.no_grad():
        y_t = oracle(torch.from_numpy(x)).numpy()
    y_j, _ = nerf_apply(params, cfg, jnp.asarray(x))
    assert np.allclose(np.asarray(y_j), y_t, atol=2e-5)


class TorchMetaFormerStage0(nn.Module):
    """One ConvFormer block with timm metaformer naming/semantics."""

    class StarReLU(nn.Module):
        def __init__(self):
            super().__init__()
            self.scale = nn.Parameter(torch.tensor(1.0 / 1.25**0.5))
            self.bias = nn.Parameter(torch.tensor(-0.5 / 1.25**0.5))

        def forward(self, x):
            return self.scale * torch.relu(x) ** 2 + self.bias

    class LNNoBias(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(dim))

        def forward(self, x):
            mu = x.mean(-1, keepdim=True)
            var = x.var(-1, keepdim=True, unbiased=False)
            return (x - mu) / torch.sqrt(var + 1e-6) * self.weight

    def __init__(self, dim=16):
        super().__init__()
        mid = dim * 2
        self.norm1 = self.LNNoBias(dim)
        tm = nn.Module()
        tm.pwconv1 = nn.Linear(dim, mid)
        tm.act1 = self.StarReLU()
        tm.dwconv = nn.Conv2d(mid, mid, 7, padding=3, groups=mid)
        tm.pwconv2 = nn.Linear(mid, dim)
        self.token_mixer = tm
        self.norm2 = self.LNNoBias(dim)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(dim, dim * 4)
        mlp.act = self.StarReLU()
        mlp.fc2 = nn.Linear(dim * 4, dim)
        self.mlp = mlp

    def forward(self, x):  # x NHWC
        h = self.norm1(x)
        h = self.token_mixer.pwconv1(h)
        h = self.token_mixer.act1(h)
        h = self.token_mixer.dwconv(h.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        h = self.token_mixer.pwconv2(h)
        x = x + h
        h = self.norm2(x)
        h = self.mlp.fc2(self.mlp.act(self.mlp.fc1(h)))
        return x + h


def test_convformer_block_parity_with_torch():
    from nerfmatch_tpu.models.backbone import _init_block, _block, BackboneConfig

    dim = 16
    torch.manual_seed(3)
    oracle = TorchMetaFormerStage0(dim).eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    cfg = BackboneConfig(depths=(1,), dims=(dim,))
    template = _init_block(jax.random.PRNGKey(0), dim, cfg)
    params, missing = convert_torch_params(template, state)
    assert not missing, missing

    x = np.random.default_rng(4).normal(size=(1, 8, 8, dim)).astype(np.float32)
    with torch.no_grad():
        y_t = oracle(torch.from_numpy(x)).numpy()
    y_j = np.asarray(_block(params, jnp.asarray(x)))
    assert np.allclose(y_j, y_t, atol=2e-4), np.abs(y_j - y_t).max()


def test_infer_appearance_vocab():
    state = {"embedding_a.weight": np.zeros((37, 16))}
    assert infer_appearance_vocab(state) == 37
    assert infer_appearance_vocab({}) is None


def test_embedding_table_not_transposed():
    """nn.Embedding tables are (vocab, dim) in BOTH layouts — only Linear
    weights transpose.  A Cambridge app ckpt (embedding_a (V, 16)) must
    convert row-identical, including the silent V == dim square case."""
    for v in (37, 16):
        state = {"embedding_a.weight":
                 np.arange(v * 16, dtype=np.float32).reshape(v, 16)}
        template = {"embedding_a": {"weight": jnp.zeros((v, 16))}}
        params, missing = convert_torch_params(template, state)
        assert not missing
        assert np.array_equal(np.asarray(params["embedding_a"]["weight"]),
                              state["embedding_a.weight"]), v


def test_native_checkpoint_roundtrip(tmp_path):
    import optax
    from nerfmatch_tpu.config import dict2namespace

    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "b": [{"w": jnp.ones((4,))}]}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    cfg = dict2namespace({"x": 1, "nested": {"y": "z"}})
    path = save_checkpoint(tmp_path, 5, params, opt_state, cfg)
    p2, o2, step, cfg2 = load_checkpoint(path, params, opt_state)
    assert step == 5
    assert cfg2.nested.y == "z"
    assert np.array_equal(np.asarray(p2["a"]), np.asarray(params["a"]))
    chex = jax.tree_util.tree_structure(o2) == jax.tree_util.tree_structure(opt_state)
    assert chex
    assert latest_checkpoint(tmp_path) == path


def test_checkpoint_pruning(tmp_path):
    params = {"a": jnp.zeros(3)}
    for s in [1, 2, 3, 4]:
        save_checkpoint(tmp_path, s, params, keep=2)
    names = sorted(p.name for p in tmp_path.glob("ckpt_*"))
    assert names == ["ckpt_3", "ckpt_4"]

    # Name-stem pruning must be EXACT: saving "best" (keep=1) must never
    # claim/delete "best_tmed" checkpoints, and latest_checkpoint("best")
    # must not return a best_tmed dir.
    save_checkpoint(tmp_path, 11, params, name="best_tmed", keep=1)
    save_checkpoint(tmp_path, 21, params, name="best", keep=1)
    save_checkpoint(tmp_path, 31, params, name="best", keep=1)
    names = sorted(p.name for p in tmp_path.glob("best*"))
    assert names == ["best_31", "best_tmed_11"], names
    assert latest_checkpoint(tmp_path, name="best").name == "best_31"
    assert latest_checkpoint(tmp_path, name="best_tmed").name == "best_tmed_11"


def test_coarse_to_c2f_warm_start_key_surgery(tmp_path):
    """Coarse-saved and MS-saved torch ckpts both warm-start a c2f model
    through _load_pretrained (backbone[.model] remap)."""
    import jax
    from argparse import Namespace
    from nerfmatch_tpu.models.matcher_c2f import C2FMatcherConfig, NeRFMatcherMS
    from nerfmatch_tpu.train.matcher_trainer import _load_pretrained

    cfg = C2FMatcherConfig(backbone="tiny", pretrained=False, cfeat_dim=32,
                           ffeat_dim=16, pt_dim=16, im_pe=False, im_sa=0,
                           im_sa_type=None, pt_sa=0, pt_pe=False,
                           coarse_layers=0, fine_sa=1)
    model = NeRFMatcherMS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    # Fake MS-saved ckpt: temperature + a backbone.model.* leaf.
    stem_w = np.random.default_rng(0).normal(
        size=np.asarray(params["backbone"]["stem"]["conv"]["weight"]).shape
    ).astype(np.float32)
    state = {
        "model.temperature": torch.tensor(3.5),
        "model.backbone.model.stem.conv.weight": torch.from_numpy(
            np.transpose(stem_w, (3, 2, 0, 1))),
    }
    ckpt_path = tmp_path / "ms.ckpt"
    torch.save({"state_dict": state, "epoch": 1, "global_step": 1}, ckpt_path)
    out = _load_pretrained(model, params,
                           Namespace(c2f_ckpt=str(ckpt_path), finetune=None,
                                     coarse_ckpt=None))
    assert float(out["temperature"]) == pytest.approx(3.5)
    assert np.allclose(np.asarray(out["backbone"]["stem"]["conv"]["weight"]),
                       stem_w, atol=1e-6)

    # Coarse-saved ckpt: bare backbone.* keys.
    state2 = {
        "model.temperature": torch.tensor(7.0),
        "model.backbone.stem.conv.weight": torch.from_numpy(
            np.transpose(stem_w * 2, (3, 2, 0, 1))),
    }
    ckpt2 = tmp_path / "coarse.ckpt"
    torch.save({"state_dict": state2, "epoch": 1, "global_step": 1}, ckpt2)
    out2 = _load_pretrained(model, params,
                            Namespace(c2f_ckpt=None, finetune=None,
                                      coarse_ckpt=str(ckpt2)))
    assert float(out2["temperature"]) == pytest.approx(7.0)
    assert np.allclose(np.asarray(out2["backbone"]["stem"]["conv"]["weight"]),
                       stem_w * 2, atol=1e-6)


def test_native_coarse_to_c2f_graft(tmp_path):
    """Warm-starting the C2F matcher from a NATIVE (orbax) coarse
    checkpoint dir: shared subtrees copy over, fine-stage leaves stay at
    init (the reference's strict=False cross-stage surgery for this
    framework's own checkpoints)."""
    from argparse import Namespace

    from nerfmatch_tpu.models.matcher_coarse import (
        CoarseMatcherConfig, NeRFMatcherCoarse)
    from nerfmatch_tpu.models.matcher_c2f import (
        C2FMatcherConfig, NeRFMatcherMS)
    from nerfmatch_tpu.train.checkpoint import save_checkpoint
    from nerfmatch_tpu.train.matcher_trainer import _load_pretrained

    kw = dict(backbone="tiny", pretrained=False, cfeat_dim=32, pt_dim=16,
              im_pe=True, im_sa=1, im_sa_type="share", pt_sa=0,
              pt_sa_type=None, pt_pe=False, coarse_layers=1)
    coarse = NeRFMatcherCoarse(CoarseMatcherConfig(**kw))
    cparams = coarse.init_params(jax.random.PRNGKey(7))
    save_checkpoint(tmp_path, 3, cparams, name="best")

    ms = NeRFMatcherMS(C2FMatcherConfig(**kw, ffeat_dim=16, fine_sa=1,
                                        fsa_type="full", win_sz=5,
                                        cat_c_feat=True))
    init = ms.init_params(jax.random.PRNGKey(0))
    out = _load_pretrained(ms, init, Namespace(
        coarse_ckpt=str(tmp_path / "best_3"), c2f_ckpt=None, finetune=None))

    # Shared leaves match the coarse run exactly.
    assert np.allclose(np.asarray(out["temperature"]),
                       np.asarray(cparams["temperature"]))
    a = np.asarray(jax.tree_util.tree_leaves(out["coarse_former"])[0])
    b = np.asarray(jax.tree_util.tree_leaves(cparams["coarse_former"])[0])
    assert np.allclose(a, b)
    bb_new = np.asarray(jax.tree_util.tree_leaves(out["backbone"])[0])
    bb_old = np.asarray(jax.tree_util.tree_leaves(cparams["backbone"])[0])
    assert np.allclose(bb_new, bb_old)
    # Fine-stage leaves exist and stayed at their init values.
    fi = np.asarray(jax.tree_util.tree_leaves(init["fine_sa"])[0])
    fo = np.asarray(jax.tree_util.tree_leaves(out["fine_sa"])[0])
    assert np.allclose(fi, fo)


def test_export_torch_state_dict_roundtrip():
    """export_torch_state_dict is the exact inverse of
    convert_torch_params: NeRF and c2f-matcher params round-trip through
    the reference torch format with zero missing keys and exact values."""
    import jax
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.models.matcher_c2f import (C2FMatcherConfig,
                                                  NeRFMatcherMS)
    from nerfmatch_tpu.train.checkpoint import export_torch_state_dict
    from tests.test_renderer import small_render_config

    # NeRF (hierarchical, feature tap, appearance table).
    cfg = small_render_config()
    cfg.embedding.appearance_embed = True
    renderer = NerfRenderer(cfg, num_frames=3)
    params = renderer.init_params(jax.random.PRNGKey(1))
    state = export_torch_state_dict(params, prefix="")
    template = renderer.init_params(jax.random.PRNGKey(2))
    back, missing = convert_torch_params(template, state)
    assert not missing
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert np.array_equal(np.asarray(a), np.asarray(b)), pa

    # C2F matcher incl. the MetaFormer_MS backbone wrapper remap + FPN.
    cfg = C2FMatcherConfig(backbone="tiny", pretrained=False, cfeat_dim=32,
                           ffeat_dim=16, pt_dim=16, im_pe=False, im_sa=1,
                           im_sa_type="full", pt_sa=1, pt_pe=True,
                           coarse_layers=1, fine_sa=1)
    model = NeRFMatcherMS(cfg)
    mparams = model.init_params(jax.random.PRNGKey(3))
    mstate = export_torch_state_dict(mparams, prefix="",
                                     backbone_extra="model.")
    mtemplate = model.init_params(jax.random.PRNGKey(4))
    mback, mmissing = convert_torch_params(mtemplate, mstate,
                                           backbone_extra="model.")
    assert not mmissing
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(mparams)[0],
            jax.tree_util.tree_flatten_with_path(mback)[0]):
        assert np.array_equal(np.asarray(a), np.asarray(b)), pa


def test_lightning_ckpt_save_load_cycle(tmp_path):
    """The synthetic-parity glue end to end on a tiny model: export params
    to the reference Lightning format (state_dict + hyper_parameters),
    torch.save, then load back through the PUBLIC evaluator entry
    (load_renderer_params) — params exact, config-in-ckpt reinflated."""
    from nerfmatch_tpu.eval.nerf_evaluator import load_renderer_params
    from nerfmatch_tpu.nerf.renderer import NerfRenderer
    from nerfmatch_tpu.train.checkpoint import export_torch_state_dict
    from tests.test_renderer import small_render_config

    cfg = small_render_config()
    cfg.embedding.appearance_embed = True
    renderer = NerfRenderer(cfg, num_frames=5)
    params = renderer.init_params(jax.random.PRNGKey(0))

    path = tmp_path / "synth_last.ckpt"
    state = export_torch_state_dict(params, prefix="model.")
    torch.save({
        "state_dict": {k: torch.from_numpy(np.array(v))
                       for k, v in state.items()},
        "hyper_parameters": dict(vars(cfg)),
        "epoch": 3, "global_step": 3,
    }, path)

    renderer2, params2, cfg2 = load_renderer_params(path)
    # Appearance vocab must be inferred from the stored table, not defaulted.
    assert renderer2.num_frames == 5
    assert cfg2.coarse_nerf.hid_dim == cfg.coarse_nerf.hid_dim
    assert cfg2.embedding.type == "mip"
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(params2)[0]):
        assert np.array_equal(np.asarray(a), np.asarray(b)), pa
