"""Production-dimension parity: ConvFormer-B36 backbone + 256-dim matcher.

Round-1 parity tests used tiny synthetic oracles (CF=64, 4x4 grids), which
cannot catch layout or key-surgery bugs that only appear at real shapes.
Here the torch oracle is the full reference backbone stack (ConvFormer-B36
stages 0-1, depths 3+12, dims 128+256) with timm FeatureListNet naming,
the MetaFormer_MS stem surgery (stem stride 2 pad 3; stage-1 downsample
stride 4 — ``/root/reference/nerfmatch/modules/__init__.py:28-36``), the
``.model`` nesting and the FPN (incl. real BatchNorm running stats and
align_corners=True upsampling, ``modules/__init__.py:42-91``).

Spatial size is reduced (64x64) to keep CPU wall-clock sane — channel dims,
depths, and every state-dict key are the production ones, which is what the
key surgery and layout conversion depend on.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from nerfmatch_tpu.models.backbone import (  # noqa: E402
    init_backbone_8_2, backbone_8_2_apply)
from nerfmatch_tpu.train.checkpoint import convert_torch_params  # noqa: E402

from test_checkpoint import TorchMetaFormerStage0  # noqa: E402

DEPTHS = (3, 12)
DIMS = (128, 256)


class LNNoBias(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):  # channels-last
        mu = x.mean(-1, keepdim=True)
        var = x.var(-1, keepdim=True, unbiased=False)
        return (x - mu) / torch.sqrt(var + 1e-6) * self.weight


class TorchStem(nn.Module):
    """Post-surgery stem: conv 7x7 stride 2 pad 3 + bias-free LN."""

    def __init__(self, dim):
        super().__init__()
        self.conv = nn.Conv2d(3, dim, 7, stride=2, padding=3)
        self.norm = LNNoBias(dim)

    def forward(self, x):  # NCHW -> NHWC
        return self.norm(self.conv(x).permute(0, 2, 3, 1))


class TorchDownsample(nn.Module):
    """Stage-1 downsample (post-surgery stride 4): LN + conv 3x3."""

    def __init__(self, cin, cout):
        super().__init__()
        self.norm = LNNoBias(cin)
        self.conv = nn.Conv2d(cin, cout, 3, stride=4, padding=1)

    def forward(self, x):  # NHWC
        h = self.norm(x).permute(0, 3, 1, 2)
        return self.conv(h).permute(0, 2, 3, 1)


class TorchStage(nn.Module):
    def __init__(self, depth, dim, downsample=None):
        super().__init__()
        if downsample is not None:
            self.downsample = downsample
        self.blocks = nn.ModuleList(
            [TorchMetaFormerStage0(dim) for _ in range(depth)])

    def forward(self, x):
        if hasattr(self, "downsample"):
            x = self.downsample(x)
        for b in self.blocks:
            x = b(x)
        return x


class TorchConvFormerMS(nn.Module):
    """MetaFormer_MS replica: timm FeatureListNet naming under ``.model``
    (stem / stages_0 / stages_1), FPN attrs on the wrapper itself."""

    def __init__(self, use_fpn: bool):
        super().__init__()
        model = nn.Module()
        model.stem = TorchStem(DIMS[0])
        model.stages_0 = TorchStage(DEPTHS[0], DIMS[0])
        model.stages_1 = TorchStage(
            DEPTHS[1], DIMS[1], TorchDownsample(DIMS[0], DIMS[1]))
        self.model = model
        self.use_fpn = use_fpn
        if use_fpn:
            self.layer2_outconv = nn.Conv2d(DIMS[1], DIMS[1], 1, bias=False)
            self.layer1_outconv = nn.Conv2d(DIMS[0], DIMS[1], 1, bias=False)
            self.layer1_outconv2 = nn.Sequential(
                nn.Conv2d(DIMS[1], DIMS[1], 3, padding=1, bias=False),
                nn.BatchNorm2d(DIMS[1]),
                nn.LeakyReLU(),
                nn.Conv2d(DIMS[1], DIMS[0], 3, padding=1, bias=False),
            )

    def forward(self, x):  # NCHW in; returns NHWC (fine, coarse) or FPN pair
        h = self.model.stem(x)
        x1 = self.model.stages_0(h)
        x2 = self.model.stages_1(x1)
        if not self.use_fpn:
            return x1, x2
        x1c = x1.permute(0, 3, 1, 2)
        x2c = x2.permute(0, 3, 1, 2)
        x2_out = self.layer2_outconv(x2c)
        x2_up = F.interpolate(x2_out, scale_factor=4.0, mode="bilinear",
                              align_corners=True)
        x1_out = self.layer1_outconv(x1c)
        x1_out = self.layer1_outconv2(x1_out + x2_up)
        return (x1_out.permute(0, 2, 3, 1), x2_out.permute(0, 2, 3, 1))


@pytest.mark.parametrize("use_fpn", [False, True])
def test_fullsize_backbone_ms_parity(use_fpn):
    torch.manual_seed(0)
    oracle = TorchConvFormerMS(use_fpn)
    if use_fpn:
        # Non-trivial running stats so the BN conversion is actually tested.
        bn = oracle.layer1_outconv2[1]
        bn.running_mean.normal_(0.0, 0.2)
        bn.running_var.uniform_(0.5, 1.5)
    oracle = oracle.eval()
    state = {f"backbone.{k}": v.detach().numpy()
             for k, v in oracle.state_dict().items()}

    name = "convformer384_fpn" if use_fpn else "convformer384"
    params, cfg = init_backbone_8_2(jax.random.PRNGKey(0), name)
    template = {"backbone": params}
    # MS ckpts nest timm under backbone.model.* (FPN stays on the wrapper).
    converted, missing = convert_torch_params(template, state,
                                              backbone_extra="model.")
    missing = [m for m in missing if "num_batches_tracked" not in m]
    assert not missing, missing[:10]

    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        fine_t, coarse_t = (
            t.numpy() for t in oracle(torch.from_numpy(x).permute(0, 3, 1, 2)))
        if use_fpn:
            coarse_t, fine_t = coarse_t, fine_t  # forward returns (fine, x2out)
    f_coarse, f_fine = backbone_8_2_apply(converted["backbone"], cfg,
                                          jnp.asarray(x))
    if use_fpn:
        # oracle returns (x1_out fine, x2_out coarse)
        assert np.allclose(np.asarray(f_fine), fine_t, atol=1e-4), \
            np.abs(np.asarray(f_fine) - fine_t).max()
        assert np.allclose(np.asarray(f_coarse), coarse_t, atol=1e-4), \
            np.abs(np.asarray(f_coarse) - coarse_t).max()
    else:
        assert f_fine.shape == (1, 32, 32, 128)
        assert f_coarse.shape == (1, 8, 8, 256)
        assert np.allclose(np.asarray(f_fine), fine_t, atol=1e-4), \
            np.abs(np.asarray(f_fine) - fine_t).max()
        assert np.allclose(np.asarray(f_coarse), coarse_t, atol=1e-4), \
            np.abs(np.asarray(f_coarse) - coarse_t).max()


def _production_c2f_config():
    from nerfmatch_tpu.models.matcher_c2f import C2FMatcherConfig

    # configs/nerfmatch/nerfmatch_7scenes_sfm_c2f.yaml model block.
    return C2FMatcherConfig(
        backbone="convformer384", pretrained=False, cfeat_dim=256,
        ffeat_dim=128, pt_dim=256, im_pe=True, im_sa=3, im_sa_type="share",
        pt_sa=3, pt_sa_type="full", pt_pe=True, pt_pe_type="fourier",
        post_pt_pe=True, coarse_layers=1, cformer_type="crs", pt_ftype="nerf",
        fine_sa=1, fsa_type="full", win_sz=5, cat_c_feat=True,
        temp_type="mul", fine_loss="match")


def _inverse_state_dict(params, rng, ms_nested: bool):
    """Template -> complete reference-named torch state dict with random
    values (inverse layout transforms), covering every key branch."""
    from nerfmatch_tpu.train.checkpoint import _torch_key_for_path

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    state = {}
    for kp, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else k.idx for k in kp)
        tkey = _torch_key_for_path(path)
        if ms_nested and tkey.startswith("backbone.") and path[1] != "fpn":
            tkey = "backbone.model." + tkey[len("backbone."):]
        v = rng.normal(size=np.shape(leaf)).astype(np.float32) * 0.05
        arr = np.asarray(v)
        if arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        elif arr.ndim == 2 and path[-1] == "weight":
            arr = arr.T
        state[tkey] = arr
    return state


def test_fullsize_c2f_key_surgery_complete():
    """Every leaf of the production-dim c2f matcher resolves against an
    MS-nested reference state dict — zero missing keys (exercises the
    ``backbone.model.`` remap, ``stages_N`` flattening, Sequential index
    mapping and attention/FFN renames at real shapes)."""
    from nerfmatch_tpu.models.matcher_c2f import NeRFMatcherMS

    model = NeRFMatcherMS(_production_c2f_config())
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    state = _inverse_state_dict(params, rng, ms_nested=True)
    converted, missing = convert_torch_params(params, state,
                                              backbone_extra="model.")
    assert not missing, missing[:10]
    # Values actually landed (not left at template init).
    w_t = state["backbone.model.stages_1.blocks.11.mlp.fc2.weight"]
    w_j = np.asarray(
        converted["backbone"]["stages"][1]["blocks"][11]["mlp"]["fc2"]["weight"])
    assert np.allclose(w_j, w_t.T)
    assert float(converted["temperature"]) == pytest.approx(
        float(state["temperature"]))


def test_fullsize_pretrained_ckpt_roundtrip(tmp_path):
    """A torch-saved Lightning-style ckpt at production dims loads through
    the trainer's _load_pretrained with zero backbone/matcher misses."""
    from argparse import Namespace
    from nerfmatch_tpu.models.matcher_c2f import NeRFMatcherMS
    from nerfmatch_tpu.train.matcher_trainer import _load_pretrained

    model = NeRFMatcherMS(_production_c2f_config())
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    state = _inverse_state_dict(params, rng, ms_nested=True)
    tstate = {f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
              for k, v in state.items()}
    ckpt = tmp_path / "c2f.ckpt"
    torch.save({"state_dict": tstate, "epoch": 0, "global_step": 0}, ckpt)

    out = _load_pretrained(model, params,
                           Namespace(c2f_ckpt=str(ckpt), finetune=None,
                                     coarse_ckpt=None))
    assert float(out["temperature"]) == pytest.approx(
        float(state["temperature"]))


REAL_CKPTS = sorted(__import__("pathlib").Path(
    __file__).resolve().parents[1].glob("pretrained/**/*.ckpt"))


@pytest.mark.skipif(not REAL_CKPTS, reason="no downloaded reference ckpt")
def test_real_downloaded_ckpt_conversion():
    """When a real reference checkpoint is present under pretrained/, every
    leaf of the matching template must resolve from it."""
    from nerfmatch_tpu.models.matcher_c2f import NeRFMatcherMS
    from nerfmatch_tpu.train.checkpoint import load_torch_state_dict

    state, _ = load_torch_state_dict(REAL_CKPTS[0])
    model = NeRFMatcherMS(_production_c2f_config())
    params = model.init_params(jax.random.PRNGKey(0))
    extra = "model." if any(k.startswith("backbone.model.") for k in state) \
        else ""
    _, missing = convert_torch_params(params, state, backbone_extra=extra)
    assert not missing, missing[:10]
