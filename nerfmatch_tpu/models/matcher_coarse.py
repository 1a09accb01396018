"""NeRFMatch coarse matcher (the "Mini" model): 2D image tokens vs 3D NeRF
point features via dual-softmax.

Capability match for the reference's ``NeRFMatcherCoarse``
(``nerfmatch_coarse_trainer.py:50-388``) as a pure params+apply model:

image: ConvFormer 1/8 features -> flatten -> linear proj to cfeat_dim ->
optional sine PE -> optional self-attention;
points: NeRF descriptors (or pt3d/pe3d/rand ablations,
``:197-203``) -> proj -> optional Fourier positional encoding concat+proj
(pre or post self-attention) -> self-attention;
optional cross-attention ``coarse_former``; masked dual-softmax with learned
(mul/Aspanformer) or fixed (div/LoFTR) temperature; dense fixed-shape mutual
match extraction (see :mod:`nerfmatch_tpu.ops.matching`).

Multi-pair (retrieval top-k) inference vmaps over the pair axis instead of
the reference's Python loop (``:290-336``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nerf.embedding import fourier_embedding, fourier_embedding_dim
from ..ops.matching import dual_softmax, extract_mutual_matches
from .attention import (
    init_encoder_layer,
    encoder_layer_apply,
    init_self_attention_block,
    self_attention_block_apply,
)
from .backbone import backbone_apply, init_backbone
from .layers import init_linear, linear
from .position_encoding import add_sine_pe

PT_PE_FREQS = 15  # FourierEmbedding(15) in the reference


@dataclasses.dataclass(frozen=True)
class CoarseMatcherConfig:
    backbone: str = "convformer384"
    pretrained: bool = True
    cfeat_dim: int = 256
    temp_type: str = "mul"          # "mul" (trainable x10) | "div" (fixed /0.1)
    im_pe: bool = True
    im_sa: int = 3
    im_sa_type: str | None = "share"
    pt_dim: int = 256
    pt_ftype: str = "nerf"          # "nerf" | "pt3d" | "pe3d" | "rand"
    pt_feat_norm: bool = False
    pt_pe: bool = True
    pt_pe_type: str = "fourier"     # "fourier" | "id"
    post_pt_pe: bool = False
    pt_sa: int = 3
    pt_sa_type: str | None = "full"
    cformer_type: str = "crs"       # "crs" | "crsv2"
    coarse_layers: int = 1
    fused_attention_train: bool = True  # Pallas attention in the train step
    attn_bf16: bool = True          # bf16 OPERAND STORAGE in the fused
                                    # Pallas attention core — numerically
                                    # FREE on v5e (the MXU's default
                                    # precision already runs f32 dot
                                    # operands as single-pass bf16:
                                    # fwd/bwd measured BIT-IDENTICAL at
                                    # gate + production shapes, scripts/
                                    # attn_bf16_gate.py), it only halves
                                    # operand HBM/VMEM traffic (step
                                    # 103.7 -> 102.4 ms).  False restores
                                    # f32 operand storage (same math).
    compute_dtype: str = "float32"  # "bfloat16": bf16 conv backbone + input
                                    # image only (attention/matching stay
                                    # f32 — measured conv-bound, bf16 trunk
                                    # buys nothing: commit 99aeb2c)

    @classmethod
    def from_namespace(cls, ns):
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in vars(ns).items() if k in fields})

    @property
    def effective_pt_dim(self):
        if self.pt_ftype == "pe3d":
            return fourier_embedding_dim(3, PT_PE_FREQS)
        if self.pt_ftype == "pt3d":
            return 3
        return self.pt_dim

    @property
    def pt_pe_dim(self):
        if not self.pt_pe:
            return 0
        if self.pt_pe_type == "id":
            return self.effective_pt_dim
        return fourier_embedding_dim(3, PT_PE_FREQS)

    @property
    def has_pt_sa(self):
        return self.pt_sa_type is not None and self.pt_sa > 0

    @property
    def has_im_sa(self):
        if self.im_sa_type is None or self.im_sa <= 0:
            return False
        if self.im_sa_type == "share":
            # Reference (nerfmatch_coarse_trainer.py:143-145): "share"
            # aliases the point SA module; with no pt_sa it aliases None
            # and the image SA is silently skipped — not a KeyError.
            return self.has_pt_sa
        assert self.im_sa_type == "full", \
            f"unknown im_sa_type: {self.im_sa_type!r} (use 'share'|'full')"
        return True


def feature_normalization(x):
    """Center + max-norm normalize a (B, N, D) point cloud / feature set
    (reference ``nerfmatch_coarse_trainer.py:42-47``)."""
    x = x - jnp.mean(x, axis=1, keepdims=True)
    max_norm = jnp.max(jnp.linalg.norm(x, axis=-1), axis=-1)
    return x / max_norm[:, None, None]


class NeRFMatcherCoarse:
    """Static-config holder; all compute is pure in the params pytree."""

    def __init__(self, config):
        self.cfg = (config if isinstance(config, CoarseMatcherConfig)
                    else CoarseMatcherConfig.from_namespace(config))
        from .backbone import make_config
        self.backbone_cfg = make_config(self.cfg.backbone, two_scale=False)

    # ------------------------------------------------------------------
    def _init_match_trunk(self, params, keys):
        """Shared matcher trunk (temperature, point proj/PE/SA, image SA,
        coarse former) — one builder for both matcher classes so a change
        lands in both.  ``keys``: 5 keys in this order (each subclass
        passes its original slice, preserving init streams exactly)."""
        cfg = self.cfg
        params["temperature"] = jnp.asarray(
            0.1 if cfg.temp_type == "div" else 10.0, jnp.float32)
        if cfg.effective_pt_dim != cfg.cfeat_dim:
            params["pt_proj"] = init_linear(
                keys[0], cfg.effective_pt_dim, cfg.cfeat_dim)
        if cfg.pt_pe_dim > 0:
            params["pt_pe_proj"] = init_linear(
                keys[1], cfg.cfeat_dim + cfg.pt_pe_dim, cfg.cfeat_dim)
        if cfg.has_pt_sa:
            params["pt_sa"] = init_self_attention_block(
                keys[2], cfg.pt_sa, cfg.cfeat_dim, head_num=8,
                head_dim=cfg.cfeat_dim // 8)
        if cfg.has_im_sa and cfg.im_sa_type == "full":
            params["im_sa"] = init_self_attention_block(
                keys[3], cfg.im_sa, cfg.cfeat_dim, head_num=8,
                head_dim=cfg.cfeat_dim // 8)
        if cfg.cformer_type.startswith("crs") and cfg.coarse_layers > 0:
            params["coarse_former"] = init_encoder_layer(
                keys[4], model_dim=cfg.cfeat_dim, context_dim=cfg.cfeat_dim,
                head_num=8, head_dim=cfg.cfeat_dim // 8, att_mode="cross")
        return params

    def init_params(self, key):
        cfg = self.cfg
        keys = jax.random.split(key, 8)
        params = {}
        params["backbone"], _ = init_backbone(keys[0], cfg.backbone)
        if self.backbone_cfg.feat_dim != cfg.cfeat_dim:
            params["cfeat_proj"] = init_linear(
                keys[1], self.backbone_cfg.feat_dim, cfg.cfeat_dim)
        return self._init_match_trunk(params, keys[2:7])

    # ------------------------------------------------------------------
    def temperature(self, params):
        """Similarity temperature; the "div"/LoFTR variant is FROZEN in the
        reference (``nerfmatch_coarse_trainer.py:70-75``:
        ``requires_grad=False``) — stop the gradient so training never
        drifts it (the leaf stays in the checkpoint either way)."""
        t = params["temperature"]
        if self.cfg.temp_type == "div":
            t = jax.lax.stop_gradient(t)
        return t

    def _maybe_bf16(self, tree):
        if self.cfg.compute_dtype != "bfloat16":
            return tree
        import jax.numpy as _jnp

        return jax.tree_util.tree_map(
            lambda x: x.astype(_jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == _jnp.float32 else x, tree)

    def im_backbone(self, params, img_nhwc):
        """Convolutional trunk only: (B, H, W, 3) -> 1/8 feature map.

        Kept separable from :meth:`im_feat_from_fmap` so the eval path can
        run the convolutions in their own program (see ``eval_match``)."""
        fmap = backbone_apply(self._maybe_bf16(params["backbone"]),
                              self.backbone_cfg, self._maybe_bf16(img_nhwc))
        return fmap.astype(jnp.float32)

    def im_feat_from_fmap(self, params, fmap):
        """Post-backbone image branch: proj -> sine PE -> self-attention."""
        cfg = self.cfg
        b, h, w, c = fmap.shape
        feat = fmap.reshape(b, h * w, c)
        if "cfeat_proj" in params:
            feat = linear(params["cfeat_proj"], feat)
        if cfg.im_pe:
            feat = add_sine_pe(feat.reshape(b, h, w, -1)).reshape(b, h * w, -1)
        if cfg.has_im_sa:
            sa = params["pt_sa"] if cfg.im_sa_type == "share" else params["im_sa"]
            feat = self_attention_block_apply(sa, feat, head_num=8)
        return feat

    def extract_im_feat(self, params, img_nhwc):
        """(B, H, W, 3) -> (B, (H/8)*(W/8), cfeat_dim) image tokens."""
        return self.im_feat_from_fmap(params, self.im_backbone(params, img_nhwc))

    def _cat_pe(self, params, pt_feat, pt_feat_in, pt3d):
        pe = pt_feat_in if self.cfg.pt_pe_type == "id" \
            else fourier_embedding(pt3d, PT_PE_FREQS)
        return linear(params["pt_pe_proj"], jnp.concatenate([pt_feat, pe], axis=-1))

    def extract_pt_feat(self, params, pt_feat, pt3d, key=None):
        """(B, N, pt_dim), (B, N, 3) -> (B, N, cfeat_dim) point tokens."""
        cfg = self.cfg
        if cfg.pt_feat_norm:
            pt_feat = feature_normalization(pt_feat)
            pt3d = feature_normalization(pt3d)
        if cfg.pt_ftype == "pt3d":
            pt_feat = pt3d
        elif cfg.pt_ftype == "rand":
            # Eval paths pass no key: the reference draws from the global
            # torch RNG here (an arbitrary stream); a fixed key keeps the
            # ablation runnable and deterministic at inference.
            if key is None:
                key = jax.random.PRNGKey(0)
            pt_feat = jax.random.normal(
                key, (*pt_feat.shape[:2], cfg.effective_pt_dim), pt_feat.dtype)
        elif cfg.pt_ftype == "pe3d":
            pt_feat = fourier_embedding(pt3d, PT_PE_FREQS)

        pt_feat_in = pt_feat
        if "pt_proj" in params:
            pt_feat = linear(params["pt_proj"], pt_feat)
        if cfg.pt_pe_dim > 0 and not cfg.post_pt_pe:
            pt_feat = self._cat_pe(params, pt_feat, pt_feat_in, pt3d)
        if cfg.has_pt_sa:
            pt_feat = self_attention_block_apply(params["pt_sa"], pt_feat, head_num=8)
        if cfg.pt_pe_dim > 0 and cfg.post_pt_pe:
            pt_feat = self._cat_pe(params, pt_feat, pt_feat_in, pt3d)
        return pt_feat

    def apply_coarse_former(self, params, im_cfeat, pt_cfeat):
        cfg = self.cfg
        if "coarse_former" not in params:
            return im_cfeat, pt_cfeat
        ca = lambda x, c: encoder_layer_apply(
            params["coarse_former"], x, c, head_num=8, att_mode="cross")
        if cfg.cformer_type == "crs":
            im_cfeat = ca(im_cfeat, pt_cfeat)
            pt_cfeat = ca(pt_cfeat, im_cfeat)  # sequential: sees updated im
        else:  # crsv2: parallel
            im_cfeat, pt_cfeat = ca(im_cfeat, pt_cfeat), ca(pt_cfeat, im_cfeat)
        return im_cfeat, pt_cfeat

    # ------------------------------------------------------------------
    def forward_match(self, params, img, pt_feat, pt3d, im_mask=None,
                      pt_mask=None, mutual: bool = False,
                      match_thres: float = 0.0, key=None,
                      ret_feats: bool = False, fmap=None):
        """Single-pair batch forward -> dense match dict.

        ``fmap``: optional precomputed backbone feature map (from
        :meth:`im_backbone`) so the caller can keep the convolutions in a
        separate program.  Returns dict(conf_matrix (B,M,N), j_ids (B,M),
        mconf (B,M), valid (B,M)[, im_cfeat, pt_cfeat]).
        """
        im_cfeat = (self.im_feat_from_fmap(params, fmap) if fmap is not None
                    else self.extract_im_feat(params, img))
        pt_cfeat = self.extract_pt_feat(params, pt_feat, pt3d, key=key)
        im_cfeat, pt_cfeat = self.apply_coarse_former(params, im_cfeat, pt_cfeat)
        conf, im_n, pt_n = dual_softmax(
            im_cfeat, pt_cfeat, self.temperature(params), im_mask, pt_mask,
            temp_type=self.cfg.temp_type)
        matches = extract_mutual_matches(conf, mutual=mutual, threshold=match_thres)
        out = dict(conf_matrix=conf, **matches)
        if ret_feats:
            out["im_cfeat"] = im_n
            out["pt_cfeat"] = pt_n
        return out

    def forward_multi_pair(self, params, img, pt_feat, pt3d, im_mask=None,
                           pt_mask=None, mutual: bool = False,
                           match_thres: float = 0.0, fmap=None,
                           pair_mesh=None):
        """Top-k retrieval pairs: pt tensors carry an extra pair axis
        (B, K, N, .); matching runs once per pair against the same image via
        lax.map over K (bounded memory), returning stacked dense matches
        (K, B, M).  With ``pair_mesh`` the pair axis is sharded over the
        mesh's data axis (parallel/pair_sharding.py).

        The pair-invariant image branch (backbone + proj + PE + image SA)
        runs ONCE outside the pair loop (as in the c2f override); only the
        point path + coarse former + matching repeat per pair."""
        im_cfeat0 = (self.im_feat_from_fmap(params, fmap) if fmap is not None
                     else self.extract_im_feat(params, img))

        def one_pair(args):
            ipt_feat, ipt3d, ipt_mask = args
            pt_cfeat = self.extract_pt_feat(params, ipt_feat, ipt3d)
            im_cfeat, pt_cfeat = self.apply_coarse_former(
                params, im_cfeat0, pt_cfeat)
            conf, _, _ = dual_softmax(
                im_cfeat, pt_cfeat, self.temperature(params), im_mask,
                ipt_mask, temp_type=self.cfg.temp_type)
            m = extract_mutual_matches(conf, mutual=mutual,
                                       threshold=match_thres)
            return {"j_ids": m["j_ids"], "mconf": m["mconf"], "valid": m["valid"]}

        pt_feat_k = jnp.swapaxes(pt_feat, 0, 1)
        pt3d_k = jnp.swapaxes(pt3d, 0, 1)
        pt_mask_k = (jnp.swapaxes(pt_mask, 0, 1) if pt_mask is not None
                     else jnp.ones(pt_feat_k.shape[:3], jnp.float32))
        args = (pt_feat_k, pt3d_k, pt_mask_k)
        if pair_mesh is not None and pair_mesh.devices.size > 1:
            from ..parallel.pair_sharding import map_pairs_sharded

            return map_pairs_sharded(pair_mesh, one_pair, args)
        return jax.lax.map(one_pair, args)

    # ------------------------------------------------------------------
    # Jitted split-program eval entries
    # ------------------------------------------------------------------

    def _eval_jit(self, kind: str, mutual: bool, match_thres: float,
                  top_k: int | None = None, pair_mesh=None):
        """Cached jits for the two-program eval forward: the conv trunk in
        one program, everything after it in another traced inside
        ``fused_attention_scope`` (Pallas attention; no convolutions in the
        same program — see the scope docstring for why that matters)."""
        from .attention import fused_attention_scope
        from ..ops.matching import dense_to_match_lists

        cache = self.__dict__.setdefault("_eval_jit_cache", {})
        key = ((kind,) if kind in ("backbone", "feats")
               else (kind, mutual, float(match_thres), top_k, pair_mesh))
        if key not in cache:
            if kind == "backbone":
                cache[key] = jax.jit(self.im_backbone)
            elif kind == "feats":
                def feats(params, fmap, pt_feat, pt3d):
                    with fused_attention_scope(True, bf16=self.cfg.attn_bf16):
                        im_cfeat = self.im_feat_from_fmap(params, fmap)
                        pt_cfeat = self.extract_pt_feat(params, pt_feat, pt3d)
                        return self.apply_coarse_former(params, im_cfeat,
                                                        pt_cfeat)

                cache[key] = jax.jit(feats)
            else:
                fwd = (self.forward_multi_pair if kind == "multi"
                       else self.forward_match)
                keep = ("j_ids", "mconf", "valid", "expec_f")

                def tail(params, fmap, pt_feat, pt3d, im_mask, pt_mask):
                    kw = ({"pair_mesh": pair_mesh} if kind == "multi"
                          else {})
                    with fused_attention_scope(True, bf16=self.cfg.attn_bf16):
                        out = fwd(params, None, pt_feat, pt3d, im_mask,
                                  pt_mask, mutual=mutual,
                                  match_thres=match_thres, fmap=fmap, **kw)
                    # Only what inference consumes: returning the dense
                    # (B, M, N) conf matrix would move ~50 MB per query.
                    res = {k: out[k] for k in keep if k in out}
                    if top_k:
                        dense = {k: res[k] for k in
                                 ("j_ids", "mconf", "valid")}
                        to_lists = lambda m: dense_to_match_lists(m, top_k)
                        res["lists"] = (jax.vmap(to_lists)(dense)
                                        if kind == "multi" else
                                        to_lists(dense))
                    return res

                cache[key] = jax.jit(tail)
        return cache[key]

    def eval_match(self, params, img, pt_feat, pt3d, im_mask=None,
                   pt_mask=None, mutual: bool = False,
                   match_thres: float = 0.0, top_k: int | None = None,
                   pair_mesh=None):
        """Inference forward (same outputs as :meth:`forward_match`), split
        into two jitted programs; multi-pair inputs (pt3d (B, K, N, 3))
        route through :meth:`forward_multi_pair` (with ``pair_mesh``, pairs
        shard over the mesh's data axis).  With ``top_k``, the fixed-length
        high-confidence match lists (``dense_to_match_lists``) are computed
        on device and returned under ``"lists"``.

        Call from host code, NOT inside an outer jit: nesting would inline
        both halves into one program, putting the convolutions and the
        fused attention kernel back together (see ``fused_attention_scope``
        for why that compiles ~4-5x slower)."""
        fmap = self._eval_jit("backbone", mutual, match_thres)(params, img)
        kind = "multi" if pt3d.ndim == 4 else "single"
        return self._eval_jit(kind, mutual, match_thres, top_k,
                              pair_mesh=pair_mesh)(
            params, fmap, pt_feat, pt3d, im_mask, pt_mask)

    def eval_match_point_sharded(self, params, mesh, img, pt_feat, pt3d,
                                 im_mask=None, pt_mask=None,
                                 mutual: bool = False,
                                 match_thres: float = 0.0,
                                 top_k: int | None = None):
        """Single-pair coarse matching with the POINT axis sharded over
        ``mesh`` (net-new TPU design, SURVEY §5).

        For merged multi-pair point clouds (``NeRFMatchMultiPair``,
        N ~ pair_topk*3600 on Cambridge) the (M, N) dual-softmax + mutual
        extraction dominates and scales with N; here every device computes
        its (M, N/d) block and the cross-point normalization + argmax ride
        ICI as (B, M) row statistics (``parallel/point_sharding.py``).
        Feature extraction stays replicated — its cost is O(N), not
        O(M*N).  Bit-matched to :meth:`eval_match` on the same inputs
        (tests/test_parallel.py::test_point_sharded_eval_match)."""
        from ..ops.matching import dense_to_match_lists
        from ..parallel.point_sharding import sharded_point_match

        fmap = self._eval_jit("backbone", False, 0.0)(params, img)
        im_cfeat, pt_cfeat = self._eval_jit("feats", False, 0.0)(
            params, fmap, pt_feat, pt3d)
        matches = sharded_point_match(
            mesh, im_cfeat, pt_cfeat, self.temperature(params), im_mask,
            pt_mask, temp_type=self.cfg.temp_type, mutual=mutual,
            threshold=match_thres)
        out = dict(matches)
        if top_k:
            out["lists"] = dense_to_match_lists(matches, top_k)
        return out
