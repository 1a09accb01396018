"""NeRFMatch coarse-to-fine matcher (the "Full" model).

Capability match for the reference's ``NeRFMatcherMS``
(``nerfmatch_c2f_trainer.py:77-551``) + the LoFTR fine stage
(``third_party/loftr/fine_matching.py``), redesigned with fixed shapes:

* two-scale ConvFormer backbone (1/8 coarse + 1/2 fine, stem surgery);
* the same coarse dual-softmax path as the Mini model;
* fine stage over a *fixed-length* match list: 5x5 windows of the 1/2
  feature map are gathered at coarse match sites with ``dynamic_slice``
  (replacing torch ``F.unfold``'s full-map unfold + ragged select,
  ``fine_matching.py:46-55``), run through a self-attention block, and
  matched point-vs-window via softmax heatmap + dsnt spatial expectation;
* fine pixel coords: ``mpt2d_c + expec_f[:, :2] * win_sz/2 * fine_ds``
  (``nerfmatch_c2f_trainer.py:465``).

Note: the reference's ``FinePreprocess`` computes the coarse-context merge
(``cat_c_feat``) but *returns the unmerged windows* (``fine_matching.py:58-71``
— the merged tensor is discarded).  We reproduce that behavior by default for
checkpoint parity; set ``use_merged_fine=True`` to actually use the merge.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

from ..ops.dsnt import heatmap_expectation_with_std
from ..ops.gather import take_rows, take_rows_b
from ..ops.matching import dual_softmax, extract_mutual_matches
from .attention import init_self_attention_block, self_attention_block_apply, \
    init_encoder_layer
from .backbone import backbone_8_2_apply, init_backbone_8_2
from .layers import init_linear, init_linear_kaiming, linear
from .matcher_coarse import CoarseMatcherConfig, NeRFMatcherCoarse


@dataclasses.dataclass(frozen=True)
class C2FMatcherConfig(CoarseMatcherConfig):
    ffeat_dim: int = 128
    fine_sa: int = 1
    fsa_type: str = "full"
    win_sz: int = 5
    fine_ds: int = 2
    fine_stride: int = 4          # fine map cells per coarse cell
    cat_c_feat: bool = True
    use_merged_fine: bool = False  # reference discards the merge; opt-in fix
    coarse_percent: float = 0.3
    coarse_dthres: float = 20.0
    fine_loss: str = "match"

    @classmethod
    def from_namespace(cls, ns):
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in vars(ns).items() if k in fields})


class NeRFMatcherMS(NeRFMatcherCoarse):
    """Coarse-to-fine matcher; pure in params (static config on self)."""

    def __init__(self, config):
        self.cfg = (config if isinstance(config, C2FMatcherConfig)
                    else C2FMatcherConfig.from_namespace(config))
        from .backbone import make_config
        self.backbone_cfg = make_config(self.cfg.backbone, two_scale=True)

    # ------------------------------------------------------------------
    def init_params(self, key):
        cfg = self.cfg
        keys = jax.random.split(key, 16)
        params = {}
        params["backbone"], _ = init_backbone_8_2(keys[0], cfg.backbone)
        cdim, fdim = self.backbone_cfg.dims[1], self.backbone_cfg.dims[0]
        if cdim != cfg.cfeat_dim:
            params["cfeat_proj"] = init_linear(keys[1], cdim, cfg.cfeat_dim)
        if fdim != cfg.ffeat_dim:
            params["ffeat_proj"] = init_linear(keys[2], fdim, cfg.ffeat_dim)
        # Shared trunk (temperature, pt proj/PE/SA, im SA, coarse former):
        # one builder in the base class; same key slice as before.
        self._init_match_trunk(params, keys[3:8])
        # Point fine-feature projection (2 linears, no activation).
        params["pt_ffeat_proj"] = [
            init_linear(keys[8], cfg.cfeat_dim, cfg.ffeat_dim),
            init_linear(keys[9], cfg.ffeat_dim, cfg.ffeat_dim),
        ]
        if cfg.cat_c_feat:
            params["fine_preprocess"] = {
                "down_proj": init_linear_kaiming(keys[10], cfg.cfeat_dim, cfg.ffeat_dim),
                "merge_feat": init_linear_kaiming(keys[11], 2 * cfg.ffeat_dim,
                                                  cfg.ffeat_dim),
            }
        if cfg.fine_sa > 0:
            params["fine_sa"] = init_self_attention_block(
                keys[12], cfg.fine_sa, cfg.ffeat_dim, head_num=8,
                head_dim=cfg.ffeat_dim // 8, att_type=cfg.fsa_type)
        return params

    # ------------------------------------------------------------------
    def im_backbone(self, params, img_nhwc):
        """Convolutional trunk only -> (coarse 1/8 map, fine 1/2 map); see
        ``NeRFMatcherCoarse.im_backbone`` for why it is separable."""
        fmap_c, fmap_f = backbone_8_2_apply(
            self._maybe_bf16(params["backbone"]), self.backbone_cfg,
            self._maybe_bf16(img_nhwc))
        return fmap_c.astype(jnp.float32), fmap_f.astype(jnp.float32)

    def im_feat_from_fmap(self, params, fmaps):
        """Post-backbone image branch: proj -> sine PE -> self-attention."""
        cfg = self.cfg
        fmap_c, fmap_f = fmaps
        b, h, w, _ = fmap_c.shape
        cfeat = fmap_c.reshape(b, h * w, -1)
        if "cfeat_proj" in params:
            cfeat = linear(params["cfeat_proj"], cfeat)
        if "ffeat_proj" in params:
            fmap_f = linear(params["ffeat_proj"], fmap_f)
        if cfg.im_pe:
            from .position_encoding import add_sine_pe
            cfeat = add_sine_pe(cfeat.reshape(b, h, w, -1)).reshape(b, h * w, -1)
        if cfg.has_im_sa:
            sa = params["pt_sa"] if cfg.im_sa_type == "share" else params["im_sa"]
            cfeat = self_attention_block_apply(sa, cfeat, head_num=8)
        return cfeat, fmap_f

    def extract_im_feat_ms(self, params, img_nhwc):
        """-> (coarse tokens (B, M, cdim), fine map (B, Hf, Wf, fdim))."""
        return self.im_feat_from_fmap(params, self.im_backbone(params, img_nhwc))

    # ------------------------------------------------------------------
    def gather_fine_windows(self, params, fmap_f, im_cfeat, b_ids, i_ids,
                            identity_list: bool = False):
        """Gather W x W fine-feature windows at coarse match sites.

        fmap_f: (B, Hf, Wf, Cf); match list (L,) b_ids/i_ids over the (Hc*Wc)
        coarse grid (Hc/Wc derived from the fine map and ``fine_stride``).
        Window centers sit at
        (iy*stride, ix*stride) on the fine map; borders are zero-padded
        (equivalent to torch unfold with padding W//2).
        Returns (L, W*W, Cf).

        TPU note: all Hc*Wc windows are materialized once via W*W strided
        slices (backward = strided pad-adds), then the match list selects
        rows with :func:`take_rows` — a vmapped ``dynamic_slice`` would
        transpose to L serialized scatter-adds in the train backward.
        """
        cfg = self.cfg
        W = cfg.win_sz
        half = W // 2
        s = cfg.fine_stride
        B, Hf, Wf, Cf = fmap_f.shape
        Hc, Wc = Hf // s, Wf // s
        padded = jnp.pad(fmap_f, ((0, 0), (half, half), (half, half), (0, 0)))

        shifts = [padded[:, dy:dy + s * Hc:s, dx:dx + s * Wc:s, :]
                  for dy in range(W) for dx in range(W)]
        allw = jnp.stack(shifts, axis=3)                  # (B, Hc, Wc, WW, Cf)
        allw = allw.reshape(B * Hc * Wc, W * W * Cf)
        if identity_list:
            # Dense eval mode: the match list enumerates every token in
            # order, so the row gather is the identity — skip the ~46 MB
            # take_rows movement.
            wins = allw
        else:
            wins = take_rows(allw, b_ids * (Hc * Wc) + i_ids)
        wins = wins.reshape(wins.shape[0], W * W, Cf)
        if cfg.cat_c_feat and "fine_preprocess" in params:
            c_sel = take_rows_b(im_cfeat, b_ids, i_ids)   # (L, cdim)
            c_win = linear(params["fine_preprocess"]["down_proj"], c_sel)
            merged = linear(
                params["fine_preprocess"]["merge_feat"],
                jnp.concatenate(
                    [wins, jnp.broadcast_to(c_win[:, None, :],
                                            (*wins.shape[:2], c_win.shape[-1]))],
                    axis=-1))
            if cfg.use_merged_fine:
                wins = merged
            # else: reference behavior — merge computed, windows returned raw.
        return wins

    def fine_matching(self, params, pt_ffeat_sel, win_feat):
        """Point-vs-window subpixel regression.

        pt_ffeat_sel: (L, Cf); win_feat: (L, WW, Cf) -> expec_f (L, 3)
        [(x, y) in [-1, 1] window coords + heatmap std].
        """
        W = self.cfg.win_sz
        C = win_feat.shape[-1]
        # HIGHEST: subpixel coords come from this similarity's softmax (see
        # the dual_softmax precision note in ops/matching.py).
        sim = jnp.einsum("mc,mrc->mr", pt_ffeat_sel, win_feat,
                         precision=jax.lax.Precision.HIGHEST) / jnp.sqrt(C * 1.0)
        heat = jax.nn.softmax(sim, axis=1).reshape(-1, W, W)
        coords, std = heatmap_expectation_with_std(heat)
        return jnp.concatenate([coords, std[:, None]], axis=-1)

    # ------------------------------------------------------------------
    def forward_fine(self, params, fmap_f, im_cfeat, pt_cfeat, b_ids, i_ids,
                     j_ids, identity_list: bool = False):
        """Fine stage over a fixed-length match list -> expec_f (L, 3)."""
        pt_ffeat = pt_cfeat
        for lyr in params["pt_ffeat_proj"]:
            pt_ffeat = linear(lyr, pt_ffeat)
        pt_sel = take_rows_b(pt_ffeat, b_ids, j_ids)     # (L, Cf)
        wins = self.gather_fine_windows(params, fmap_f, im_cfeat, b_ids, i_ids,
                                        identity_list=identity_list)
        if "fine_sa" in params:
            wins = self._packed_window_sa(params, wins)
        return self.fine_matching(params, pt_sel, wins)

    def _packed_window_sa(self, params, wins):
        """Window self-attention with P windows PACKED per attention group.

        Per-window (T=win_sz^2=25)-token attention runs 25x16x25 batched
        matmuls — ~20% MXU row utilization and ~7 ms for 3600 windows.
        Packing P = 128 // T windows into one (P*T)-token group with a
        block-diagonal -inf logit bias is numerically EXACT (cross-window
        logits never survive the softmax) and fills the MXU tiles
        (measured ~4x faster).  LayerNorm/FFN/residuals are token-wise, so
        only the attention sees the packing.
        """
        cfg = self.cfg
        L, T, C = wins.shape
        P = max(1, 128 // T)
        if P == 1:
            return self_attention_block_apply(
                params["fine_sa"], wins, head_num=8, att_type=cfg.fsa_type)
        pad = (-L) % P
        w = jnp.pad(wins, ((0, pad), (0, 0), (0, 0)))
        w = w.reshape((L + pad) // P, P * T, C)
        eye = jnp.repeat(jnp.repeat(jnp.eye(P, dtype=jnp.float32), T, 0), T, 1)
        bias = (1.0 - eye) * -1e30                      # (P*T, P*T)
        w = self_attention_block_apply(
            params["fine_sa"], w, head_num=8, att_type=cfg.fsa_type,
            attn_bias=bias)
        return w.reshape(L + pad, T, C)[:L]

    def forward_match(self, params, img, pt_feat, pt3d, im_mask=None,
                      pt_mask=None, mutual: bool = False,
                      match_thres: float = 0.0, key=None,
                      match_list=None, ret_feats: bool = False, fmap=None):
        """Full c2f forward.

        ``match_list``: optional precomputed fixed-length (b_ids, i_ids,
        j_ids) dict (e.g. GT-padded during training).  When None, the fine
        stage runs over *every* image token with its best point (dense mode) —
        invalid tokens are masked downstream via ``valid``.

        Returns dict(conf_matrix, j_ids, mconf, valid, expec_f, fine list ids).
        """
        cfg = self.cfg
        im_cfeat, fmap_f = (self.im_feat_from_fmap(params, fmap)
                            if fmap is not None
                            else self.extract_im_feat_ms(params, img))
        pt_cfeat = self.extract_pt_feat(params, pt_feat, pt3d, key=key)
        im_cfeat, pt_cfeat = self.apply_coarse_former(params, im_cfeat, pt_cfeat)
        conf, im_n, pt_n = dual_softmax(
            im_cfeat, pt_cfeat, self.temperature(params), im_mask, pt_mask,
            temp_type=cfg.temp_type)
        matches = extract_mutual_matches(conf, mutual=mutual, threshold=match_thres)

        B, M = matches["j_ids"].shape

        if match_list is None:
            b_ids = jnp.repeat(jnp.arange(B, dtype=jnp.int32), M)
            i_ids = jnp.tile(jnp.arange(M, dtype=jnp.int32), B)
            j_ids = matches["j_ids"].reshape(-1)
        else:
            b_ids = match_list["b_ids"]
            i_ids = match_list["i_ids"]
            j_ids = match_list["j_ids"]

        expec_f = self.forward_fine(params, fmap_f, im_cfeat, pt_cfeat,
                                    b_ids, i_ids, j_ids,
                                    identity_list=match_list is None)
        out = dict(conf_matrix=conf, expec_f=expec_f,
                   fine_b_ids=b_ids, fine_i_ids=i_ids, fine_j_ids=j_ids,
                   **matches)
        if ret_feats:
            out["im_cfeat"] = im_n
            out["pt_cfeat"] = pt_n
        return out

    def eval_match_point_sharded(self, params, mesh, img, pt_feat, pt3d,
                                 im_mask=None, pt_mask=None,
                                 mutual: bool = False,
                                 match_thres: float = 0.0,
                                 top_k: int | None = None):
        """Point-axis-sharded c2f matching (overrides the coarse-only
        implementation, whose 'feats' program doesn't know about the fine
        map): the coarse (M, N) dual-softmax + mutual extraction shard
        over ``mesh`` (``parallel/point_sharding.py`` — the O(M*N) term
        that grows with merged multi-pair clouds), and the fine subpixel
        stage shards over the MATCH axis (every match's window gather +
        packed attention + dsnt is independent —
        ``make_sharded_fine_stage``), so Cambridge-scale top-k C2F scales
        on both axes.  Matches :meth:`eval_match` on the same inputs
        (tests/test_parallel.py)."""
        from .attention import fused_attention_scope
        from ..ops.matching import dense_to_match_lists
        from ..parallel.point_sharding import (make_sharded_fine_stage,
                                               sharded_point_match)

        cache = self.__dict__.setdefault("_eval_jit_cache", {})
        if ("feats_ms",) not in cache:
            def feats(params, fmap, pt_feat, pt3d):
                with fused_attention_scope(True, bf16=self.cfg.attn_bf16):
                    im_cfeat, fmap_f = self.im_feat_from_fmap(params, fmap)
                    pt_cfeat = self.extract_pt_feat(params, pt_feat, pt3d)
                    im_cfeat, pt_cfeat = self.apply_coarse_former(
                        params, im_cfeat, pt_cfeat)
                    return im_cfeat, pt_cfeat, fmap_f

            cache[("feats_ms",)] = jax.jit(feats)
        if ("fine_ps", mesh) not in cache:
            def fine_local(params, fmap_f, im_cfeat, pt_cfeat, b_ids, i_ids,
                           j_ids):
                with fused_attention_scope(True, bf16=self.cfg.attn_bf16):
                    return self.forward_fine(
                        params, fmap_f, im_cfeat, pt_cfeat, b_ids, i_ids,
                        j_ids, identity_list=False)

            cache[("fine_ps", mesh)] = make_sharded_fine_stage(
                mesh, fine_local)

        fmap = self._eval_jit("backbone", False, 0.0)(params, img)
        im_cfeat, pt_cfeat, fmap_f = cache[("feats_ms",)](
            params, fmap, pt_feat, pt3d)
        matches = sharded_point_match(
            mesh, im_cfeat, pt_cfeat, self.temperature(params), im_mask,
            pt_mask, temp_type=self.cfg.temp_type, mutual=mutual,
            threshold=match_thres)
        B, M = matches["j_ids"].shape
        b_ids = jnp.repeat(jnp.arange(B, dtype=jnp.int32), M)
        i_ids = jnp.tile(jnp.arange(M, dtype=jnp.int32), B)
        expec_f = cache[("fine_ps", mesh)](
            params, fmap_f, im_cfeat, pt_cfeat, b_ids, i_ids,
            matches["j_ids"].reshape(-1))
        out = dict(matches)
        out["expec_f"] = expec_f
        if top_k:
            out["lists"] = dense_to_match_lists(matches, top_k)
        return out

    def forward_multi_pair(self, params, img, pt_feat, pt3d, im_mask=None,
                           pt_mask=None, mutual: bool = False,
                           match_thres: float = 0.0, fmap=None,
                           pair_mesh=None):
        """Top-k retrieval pairs, device-resident (replaces the reference's
        per-pair host loop, ``nerfmatch_evaluator.py:150-230``): the two-scale
        image features are extracted ONCE, then the per-pair point path +
        coarse matching + dense fine stage run under ``lax.map`` over the
        pair axis (bounded memory).  pt tensors carry (B, K, N, .); returns
        stacked dense matches (K, B, M) + ``expec_f`` (K, B*M, 3).  With
        ``pair_mesh`` the pair axis is sharded over the mesh's data axis
        (parallel/pair_sharding.py)."""
        cfg = self.cfg
        im_cfeat0, fmap_f = (self.im_feat_from_fmap(params, fmap)
                             if fmap is not None
                             else self.extract_im_feat_ms(params, img))
        B, M = im_cfeat0.shape[0], im_cfeat0.shape[1]
        b_ids = jnp.repeat(jnp.arange(B, dtype=jnp.int32), M)
        i_ids = jnp.tile(jnp.arange(M, dtype=jnp.int32), B)

        def one_pair(args):
            ipt_feat, ipt3d, ipt_mask = args
            pt_cfeat = self.extract_pt_feat(params, ipt_feat, ipt3d)
            im_cfeat, pt_cfeat = self.apply_coarse_former(
                params, im_cfeat0, pt_cfeat)
            conf, _, _ = dual_softmax(
                im_cfeat, pt_cfeat, self.temperature(params), im_mask, ipt_mask,
                temp_type=cfg.temp_type)
            matches = extract_mutual_matches(conf, mutual=mutual,
                                             threshold=match_thres)
            expec_f = self.forward_fine(
                params, fmap_f, im_cfeat, pt_cfeat, b_ids, i_ids,
                matches["j_ids"].reshape(-1), identity_list=True)
            return {"j_ids": matches["j_ids"], "mconf": matches["mconf"],
                    "valid": matches["valid"], "expec_f": expec_f}

        pt_feat_k = jnp.swapaxes(pt_feat, 0, 1)
        pt3d_k = jnp.swapaxes(pt3d, 0, 1)
        pt_mask_k = (jnp.swapaxes(pt_mask, 0, 1) if pt_mask is not None
                     else jnp.ones(pt_feat_k.shape[:3], jnp.float32))
        args = (pt_feat_k, pt3d_k, pt_mask_k)
        if pair_mesh is not None and pair_mesh.devices.size > 1:
            from ..parallel.pair_sharding import map_pairs_sharded

            return map_pairs_sharded(pair_mesh, one_pair, args)
        return jax.lax.map(one_pair, args)

    def fine_coords(self, expec_f, mpt2d_c):
        """Window-normalized offsets -> image-resolution fine coords."""
        return mpt2d_c + expec_f[:, :2] * self.cfg.win_sz / 2 * self.cfg.fine_ds
