"""Fixed-shape coarse matching ops.

TPU-first redesign of the reference's dual-softmax matching
(``nerfmatch_coarse_trainer.py:223-234``) and mutual-match extraction
(``nerfmatch/modules/extract_matches.py:13-57``).  The reference produces
ragged ``(b_ids, i_ids, j_ids)`` lists whose length is data-dependent — a
recompilation/deadlock hazard under XLA.  Here every op returns dense
fixed-shape tensors with validity masks:

* :func:`extract_mutual_matches` returns per-image-token best point ids with
  a valid mask (one candidate per image token — identical support to the
  reference's row-major extraction, which also emits at most one match per
  image token via ``mask.max(dim=2)``);
* :func:`pad_matches_with_gt` implements the training-time GT padding with a
  *fixed* budget (``train_num = total * train_percent``) using categorical
  sampling, so the train step never changes shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def safe_normalize(f):
    """L2 normalize with a NaN-free gradient at the zero vector
    (jnp.linalg.norm's grad is NaN there; all-empty rays produce zero
    composited features).  Shared by the dense and point-sharded matchers —
    their bit-parity contract depends on identical epsilons."""
    return f / (jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True) + 1e-12)
                + 1e-6)


def dual_softmax(im_feat, pt_feat, temperature, im_mask=None, pt_mask=None,
                 temp_type: str = "mul"):
    """L2-normalized similarity -> temperature -> masked dual softmax.

    im_feat: (B, M, D); pt_feat: (B, N, D); masks: (B, M)/(B, N) in {0,1}.
    Returns (conf (B, M, N), im_feat_n, pt_feat_n).
    """
    _nrm = safe_normalize
    im_n = _nrm(im_feat)
    pt_n = _nrm(pt_feat)
    # HIGHEST: the similarity decides the matches; TPU's default f32 matmul
    # runs bf16 passes and shifts near-tie argmaxes (measured +3deg pose
    # error on a quantization-limited synthetic scene).  One (M, N, D)
    # matmul at 6-pass precision costs ~1 ms at production shapes.
    sim = jnp.einsum("bmd,bnd->bmn", im_n, pt_n,
                     precision=jax.lax.Precision.HIGHEST)
    sim = sim / temperature if temp_type == "div" else sim * temperature
    if im_mask is None:
        im_mask = jnp.ones(im_feat.shape[:2], sim.dtype)
    if pt_mask is None:
        pt_mask = jnp.ones(pt_feat.shape[:2], sim.dtype)
    valid = (im_mask[:, :, None] * pt_mask[:, None, :]) > 0
    sim = jnp.where(valid, sim, NEG_INF)
    conf = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)
    # Zero masked entries: with a fully-masked row/col the finite NEG_INF
    # fill would otherwise softmax to a uniform (nonzero) distribution and
    # fabricate "valid" matches out of masked-out tokens.
    conf = jnp.where(valid, conf, 0.0)
    return conf, im_n, pt_n


def extract_mutual_matches(conf, mutual: bool = True, threshold: float = 0.0):
    """Dense mutual-max match extraction.

    conf: (B, M, N) -> dict with
      j_ids  (B, M) int32 : best point index per image token,
      mconf  (B, M)       : its confidence (0 where invalid),
      valid  (B, M) bool  : token has a (mutual) above-threshold match.
    """
    mask = conf > threshold
    row_max = conf == jnp.max(conf, axis=2, keepdims=True)
    if mutual:
        col_max = conf == jnp.max(conf, axis=1, keepdims=True)
        mask = mask & row_max & col_max
    else:
        mask = mask & row_max

    masked_conf = jnp.where(mask, conf, 0.0)
    j_ids = jnp.argmax(masked_conf, axis=2).astype(jnp.int32)
    valid = jnp.any(mask, axis=2)
    mconf = jnp.take_along_axis(conf, j_ids[..., None], axis=2)[..., 0]
    mconf = jnp.where(valid, mconf, 0.0)
    return {"j_ids": j_ids, "mconf": mconf, "valid": valid}


def pad_matches_with_gt(key, matches, conf_gt, coarse_percent: float = 0.3,
                        train_percent: float = 0.3):
    """Fixed-budget train-time match list: predicted matches padded with GT.

    Reference behavior (``extract_matches.py:38-56``): collect
    ``train_num = B*min(M,N)*train_percent`` matches, at most
    ``train_num*coarse_percent`` predicted (sampled with replacement), the
    rest sampled from GT positives (with replacement); GT-sourced entries get
    mconf=0.  Here both budgets are static: if fewer predictions exist than
    the pred budget, the surplus slots also draw from GT.

    Returns dict(b_ids, i_ids, j_ids, mconf, is_pred) of length train_num.
    """
    B, M, N = conf_gt.shape
    total_pts = B * min(M, N)
    train_num = int(total_pts * train_percent)
    pred_budget = int(train_num * coarse_percent)

    k_pred, k_gt, k_mix = jax.random.split(key, 3)

    # --- predicted candidates: flatten (B, M) grid of per-token matches
    valid_flat = matches["valid"].reshape(-1)
    pred_logits = jnp.where(valid_flat, 0.0, NEG_INF)
    # Degenerate case (no predictions at all): sample uniformly, mask later.
    any_pred = jnp.any(valid_flat)
    pred_logits = jnp.where(any_pred, pred_logits, jnp.zeros_like(pred_logits))
    pred_pick = jax.random.categorical(k_pred, pred_logits, shape=(train_num,))
    pred_b = pred_pick // M
    pred_i = pred_pick % M
    pred_j = matches["j_ids"].reshape(-1)[pred_pick]
    pred_conf = matches["mconf"].reshape(-1)[pred_pick]

    # --- GT candidates: uniform over positives of conf_gt, sampled
    # hierarchically (row ~ positive count, then uniform column within the
    # row).  A flat categorical over the (B*M*N,) grid would generate
    # train_num x B*M*N Gumbel draws (~5e10 threefry ops for 3600x3600 —
    # seconds per step on the VPU); this is the same distribution with ~2e7.
    k_row, k_col = jax.random.split(k_gt)
    gt_pos = conf_gt.reshape(B * M, N) > 0
    row_w = jnp.sum(gt_pos, axis=1)                       # (B*M,)
    any_gt = jnp.any(row_w > 0)
    row_logits = jnp.where(row_w > 0, jnp.log(row_w.astype(jnp.float32)),
                           NEG_INF)
    row_logits = jnp.where(any_gt, row_logits, jnp.zeros_like(row_logits))
    row_pick = jax.random.categorical(k_row, row_logits, shape=(train_num,))
    col_logits = jnp.where(gt_pos[row_pick], 0.0, NEG_INF)  # (train_num, N)
    col_logits = jnp.where(any_gt, col_logits, jnp.zeros_like(col_logits))
    gt_j = jax.random.categorical(k_col, col_logits, axis=-1)
    gt_b = row_pick // M
    gt_i = row_pick % M

    # --- compose: first pred_budget slots prefer predictions (when they exist
    # and are valid picks), the rest take GT.
    slot = jnp.arange(train_num)
    use_pred = (slot < pred_budget) & any_pred & valid_flat[pred_pick]
    b_ids = jnp.where(use_pred, pred_b, gt_b).astype(jnp.int32)
    i_ids = jnp.where(use_pred, pred_i, gt_i).astype(jnp.int32)
    j_ids = jnp.where(use_pred, pred_j, gt_j).astype(jnp.int32)
    mconf = jnp.where(use_pred, pred_conf, 0.0)
    # GT slots are only meaningful when conf_gt has positives; with
    # any_gt False the uniform fallback draws are garbage and must be
    # masked out of the fine loss rather than supervised.
    valid = use_pred | any_gt
    return {"b_ids": b_ids, "i_ids": i_ids, "j_ids": j_ids, "mconf": mconf,
            "is_pred": use_pred, "valid": valid}


def dense_to_match_lists(matches, max_matches: int):
    """Convert dense per-token matches to fixed-length top-k lists per batch.

    Selects the ``max_matches`` highest-confidence valid tokens per image
    (padded with zeros + valid=False).  Returns dict(i_ids, j_ids, mconf,
    valid) each (B, max_matches).  Used at inference to bound the host->PnP
    transfer without a data-dependent shape.
    """
    mconf = matches["mconf"]
    B, M = mconf.shape
    k = min(max_matches, M)
    top_conf, top_i = jax.lax.top_k(mconf, k)
    top_j = jnp.take_along_axis(matches["j_ids"], top_i, axis=1)
    top_valid = jnp.take_along_axis(matches["valid"], top_i, axis=1)
    out = {"i_ids": top_i.astype(jnp.int32), "j_ids": top_j,
           "mconf": top_conf, "valid": top_valid & (top_conf > 0)}
    if k < max_matches:
        # Keep the promised fixed (B, max_matches) host-transfer shape
        # even when the image has fewer tokens than the budget.
        pad = max_matches - k
        out = {kk: jnp.pad(v, ((0, 0), (0, pad))) for kk, v in out.items()}
    return out
