"""Point-axis-sharded coarse matching (net-new TPU design, SURVEY §5).

The reference computes the full O(M x N) dual-softmax on one device
(``nerfmatch_c2f_trainer.py:294-299``); with multi-pair retrieval the point
count grows as N*pair_topk (3600*10 on Cambridge) and the (M, N) confidence
matrix with it.  Here the POINT axis is sharded over the mesh: every device
holds the full M image tokens and an N/devices slice of the points, computes
its (M, N/d) block, and the cross-point softmax normalization + global
argmax ride ICI collectives (``pmax``/``psum``/``all_gather`` over (B, M)
row statistics — never the (M, N) matrix itself).

Semantics are bit-matched to :func:`nerfmatch_tpu.ops.matching.dual_softmax`
+ :func:`extract_mutual_matches` (tests/test_parallel.py asserts equality on
the 8-device CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.matching import NEG_INF, safe_normalize as _nrm


@functools.lru_cache(maxsize=32)
def _build_sharded(mesh, temp_type: str, mutual: bool, threshold: float,
                   axis: str):
    """Build (once per config) the jitted shard_map program.

    The eval loop calls ``sharded_point_match`` per query; rebuilding the
    shard_map closure every call would defeat jax's dispatch cache (keyed
    on function identity) and re-trace + re-lower the full program each
    time.  ``jax.sharding.Mesh`` is hashable, so lru_cache keys on it
    directly; shapes/dtypes are handled by the jit cache inside.
    """

    def local_fn(im_feat, pt_feat, im_mask, pt_mask, temperature):
        idx = jax.lax.axis_index(axis)
        Nl = pt_feat.shape[1]
        # HIGHEST precision for the same reason as ops.matching.dual_softmax:
        # the similarity decides argmax matches, and TPU's default bf16
        # passes shift near-ties (measured 11.2deg -> 4.9deg pose error).
        sim = jnp.einsum("bmd,bnd->bmn", _nrm(im_feat), _nrm(pt_feat),
                         precision=jax.lax.Precision.HIGHEST)
        sim = sim / temperature if temp_type == "div" else sim * temperature
        cell_valid = (im_mask[:, :, None] * pt_mask[:, None, :]) > 0
        sim = jnp.where(cell_valid, sim, NEG_INF)

        # softmax over M (image axis): every device holds all M rows of its
        # point columns — purely local.
        soft_m = jax.nn.softmax(sim, axis=1)
        # softmax over the GLOBAL point axis: max/sum ride ICI as (B, M)
        # row statistics.
        m_loc = jnp.max(sim, axis=2, keepdims=True)
        m_glob = jax.lax.pmax(m_loc, axis)
        e = jnp.exp(sim - m_glob)
        s_glob = jax.lax.psum(jnp.sum(e, axis=2, keepdims=True), axis)
        conf = soft_m * (e / s_glob)
        # Zero masked cells (match ops.matching.dual_softmax): at a
        # masked-row x masked-col cell both factors degenerate to uniform
        # softmaxes, so conf = (1/M)*(1/N) > 0 and fully-masked tokens
        # would fabricate "mutual matches".
        conf = jnp.where(cell_valid, conf, 0.0)

        # extract_mutual_matches semantics on the sharded conf:
        row_max_glob = jax.lax.pmax(jnp.max(conf, axis=2, keepdims=True), axis)
        mask = (conf > threshold) & (conf == row_max_glob)
        if mutual:
            # col max is over M — local per point column.
            mask = mask & (conf == jnp.max(conf, axis=1, keepdims=True))

        masked = jnp.where(mask, conf, 0.0)
        lv = jnp.max(masked, axis=2)                        # (B, M)
        la = jnp.argmax(masked, axis=2).astype(jnp.int32) + idx * Nl
        valid_l = jnp.any(mask, axis=2)

        all_lv = jax.lax.all_gather(lv, axis)               # (n_dev, B, M)
        all_la = jax.lax.all_gather(la, axis)
        all_valid = jax.lax.all_gather(valid_l, axis)
        # Unsharded argmax takes the FIRST max index; all_gather orders by
        # device = ascending global offset, and argmax picks the first max.
        dev = jnp.argmax(all_lv, axis=0)                    # (B, M)
        j_ids = jnp.take_along_axis(all_la, dev[None], axis=0)[0]
        mconf = jnp.take_along_axis(all_lv, dev[None], axis=0)[0]
        valid = jnp.any(all_valid, axis=0)
        mconf = jnp.where(valid, mconf, 0.0)
        return j_ids, mconf, valid

    # check_vma can't statically infer that the all_gather+argmax outputs
    # are replicated; they are (same reduction on every device).
    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(), P(None, axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_fine_stage(mesh, fine_local, axis: str = "data"):
    """Shard the C2F fine stage over the flat MATCH axis.

    Every match is independent (5x5 window gather + per-window packed
    attention + dsnt — ``matcher_c2f.forward_fine``), so the (L,) id lists
    shard over ``axis`` while params and the feature maps stay replicated;
    no collectives inside, one all-gather implied by the sharded->
    replicated output use.  The packed window attention is exact under
    sharding: its block-diagonal bias makes each window's result
    independent of which other windows share its packing group.

    ``fine_local(params, fmap_f, im_cfeat, pt_cfeat, b_ids, i_ids, j_ids)``
    -> (L, 3).  Returns a jitted fn of the same signature that pads L to
    the axis size and strips the padding.  Reference hot loop this scales:
    ``third_party/loftr/fine_matching.py:74-121`` (single-GPU).
    """
    n_dev = mesh.shape[axis]
    sh = jax.shard_map(
        fine_local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False)
    sh = jax.jit(sh)

    def call(params, fmap_f, im_cfeat, pt_cfeat, b_ids, i_ids, j_ids):
        L = b_ids.shape[0]
        pad = (-L) % n_dev
        if pad:
            b_ids = jnp.pad(b_ids, (0, pad))
            i_ids = jnp.pad(i_ids, (0, pad))
            j_ids = jnp.pad(j_ids, (0, pad))
        out = sh(params, fmap_f, im_cfeat, pt_cfeat, b_ids, i_ids, j_ids)
        return out[:L]

    return call


def sharded_point_match(mesh, im_feat, pt_feat, temperature, im_mask=None,
                        pt_mask=None, temp_type: str = "mul",
                        mutual: bool = True, threshold: float = 0.0,
                        axis: str = "data"):
    """Dual-softmax + mutual match extraction with points sharded on ``axis``.

    im_feat (B, M, D) replicated; pt_feat (B, N, D) sharded on dim 1
    (N must divide the axis size).  Returns the same dense match dict as
    ``extract_mutual_matches`` — j_ids are GLOBAL point indices — replicated.
    """
    B, M, _ = im_feat.shape
    N = pt_feat.shape[1]
    n_dev = mesh.shape[axis]
    assert N % n_dev == 0, f"point count {N} % mesh axis {n_dev} != 0"
    if im_mask is None:
        im_mask = jnp.ones((B, M), jnp.float32)
    if pt_mask is None:
        pt_mask = jnp.ones((B, N), jnp.float32)

    sharded = _build_sharded(mesh, temp_type, bool(mutual), float(threshold),
                             axis)
    pt_feat = jax.device_put(pt_feat, NamedSharding(mesh, P(None, axis, None)))
    pt_mask = jax.device_put(jnp.asarray(pt_mask, jnp.float32),
                             NamedSharding(mesh, P(None, axis)))
    j_ids, mconf, valid = sharded(
        im_feat, pt_feat, jnp.asarray(im_mask, jnp.float32), pt_mask,
        jnp.asarray(temperature, jnp.float32))
    return {"j_ids": j_ids, "mconf": mconf, "valid": valid}
