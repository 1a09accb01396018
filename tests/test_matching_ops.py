"""Tests for fixed-shape matching ops, dsnt, and position encoding."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfmatch_tpu.ops.matching import (
    dual_softmax,
    extract_mutual_matches,
    pad_matches_with_gt,
    dense_to_match_lists,
)
from nerfmatch_tpu.ops.dsnt import (
    create_meshgrid,
    spatial_expectation2d,
    heatmap_expectation_with_std,
)
from nerfmatch_tpu.models.position_encoding import sine_position_encoding_2d


def test_dual_softmax_identity_features():
    """Matching identical feature sets: conf should peak on the diagonal."""
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(1, 10, 16)).astype(np.float32))
    conf, _, _ = dual_softmax(feat, feat, jnp.asarray(10.0))
    c = np.asarray(conf[0])
    assert np.all(np.argmax(c, axis=1) == np.arange(10))
    # Dual softmax product of two softmaxes -> in (0, 1); rows sum <= 1.
    assert np.all(c >= 0) and np.all(c <= 1)
    assert np.all(c.sum(1) <= 1 + 1e-5)


def test_dual_softmax_masking():
    rng = np.random.default_rng(1)
    im = jnp.asarray(rng.normal(size=(1, 6, 8)).astype(np.float32))
    pt = jnp.asarray(rng.normal(size=(1, 5, 8)).astype(np.float32))
    pt_mask = jnp.asarray([[1, 1, 0, 1, 0]], jnp.float32)
    conf, _, _ = dual_softmax(im, pt, jnp.asarray(10.0), pt_mask=pt_mask)
    c = np.asarray(conf[0])
    assert np.allclose(c[:, 2], 0, atol=1e-6)
    assert np.allclose(c[:, 4], 0, atol=1e-6)


def test_extract_mutual_matches_perfect():
    # conf with clear mutual diagonal.
    conf = jnp.asarray(np.eye(4, dtype=np.float32) * 0.9 + 0.01)[None]
    m = extract_mutual_matches(conf, mutual=True, threshold=0.1)
    assert np.array_equal(np.asarray(m["j_ids"][0]), np.arange(4))
    assert np.all(np.asarray(m["valid"][0]))
    assert np.allclose(np.asarray(m["mconf"][0]), 0.91)


def test_extract_mutual_matches_non_mutual_filtered():
    # Token 0 and 1 both prefer point 0; point 0 prefers token 0 -> token 1 invalid.
    conf = np.full((1, 2, 3), 0.01, np.float32)
    conf[0, 0, 0] = 0.9
    conf[0, 1, 0] = 0.8
    m = extract_mutual_matches(jnp.asarray(conf), mutual=True, threshold=0.1)
    valid = np.asarray(m["valid"][0])
    assert valid[0] and not valid[1]


def test_extract_matches_threshold():
    conf = np.full((1, 3, 3), 0.05, np.float32)
    np.fill_diagonal(conf[0], 0.09)
    m = extract_mutual_matches(jnp.asarray(conf), mutual=True, threshold=0.1)
    assert not np.any(np.asarray(m["valid"]))
    assert np.allclose(np.asarray(m["mconf"]), 0.0)


def test_pad_matches_with_gt_budget_and_composition():
    B, M, N = 2, 16, 16
    rng = np.random.default_rng(0)
    conf = rng.uniform(0, 0.2, (B, M, N)).astype(np.float32)
    for i in range(8):  # strong diagonal matches in batch 0
        conf[0, i, i] = 0.9
    conf_j = jnp.asarray(conf)
    matches = extract_mutual_matches(conf_j, mutual=True, threshold=0.3)
    conf_gt = np.zeros((B, M, N), np.float32)
    conf_gt[:, np.arange(M), np.arange(N)] = 1.0
    out = pad_matches_with_gt(jax.random.PRNGKey(0), matches,
                              jnp.asarray(conf_gt),
                              coarse_percent=0.3, train_percent=0.5)
    train_num = int(B * M * 0.5)
    assert out["b_ids"].shape == (train_num,)
    is_pred = np.asarray(out["is_pred"])
    # Pred slots bounded by budget.
    assert is_pred.sum() <= int(train_num * 0.3)
    assert is_pred.sum() > 0
    # GT-sourced entries have mconf == 0; all GT picks are true positives.
    mconf = np.asarray(out["mconf"])
    assert np.allclose(mconf[~is_pred], 0.0)
    b, i, j = (np.asarray(out["b_ids"]), np.asarray(out["i_ids"]),
               np.asarray(out["j_ids"]))
    assert np.all(conf_gt[b[~is_pred], i[~is_pred], j[~is_pred]] == 1.0)


def test_pad_matches_no_predictions():
    """Zero predicted matches must not break shapes (DDP-deadlock analogue)."""
    B, M, N = 1, 8, 8
    matches = {
        "j_ids": jnp.zeros((B, M), jnp.int32),
        "mconf": jnp.zeros((B, M)),
        "valid": jnp.zeros((B, M), bool),
    }
    conf_gt = np.zeros((B, M, N), np.float32)
    conf_gt[0, 2, 3] = 1.0
    out = pad_matches_with_gt(jax.random.PRNGKey(1), matches, jnp.asarray(conf_gt))
    assert not np.any(np.asarray(out["is_pred"]))
    # All slots fall back to the single GT match.
    assert np.all(np.asarray(out["i_ids"]) == 2)
    assert np.all(np.asarray(out["j_ids"]) == 3)


def test_dense_to_match_lists_topk():
    conf = np.zeros((1, 8), np.float32)
    conf[0, [1, 4, 6]] = [0.9, 0.7, 0.5]
    matches = {
        "j_ids": jnp.asarray(np.arange(8)[None] * 2, jnp.int32),
        "mconf": jnp.asarray(conf),
        "valid": jnp.asarray(conf > 0),
    }
    out = dense_to_match_lists(matches, max_matches=4)
    assert out["i_ids"].shape == (1, 4)
    assert list(np.asarray(out["i_ids"][0])[:3]) == [1, 4, 6]
    assert np.asarray(out["valid"][0]).sum() == 3


# ---------------------------------------------------------------------------
# dsnt
# ---------------------------------------------------------------------------

def test_spatial_expectation_delta():
    heat = np.zeros((1, 5, 5), np.float32)
    heat[0, 1, 3] = 1.0  # y=1, x=3
    coords = np.asarray(spatial_expectation2d(jnp.asarray(heat), True))
    grid = np.asarray(create_meshgrid(5, 5, True))
    assert np.allclose(coords[0], grid[1, 3], atol=1e-6)


def test_spatial_expectation_uniform_is_center():
    heat = np.full((1, 5, 5), 1 / 25, np.float32)
    coords = np.asarray(spatial_expectation2d(jnp.asarray(heat), True))
    assert np.allclose(coords[0], [0, 0], atol=1e-6)


def test_heatmap_std():
    # Delta -> zero-ish std; uniform -> larger std.
    delta = np.zeros((1, 5, 5), np.float32)
    delta[0, 2, 2] = 1.0
    _, std_d = heatmap_expectation_with_std(jnp.asarray(delta))
    uni = np.full((1, 5, 5), 1 / 25, np.float32)
    _, std_u = heatmap_expectation_with_std(jnp.asarray(uni))
    assert float(std_d[0]) < 1e-3
    assert float(std_u[0]) > 0.5


# ---------------------------------------------------------------------------
# position encoding
# ---------------------------------------------------------------------------

def test_sine_pe_structure():
    import math
    d, h, w = 16, 6, 8
    pe = np.asarray(sine_position_encoding_2d(d, h, w))
    assert pe.shape == (h, w, d)
    div0 = math.exp(0.0)  # first frequency
    # Channel 0: sin(x * f0) with x 1-indexed, constant along y.
    assert np.allclose(pe[:, 2, 0], math.sin(3 * div0), atol=1e-6)
    # Channel 2: sin(y * f0), constant along x.
    assert np.allclose(pe[3, :, 2], math.sin(4 * div0), atol=1e-6)
    # Channel 1: cos(x * f0).
    assert np.allclose(pe[0, 0, 1], math.cos(1 * div0), atol=1e-6)


# ---------------------------------------------------------------------------
# differentiable row gather (MXU backward)
# ---------------------------------------------------------------------------

def test_take_rows_matches_indexing_and_grad():
    import jax
    import jax.numpy as jnp
    from nerfmatch_tpu.ops.gather import take_rows, take_rows_b

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(40, 8)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 40, size=17), jnp.int32)
    assert np.allclose(np.asarray(take_rows(table, idx)),
                       np.asarray(table)[np.asarray(idx)])

    # Gradient parity vs plain indexing (includes repeated indices).
    w = jnp.asarray(rng.normal(size=(17, 8)), jnp.float32)
    g_mm = jax.grad(lambda t: jnp.sum(take_rows(t, idx) * w))(table)
    g_ref = jax.grad(lambda t: jnp.sum(t[idx] * w))(table)
    assert np.allclose(np.asarray(g_mm), np.asarray(g_ref), atol=1e-5)

    # Batched variant under jit.
    tb = table.reshape(4, 10, 8)
    b_ids = jnp.asarray([0, 3, 2], jnp.int32)
    r_ids = jnp.asarray([5, 9, 0], jnp.int32)
    out = jax.jit(take_rows_b)(tb, b_ids, r_ids)
    assert np.allclose(np.asarray(out),
                       np.asarray(tb)[np.asarray(b_ids), np.asarray(r_ids)])
