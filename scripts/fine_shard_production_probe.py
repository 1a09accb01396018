"""Production-shape probe of the point+match-axis-sharded C2F eval.

VERDICT r4 item 7: ``make_sharded_fine_stage`` was equality-tested at a
merged top-k=10 cloud but only at tiny token counts; this probe runs the
REAL Cambridge multi-pair shape on the 8-device CPU mesh and asserts
sharded == dense:

* image 480x480 -> M = 3600 coarse tokens (model_ds 8, the reference
  eval grid, ``model_eval/README.md:54-141``),
* N = 36000 points (pair_topk=10 merged retrieval cloud,
  ``configs/nerfmatch/nerfmatch_cambridge_c2f.yaml``),
* production post-backbone dims: cfeat 256 / pt_dim 256 / ffeat 128 /
  win_sz 5 / cat_c_feat (``nerfmatch_7scenes_sfm_c2f.yaml``),
* top_k = 2048 fixed-length match lists (the evaluator contract).

The backbone is the 'tiny' stand-in and pt_sa=0: both run OUTSIDE the
sharded stages (the backbone and the point branch are the SAME dense
program in both paths — ``eval_match_point_sharded`` reuses the dense
``feats_ms`` extractor), so swapping them scales probe wall-clock
without touching what is being verified.  Full-dim backbone parity has
its own torch oracle (tests/test_matcher_parity_fullsize.py).

Timing note: the 8 CPU "devices" share this host's ONE core, so
sharded-vs-dense wall-clock here measures serialization overhead, not
the ICI speedup; the structural numbers that transfer to a real mesh
are the per-device splits printed below (points 36000 -> 4500/device in
the dual-softmax; matches 3600 -> 450/device in the fine stage) and the
collective payloads ((B, M) row stats + one match-axis all-gather —
never the (M, N) matrix).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo python scripts/fine_shard_production_probe.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

# The container's sitecustomize pins JAX_PLATFORMS=axon; override through
# jax.config AFTER import (same pattern as tests/conftest.py) — XLA_FLAGS
# must still be set before the CPU client spins up.
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

M_DS = 8
HW = 480            # eval protocol input -> 3600 coarse tokens
TOPK_PAIRS = 10     # Cambridge retrieval top-k -> merged cloud size
N_PTS = (HW // M_DS) ** 2 * TOPK_PAIRS
TOP_K_LISTS = 2048  # evaluator max_matches


def main():
    from nerfmatch_tpu.models.matcher_c2f import (C2FMatcherConfig,
                                                  NeRFMatcherMS)
    from nerfmatch_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8, jax.devices()

    cfg = C2FMatcherConfig(
        backbone="tiny", pretrained=False, cfeat_dim=256, pt_dim=256,
        ffeat_dim=128, im_pe=True, im_sa=1, im_sa_type="share", pt_sa=0,
        pt_sa_type="full", pt_pe=True, coarse_layers=1, fine_sa=1,
        fsa_type="full", win_sz=5, cat_c_feat=True,
        fused_attention_train=False)
    model = NeRFMatcherMS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(11)
    bs, m = 1, (HW // M_DS) ** 2
    img = jnp.asarray(rng.uniform(0, 1, (bs, HW, HW, 3)), jnp.float32)
    pt_feat = jnp.asarray(rng.normal(size=(bs, N_PTS, 256)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(bs, N_PTS, 3)), jnp.float32)
    im_mask = jnp.asarray(rng.uniform(size=(bs, m)) > 0.05, jnp.float32)
    pt_mask = jnp.asarray(rng.uniform(size=(bs, N_PTS)) > 0.05, jnp.float32)

    kw = dict(im_mask=im_mask, pt_mask=pt_mask, mutual=True,
              top_k=TOP_K_LISTS)

    def run(fn, label, *args):
        out = jax.block_until_ready(fn(*args, **kw))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(3):
            out = jax.block_until_ready(fn(*args, **kw))
        dt = (time.perf_counter() - t0) / 3
        print(f"{label}: {dt * 1e3:.0f} ms/query (warm, 1-core host)",
              flush=True)
        return out, dt

    ref, t_dense = run(lambda *a, **k: model.eval_match(params, *a, **k),
                       "dense eval_match", img, pt_feat, pt3d)
    mesh = make_mesh(data=8)
    got, t_shard = run(
        lambda *a, **k: model.eval_match_point_sharded(
            params, mesh, *a, **k),
        "point+match-sharded", img, pt_feat, pt3d)

    # --- equality (same asserts as tests/test_parallel.py, production M/N) ---
    v = np.asarray(ref["valid"])
    assert np.array_equal(np.asarray(got["valid"]), v)
    assert np.array_equal(np.asarray(got["j_ids"])[v],
                          np.asarray(ref["j_ids"])[v])
    assert np.allclose(np.asarray(got["mconf"]), np.asarray(ref["mconf"]),
                       atol=1e-6)
    e_ref = np.asarray(ref["expec_f"]).reshape(bs, m, 3)
    e_got = np.asarray(got["expec_f"]).reshape(bs, m, 3)
    assert np.allclose(e_got[v], e_ref[v], atol=1e-5)
    lv = np.asarray(ref["lists"]["valid"])
    for k in ("i_ids", "j_ids", "valid"):
        assert np.array_equal(np.asarray(got["lists"][k])[lv],
                              np.asarray(ref["lists"][k])[lv]), k

    n_dev = mesh.shape["data"]
    print(f"EQUAL at production shape: M={m} tokens, N={N_PTS} points "
          f"(top-k={TOPK_PAIRS} merged), win={cfg.win_sz}, "
          f"{int(v.sum())} valid matches, top_k lists={TOP_K_LISTS}")
    print(f"per-device split: coarse dual-softmax {N_PTS} -> "
          f"{N_PTS // n_dev} points/device "
          f"((M,N/d) block {m}x{N_PTS // n_dev} = "
          f"{m * (N_PTS // n_dev) * 4 / 2**20:.0f} MB vs dense "
          f"{m * N_PTS * 4 / 2**20:.0f} MB); fine stage {bs * m} -> "
          f"{bs * m // n_dev} matches/device")
    print(f"wall-clock on this 1-core host (8 virtual devices serialize): "
          f"dense {t_dense * 1e3:.0f} ms vs sharded {t_shard * 1e3:.0f} ms")
    print("FINE-SHARD PRODUCTION PROBE OK")


if __name__ == "__main__":
    main()
