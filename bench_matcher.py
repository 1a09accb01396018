"""Secondary benchmark: c2f matcher throughput (image-pairs/sec).

Production shapes from the BASELINE protocol: 480x480 query image ->
ConvFormer-B36 two-scale features, 3600 image tokens vs 3600 NeRF points,
dual-softmax + mutual extraction + fine subpixel refinement.  Prints one
JSON line (same schema as bench.py) — kept separate so the driver's
headline metric stays rays/sec.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from nerfmatch_tpu.models.matcher_c2f import C2FMatcherConfig, NeRFMatcherMS

REF_PAIRS_PER_SEC = 10.0  # reference "Avg match time" scale on V100 (~100ms)


def main():
    cfg = C2FMatcherConfig(
        backbone="convformer384", pretrained=False, cfeat_dim=256,
        ffeat_dim=128, pt_dim=256, im_pe=True, im_sa=3, im_sa_type="share",
        pt_sa=3, pt_pe=True, post_pt_pe=True, coarse_layers=1,
        cformer_type="crs", fine_sa=1, win_sz=5)
    model = NeRFMatcherMS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    H = W = 480
    N = 3600
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    pt_feat = jnp.asarray(rng.normal(size=(1, N, 256)), jnp.float32)
    pt3d = jnp.asarray(rng.normal(size=(1, N, 3)) * 0.3, jnp.float32)

    @jax.jit
    def match(params, img, pt_feat, pt3d):
        out = model.forward_match(params, img, pt_feat, pt3d, mutual=True)
        return out["j_ids"], out["mconf"], out["valid"], out["expec_f"]

    out = match(params, img, pt_feat, pt3d)
    np.asarray(out[0])  # sync (axon async dispatch)

    # Amortized pipelined timing; single fetch at the end.
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = match(params, img, pt_feat, pt3d)
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / iters

    pairs_per_sec = 1.0 / dt
    print(json.dumps({
        "metric": "c2f_match_throughput",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec",
        "vs_baseline": round(pairs_per_sec / REF_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
