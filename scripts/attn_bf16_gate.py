"""attn_bf16 gate: exact-equality check + train-step timing on the TPU.

Planned as an int8-style end-to-end drift gate, the first run found
something better: on v5e the mode is numerically FREE.  The MXU's
DEFAULT precision already runs f32 dot operands as single-pass bf16
(the well-known TPU default-precision behavior), so the attention
kernels' dots were never f32 to begin with — explicitly casting the
operands to bf16 (`attn_bf16=True`) changes NOTHING numerically and
only halves the operand HBM/VMEM traffic.  Measured 2026-08-20:

  fwd/bwd max |delta| = 0.0 (bit-identical) at BOTH the e2e-gate shapes
  (L=S=256, D=8) and production shapes (L=3600, S=3712, D=32), for all
  of out/dq/dk/dv;
  c2f production train step: f32-attn 103.7 ms -> attn_bf16 102.4 ms
  (1.013x) — the freed cycles are traffic, not MXU passes.

A 40-epoch train-twice regression gate is therefore vacuous (identical
arithmetic -> identical trajectories — verified: epochs 1-3 losses
bit-equal); the honest gate is EXACT EQUALITY, which is stronger than
any drift bound.  This script IS that gate: PASS iff fwd+bwd are
bit-identical at gate and production shapes AND the bf16 step is not
slower.  It also re-times the step pair in one process (cross-process
variance is +-1-2 ms on this chip).

Implication recorded in PARITY: the attention kernels cannot be made
faster by dot precision — they are VPU-softmax/traffic-bound; the
next precision rung would be int8 attention, which WOULD change
numerics and would need the full e2e treatment.

Run: python scripts/attn_bf16_gate.py        (TPU; one axon client)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfmatch_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def time_train_step(bf16: bool):
    import dataclasses

    import optax

    from nerfmatch_tpu.models.attention import fused_attention_scope
    from nerfmatch_tpu.models.matcher_c2f import NeRFMatcherMS
    from scripts.matcher_roofline import (make_inputs, make_loss,
                                          model_config, scalarize)

    cfg = dataclasses.replace(model_config(), attn_bf16=bf16)
    model = NeRFMatcherMS(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    inp = make_inputs(2)
    loss = make_loss(model)
    opt = optax.adam(1e-4)

    @jax.jit
    def step(p, s, i):
        with fused_attention_scope(True, bf16=bf16):
            l, g = jax.value_and_grad(lambda q: loss(q, i))(p)
        up, s = opt.update(g, s, p)
        return scalarize((optax.apply_updates(p, up), s), l)

    state = opt.init(params)
    np.asarray(step(params, state, inp))  # compile + full fetch
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = step(params, state, inp)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / 10)
    return best * 1e3


def main():
    from nerfmatch_tpu.ops.pallas.attention_kernel import (_fused_bwd,
                                                           _fused_fwd)

    rng = np.random.default_rng(0)
    ok = True
    deltas = {}
    for (B, L, S, H, D, bl) in [(2, 256, 256, 8, 8, 128),
                                (2, 3600, 3712, 8, 32, 400)]:
        q = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32) * 0.3
        k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32) * 0.3
        v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
        d_f = float(np.abs(
            np.asarray(_fused_fwd(q, k, v, block_l=bl)) -
            np.asarray(_fused_fwd(q, k, v, block_l=bl, bf16=True))).max())
        d_b = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                  for a, b in zip(_fused_bwd(q, k, v, g, block_l=bl),
                                  _fused_bwd(q, k, v, g, block_l=bl,
                                             bf16=True)))
        deltas[f"L{L}_S{S}_D{D}"] = {"fwd": d_f, "bwd": d_b}
        print(f"[equality] L={L} S={S} D={D}: fwd max|d|={d_f} "
              f"bwd max|d|={d_b}", flush=True)
        ok &= d_f == 0.0 and d_b == 0.0

    t_f32 = time_train_step(False)
    t_bf16 = time_train_step(True)
    print(f"[timing] c2f train step: f32-attn {t_f32:.1f} ms -> attn_bf16 "
          f"{t_bf16:.1f} ms ({t_f32 / t_bf16:.3f}x)", flush=True)
    ok &= t_bf16 <= t_f32 * 1.01  # not slower (1% timing slack)

    print("GATE:", "PASS" if ok else "FAIL")
    Path("/tmp/attn_bf16_gate.json").write_text(json.dumps(
        {"deltas": deltas,
         "train_step_ms": {"f32": t_f32, "bf16": t_bf16},
         "pass": ok}, indent=1))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
