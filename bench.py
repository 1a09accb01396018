"""Headline benchmark: mip-NeRF feature-render throughput (rays/sec).

Measures the production render path from the BASELINE protocol (config 1):
hierarchical mip render, 128 coarse + 128 fine samples/ray, 8x256 MLP with
viewdirs + layer-3 feature tap and along-ray feature compositing — i.e. the
``cache_scene_pts`` hot loop — on the attached TPU chip, using the fused
Pallas kernel path (``ops/pallas/render_kernel.py``, sample-blocked
schedule).

Since round 3 the weights are a TRAINED scene: the in-repo ENCLOSED
indoor checkpoint ``pretrained/synthetic_room_nerf.npz`` (ball inside a
textured shell, fit on-chip by ``scripts/train_bench_scene.py``), and the
rays come from eight held-out cameras of that scene.  Production renders
trained scenes — a random-init MLP's near-uniform transparent density is
not the production density profile — and the BASELINE config-1 workload
(7-Scenes) is all interiors where every ray terminates on geometry.
Measured same-chip delta: random-init and trained-scene weights time
within 1% at eps=0, so the trained weights are about representativeness;
the enclosed geometry is what early termination keys on (below).  Falls
back to random init (with a note) if the checkpoint is missing.  The
room checkpoint measures 28.93 dB on a held-out camera (identical at
eps=0 and eps=1e-4); the superseded open-background sphere checkpoint
(``synthetic_sphere_nerf.npz``, round-3 first half, PSNR 25.7 dB)
remains for history.

Timing methodology (device throughput, not tunnel throughput): the jitted
program materializes every production output (rgb/depth/acc/weights/feat/
pts for the fine stage) in HBM inside the fused kernels and returns one
scalar checksum over all of them.  Returning the raw arrays instead would
ship ~15 MB per call through the axon dev tunnel (~30 MB/s device->host),
which measures the tunnel, not the chip; no real deployment fetches render
buffers to the host per batch.  Dispatches are pipelined with a single
device fetch at the end; min over measurement rounds.

vs_baseline compares against an estimated PyTorch reference throughput on an
A100 for the same forward render.  The reference repo publishes no in-tree
number (SURVEY §6); this constant is the documented stand-in until a measured
A100 torch baseline replaces it.  Roofline context (measured on this chip,
scripts/mm_roofline.py + scripts/kernel_probe.py, min-of-rounds pipelined):

* per-ray work: coarse trunk 524k MACs/sample (heads skipped — only weights
  feed the resampler) + fine trunk+heads 639k MACs/sample, 128 samples each
  -> 298 MFLOP/ray;
* v5e bf16 peak 197 TFLOP/s -> speed-of-light 697k rays/s for this FLOP
  count; an 8-deep (2048, 256)x(256, 256) bf16 matmul chain in Pallas
  measures 78% MFU on this chip -> practical ceiling ~515k rays/s (17.9 ms
  per 9216-ray batch with zero encode/composite/resample cost);
* the fused path measures 22.0 ms per 9216-ray chunk (split-2 f32-accurate
  dots + cheap-layout cone moments + 8-chunk scan-grouped dispatch; 24.6 in
  round 2) = ~81% of that chain ceiling.  The measured residual decomposes
  as: coarse stage 11.1 ms vs 8.1 chain floor, fine 11.9 vs 9.9, resample
  0.6, tunnel dispatch ~0.5 after scan amortization; the per-stage overage
  is the serial VPU epilogue on the MLP critical path — IPE transcendentals
  0.85 ms/stage (already degree-minimal polynomials; builtin exp was 2.5x
  worse), bias/relu/cast ~0.1 ms each (measured by kernel variants,
  scripts/kernel_probe.py), compositing + moment extraction the rest.
  Cross-block software pipelining of that epilogue measured neutral-or-
  worse (round 2).  Early ray termination (early_term_eps=1e-4) IS the
  benchmarked default since round 4: it is the renderer's own eval-path
  default (RenderConfig.early_term_eps), and it is quality-gated
  END-TO-END — scripts/earlyterm_e2e_gate.py trains an enclosed indoor
  scene on-chip, runs the full localization pipeline (cache -> match ->
  PnP; single-shot and --iters 2 protocols) at eps=0 vs eps=1e-4, and
  measures IDENTICAL matches and pose errors (max per-query |dR| < 1e-4
  deg, equal recall) with a 1.86x cache-stage speedup.  On soft/
  transparent scenes the knob costs ~3-11% (earlyterm_quality.py) — set
  render.early_term_eps: 0 there.  This bench reports BOTH numbers: the
  default path in the JSON line, eps=0 as a "#" comment line.  Why this
  scene pays ~2-3% for eps while the e2e gate scene gains 1.86x — and
  why it is NOT the ray grid: scripts/earlyterm_workload_probe.py
  (round 5) measured the bench full-grid cameras vs the production
  ds=8-strided full-res grids on this same room scene and got identical
  skip yields (0.20 vs 0.19 FLOP-weighted) and identical eps cost
  (0.974x vs 0.973x).  The divergence is the SATURATION-DEPTH profile:
  block-granular skipping (all 16 rays x 32-sample block must go
  opaque) yields ~0.20 here because the room saturates late along the
  ray, vs first-block saturation on the gate scene.  Production
  7-Scenes interiors match the gate profile; the default follows
  production, and this bench honestly carries the residual cost in its
  headline (see PARITY "early ray termination" for the table);
* the A100 divisor: TF32 peak 156 TFLOP/s; public torch mip-NeRF evals run
  ~15-25% MFU (chunked MLP, unfused encode/compositing, framework overhead)
  -> 75-125k rays/s; REF_RAYS_PER_SEC = 100k is the midpoint.  Two
  measured anchors back it: (a) same-chip — this repo's UNFUSED
  whole-graph XLA path (the closest stand-in for a framework-compiled
  reference) runs 194k rays/s on the same v5e chip (checksum
  methodology); torch eager on A100 sits below a fully-fused XLA program,
  so 100k is, if anything, generous to the reference.  (b) same-host
  CPU (scripts/ref_cpu_baseline.py, round 4): the ACTUAL reference
  renderer (imported from /root/reference, torch CPU, 1 thread) measures
  144.5 rays/s at this exact workload vs 170 rays/s for our unfused XLA
  path on the same core — a 1.18x framework-vs-framework ratio with zero
  hardware estimation in it, confirming torch eager sits slightly BELOW
  a whole-graph XLA program per unit of hardware.  Scaling 144.5 rays/s
  by the A100/1-core-CPU compute ratio (~1000-1500x peak f32) brackets a
  perfect-scaling ceiling of 145-220k rays/s; at the 15-25% realized MFU
  public torch NeRF evals show, the 100k midpoint stands
  (BASELINE_cpu_anchor.json records the measurement).

Prints the measured-anchor context as "#" lines, then ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from nerfmatch_tpu.nerf.renderer import NerfRenderer
from nerfmatch_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # persistent XLA cache: reruns start warm
from nerfmatch_tpu.ops.pallas.render_kernel import make_fused_hierarchical
from __graft_entry__ import _example_rays, _nerf_config

REF_RAYS_PER_SEC = 100_000.0  # estimated PyTorch A100 forward render


def _wait_for_device(max_wait_s: float = 1200.0) -> None:
    """Bounded wait for the TPU backend.

    When the axon tunnel is down, ``jax.devices()`` HANGS instead of
    erroring — an unattended bench run would then produce no output at
    all.  Probe device init in a SUBPROCESS (so a hang is killable and the
    chip is released before this process attaches), retry for up to
    ``max_wait_s``, then fail loudly."""
    import subprocess
    import sys

    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; assert jax.devices()"],
                timeout=120, capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            raise RuntimeError(
                f"device backend unreachable after {max_wait_s:.0f}s "
                f"({attempt} probes) — axon tunnel down?")
        print(f"# device probe {attempt} failed; retrying in 30s", flush=True)
        time.sleep(30)


def main():
    _wait_for_device()
    renderer = NerfRenderer(_nerf_config(), stop_layer=3)

    batch = 9216  # reference train/eval ray batch (configs/nerf/*.yaml)
    scan_g = 8    # chunks per dispatch (renderer.fused_predict default)
    try:
        from scripts.train_bench_scene import camera_rays, load_params

        params = load_params(renderer)
    except (FileNotFoundError, ImportError, OSError) as e:
        # ONLY a missing checkpoint/module downgrades to random init;
        # programming errors must fail the benchmark, not silently swap
        # the workload.
        print(f"# trained bench scene unavailable ({e}); random-init weights")
        params = renderer.init_params(jax.random.PRNGKey(0))
        rays = jnp.stack([jnp.asarray(_example_rays(batch))] * scan_g)
    else:
        # Eight distinct held-out cameras — the scene-cache workload renders
        # every view of a split, many chunks per dispatch (fused_predict
        # scan grouping); the bench mirrors that production shape.
        rays = jnp.stack([
            jnp.asarray(camera_rays(0.13 + 0.31 * k, h=96, w=96, focal=120.0))
            for k in range(scan_g)])
        assert rays.shape[1] == batch

    # The serving int8 mode (gate-approved default; "none" until the e2e
    # quality gate passes — see PARITY "int8 serving mode").  The headline
    # measures the mode production cache-serving runs with; the f32/bf16
    # path is printed as a comment when int8 is the default.
    from nerfmatch_tpu.nerf.renderer import SERVING_INT8_DEFAULT

    act_scales = None
    if SERVING_INT8_DEFAULT != "none":
        from nerfmatch_tpu.ops.pallas.quant import calibrate_act_scales

        act_scales = calibrate_act_scales(
            renderer, params, np.asarray(rays[0][:1024]))

    def build_step(eps, int8=SERVING_INT8_DEFAULT):
        kw = ({} if int8 == "none"
              else dict(trunk_int8=int8, act_scales=act_scales))
        render, pack = make_fused_hierarchical(renderer, early_term_eps=eps,
                                               **kw)
        wc, wf = pack(params)

        @jax.jit
        def step(rays):
            # One scalar depending on every output: keeps all kernel work
            # and HBM writes live while fetching 8 bytes not ~15 MB/chunk.
            def body(c, r):
                out = render(wc, wf, r)
                return c + sum(jnp.sum(v) for v in out.values()), None

            return jax.lax.scan(body, 0.0, rays)[0]

        return step

    def measure(step, iters=10, rounds=3):
        np.asarray(step(rays))  # warmup/compile + fetch (full execution)
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = step(rays)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / iters / scan_g)
        return batch / best

    # Production default: the renderer's own eval path (early termination
    # and the int8 serving mode both quality-gated end-to-end,
    # scripts/earlyterm_e2e_gate.py + scripts/int8_e2e_gate.py).
    eps = renderer.cfg.early_term_eps
    rays_per_sec = measure(build_step(eps))
    # Context: the no-early-termination path (soft/transparent scenes).
    rps_eps0 = measure(build_step(0.0), iters=5, rounds=2) if eps else None
    if rps_eps0:
        print(f"# eps=0 (no early termination): {rps_eps0:,.0f} rays/s; "
              f"default path (eps={eps:g}): {rays_per_sec:,.0f}")
    if SERVING_INT8_DEFAULT != "none":
        rps_f32 = measure(build_step(eps, int8="none"), iters=5, rounds=2)
        print(f"# serving mode trunk_int8={SERVING_INT8_DEFAULT} (gate-"
              f"approved default): {rays_per_sec:,.0f} rays/s; f32-trunk "
              f"path: {rps_f32:,.0f}")
    try:
        import pathlib
        anchor = json.loads(pathlib.Path(__file__).with_name(
            "BASELINE_cpu_anchor.json").read_text())
        print(f"# measured same-host anchor: reference torch CPU "
              f"{anchor['ref_torch_cpu_rays_per_sec']} rays/s vs ours-XLA "
              f"{anchor['ours_xla_cpu_rays_per_sec']} "
              f"({anchor['same_host_ratio']}x); A100 divisor stays the "
              f"documented {REF_RAYS_PER_SEC:,.0f} estimate")
    except (FileNotFoundError, KeyError, ValueError):
        pass
    print(json.dumps({
        "metric": "nerf_feature_render_throughput",
        "value": round(rays_per_sec, 1),
        "unit": "rays/sec",
        "vs_baseline": round(rays_per_sec / REF_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
