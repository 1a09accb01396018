"""Train the bench scene: a production-dim mip-NeRF fit to a synthetic
INDOOR scene (emissive ball inside an enclosing shell), saved to
pretrained/synthetic_room_nerf.npz.

bench.py renders THIS checkpoint: a trained density field is the
production ``cache_scene_pts`` workload, whereas a random-init MLP is
almost uniformly transparent.  The scene is ENCLOSED on purpose: the
BASELINE config-1 workload is 7-Scenes chess — an indoor room where every
camera ray terminates on geometry (reference
`data/setup_7scenes.py` scenes are all interiors).  The earlier
open-background ball (round 3 first half) left ~2/3 of rays flying
through void forever — a density profile no localization scene has, and
one that artificially disabled the kernel's bounded early-ray-termination
on exactly the workload it exists for.  Scene: ball radius 0.3 at origin
(color = surface normal) inside a shell of radius 1.2 (color = inward
normal modulated by a smooth positional pattern); cameras on a radius-0.8
circle looking inward.

Run on the TPU: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/train_bench_scene.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerfmatch_tpu.nerf.renderer import NerfRenderer
from __graft_entry__ import _nerf_config

from nerfmatch_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # persistent XLA cache: reruns start warm

BALL_R = 0.3
SHELL_R = 1.2
CAM_R = 0.8
NEAR, FAR = 0.05, 2.1  # FAR covers cam->shell through the center (2.0)
CKPT = Path(__file__).resolve().parent.parent / "pretrained" / \
    "synthetic_room_nerf.npz"


def camera_rays(ang, h=64, w=64, focal=80.0, jitter_key=None):
    """Rays for a camera on the circle at angle ``ang`` looking at origin."""
    eye = np.array([CAM_R * np.cos(ang), 0.25 * np.sin(3 * ang),
                    CAM_R * np.sin(ang)])
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    i, j = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    dirs = (right[None, None] * (i - w / 2)[..., None] / focal
            + up2[None, None] * -(j - h / 2)[..., None] / focal
            + fwd[None, None])
    dirs = dirs.reshape(-1, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    n = len(dirs)
    o = np.broadcast_to(eye, (n, 3))
    radii = np.full((n, 1), 1.0 / focal / np.sqrt(3.0))
    rays = np.concatenate(
        [o, dirs, np.full((n, 1), NEAR), np.full((n, 1), FAR), dirs, radii],
        -1).astype(np.float32)
    return rays


def gt_colors(rays):
    """Analytic target: ball surface normal as rgb where the ray hits the
    ball, else the enclosing shell's inward normal modulated by a smooth
    positional pattern (every ray terminates — indoor scene).  Returns
    (rgb, ball_hit_mask)."""
    o, d = rays[:, :3], rays[:, 3:6]
    b = np.sum(o * d, axis=-1)
    c = np.sum(o * o, axis=-1) - BALL_R**2
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0
    p = o + t[:, None] * d
    normal = p / BALL_R
    ball_rgb = 0.5 * normal + 0.5
    # Shell: far root of |o + t d| = SHELL_R (cameras are inside, so the
    # forward intersection always exists).
    t_sh = -b + np.sqrt(np.maximum(b * b - (np.sum(o * o, -1) - SHELL_R**2),
                                   0.0))
    q = o + t_sh[:, None] * d
    n_in = -q / SHELL_R
    mod = 0.7 + 0.3 * np.sin(3.0 * q[:, 0:1]) * np.cos(3.0 * q[:, 2:3])
    shell_rgb = (0.5 * n_in + 0.5) * mod
    rgb = np.where(hit[:, None], ball_rgb, shell_rgb)
    return rgb.astype(np.float32), hit


def main(steps=3000, batch=8192, lr=2e-3, seed=0):
    from nerfmatch_tpu.ops.pallas.render_train import \
        make_fused_train_hierarchical

    renderer = NerfRenderer(_nerf_config(), stop_layer=3)
    params = renderer.init_params(jax.random.PRNGKey(seed))
    train_render = make_fused_train_hierarchical(renderer)

    rng = np.random.default_rng(seed)
    views = [camera_rays(a) for a in np.linspace(0, 2 * np.pi, 24,
                                                 endpoint=False)]
    all_rays = np.concatenate(views)
    all_rgb, hit = gt_colors(all_rays)
    print(f"train rays: {len(all_rays)} ({hit.mean():.0%} on the ball)")

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rays, rgbs, key):
        def loss_fn(p):
            out = train_render(p, rays, key)
            return (jnp.mean((out["rgb_fine"] - rgbs) ** 2)
                    + 0.5 * jnp.mean((out["rgb_coarse"] - rgbs) ** 2))
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, up), opt_state, loss

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(steps):
        idx = rng.choice(len(all_rays), batch, replace=False)
        key, k = jax.random.split(key)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(all_rays[idx]),
            jnp.asarray(all_rgb[idx]), k)
        if i % 50 == 0 or i == steps - 1:
            print(f"step {i}: loss={float(loss):.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = {"/".join(str(getattr(k, "key", getattr(k, "idx", "")))
                    for k in path): np.asarray(leaf)
           for path, leaf in flat}
    CKPT.parent.mkdir(exist_ok=True)
    np.savez_compressed(CKPT, **{k: v.astype(np.float16) for k, v in
                                 out.items()})
    print(f"saved {CKPT} ({CKPT.stat().st_size/1e6:.1f} MB)")


def load_params(renderer, path=CKPT):
    """Rebuild the params pytree from the saved fp16 leaves."""
    data = np.load(path)
    params = renderer.init_params(jax.random.PRNGKey(0))
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = []
    for p, leaf in flat:
        k = "/".join(str(getattr(x, "key", getattr(x, "idx", "")))
                     for x in p)
        leaves.append(jnp.asarray(data[k], jnp.float32))
    return jax.tree_util.tree_unflatten(treedef, leaves)


if __name__ == "__main__":
    main()
