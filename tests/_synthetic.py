"""Shared synthetic-scene builder for data/trainer/evaluator tests."""

import json

import numpy as np
from PIL import Image

from nerfmatch_tpu.data.loading import frame_cache_name

W = H = 64
N_FRAMES = 12
DS = 8
N_PTS = (W // DS) * (H // DS)
FEAT_DIM = 16


def look_at(eye):
    eye = np.asarray(eye, float)
    fwd = -eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, fwd, eye
    return c2w


def build_scene(root, n_frames=N_FRAMES, cam_radius=2.0, correlated_feats=False):
    """Write a synthetic scene: images, annotations, scene-point caches,
    retrieval pairs.  With ``correlated_feats``, point features are a fixed
    function of 3D position so matching is learnable across frames."""
    rng = np.random.default_rng(0)
    data_dir = root / "toy"
    (data_dir / "seq-01").mkdir(parents=True, exist_ok=True)
    cache_dir = root / "scene_cache"
    cache_dir.mkdir(exist_ok=True)

    K = [[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]
    unnorm = np.eye(4) * 2.0
    unnorm[3, 3] = 1.0
    feat_proj = rng.normal(size=(3, FEAT_DIM))

    frames = []
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        c2w = look_at([cam_radius * np.cos(ang), 0.3, cam_radius * np.sin(ang)])
        fname = f"seq-01/frame-{i:03d}.color.png"
        img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
        Image.fromarray(img).save(data_dir / fname)
        frames.append(dict(file_path=fname, intrinsics=K, height=H, width=W,
                           transform_matrix=c2w.tolist()))
        xs, ys = np.meshgrid(np.linspace(-0.5, 0.5, W // DS),
                             np.linspace(-0.5, 0.5, H // DS))
        pcam = np.stack([xs, ys, np.full_like(xs, cam_radius)], -1).reshape(-1, 3)
        pt3d = pcam @ c2w[:3, :3].T + c2w[:3, 3]
        if correlated_feats:
            feat = np.sin(pt3d @ feat_proj * 3.0)
        else:
            feat = rng.normal(size=(len(pt3d), FEAT_DIM))
        np.save(cache_dir / f"{frame_cache_name(fname)}.npy",
                {"pt3d": pt3d.astype(np.float32),
                 "unnorm_scene": unnorm.astype(np.float32),
                 "pt_feat": feat.astype(np.float32),
                 "pt_color": rng.uniform(0, 1, (len(pt3d), 3)).astype(np.float32),
                 "cam2scene": np.asarray(
                     np.linalg.inv(unnorm) @ c2w, np.float32)},
                allow_pickle=True)

    for split in ["train", "test"]:
        (data_dir / f"transforms_{split}.json").write_text(
            json.dumps({"frames": frames}))
    lines = []
    for i in range(n_frames):
        for di in (1, 2):
            lines.append(f"{frames[i]['file_path']} "
                         f"{frames[(i + di) % n_frames]['file_path']}")
    (root / "pairs.txt").write_text("\n".join(lines))
    return dict(root=root, data_dir=data_dir, cache_dir=cache_dir,
                frames=frames, K=np.asarray(K), unnorm=unnorm)
