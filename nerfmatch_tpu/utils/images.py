"""Host-side image utilities (depth colorization, encode/decode).

Numpy/PIL equivalents of ``nerfmatch/utils/images.py`` (colormaps via cv2
when available, matplotlib-free fallback otherwise).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def img2int8(img):
    img = np.asarray(img)[..., :3]
    return (255 * np.clip(img, 0, 1)).astype(np.uint8)


def colorize_depth(depth, force_min=None, force_max=None):
    """Depth map -> (H, W, 3) uint8 JET-colormapped image."""
    depth = np.nan_to_num(np.asarray(depth, np.float64))
    mi = depth.min() if force_min is None else force_min
    ma = depth.max() if force_max is None else force_max
    d = np.clip((depth - mi) / max(ma - mi, 1e-8), 0, 1)
    d8 = (255 * d).astype(np.uint8)
    try:
        import cv2

        return cv2.applyColorMap(d8, cv2.COLORMAP_JET)[..., ::-1]
    except Exception:
        # Simple blue->red ramp fallback.
        r = d8
        b = 255 - d8
        g = (255 - np.abs(d8.astype(int) * 2 - 255)).astype(np.uint8)
        return np.stack([r, g, b], axis=-1)


def depth2img(depth, max_val):
    depth = np.asarray(depth).squeeze()
    return (255 - depth / max_val * 255).astype(np.uint8)


def img2depth(depth_img, max_val, bg_val: float = 0.0, bg_mask=None):
    if isinstance(depth_img, Image.Image):
        depth_img = np.array(depth_img)
    if depth_img.ndim > 2:
        depth_img = depth_img[..., 0]
    depth = max_val * ((255 - depth_img) / 255)
    if bg_mask is not None:
        depth[~bg_mask] = bg_val
    return depth


def save_depth_as_img(path, raw_depth, max_val=None):
    import imageio

    if max_val:
        depth = depth2img(raw_depth, max_val)
    else:
        depth = colorize_depth(raw_depth)
    imageio.imwrite(path, depth)


def load_depth_from_img(depth_path, max_val, img_wh=None, bg_val: float = 0.0,
                        bg_mask=None):
    depth = Image.open(depth_path)
    if img_wh:
        depth = depth.resize(tuple(img_wh), Image.LANCZOS)
    return img2depth(depth, max_val, bg_val=bg_val, bg_mask=bg_mask)
