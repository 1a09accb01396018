"""Evaluation / inference runtimes."""

from .nerf_evaluator import (
    NerfEvaluator,
    load_nerf_from_ckpt,
    load_nerf_render_from_ckpt,
    load_scene_normalization,
)
from .match_evaluator import NeRFMatchEvaluator, load_nerfmatch_from_ckpt
