"""NeRF evaluation CLI (capability match for ``model_eval/eval_nerf.py``):
render-test-split / cache-scene-points / scaled-pose modes with ``#scene``
wildcard looping over dataset scene lists."""

from __future__ import annotations

import argparse
import os

from ..data.loading import CAMBRIDGE_LANDMARKS, SEVEN_SCENES
from ..eval.nerf_evaluator import load_nerf_from_ckpt

SCENES = {
    "cambridge": CAMBRIDGE_LANDMARKS,
    "7scenes": SEVEN_SCENES,
}


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--scene_anno_path", type=str, default=None)
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--feat_comb", type=str, default="lin")
    p.add_argument("--img_wh", type=int, nargs=2, default=[480, 480],
                   metavar=("W", "H"))
    p.add_argument("--downsample", type=int, default=1)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--scale_pose", type=float, default=None)
    p.add_argument("--cache_scene_pts", action="store_true")
    p.add_argument("--save_depth", action="store_true")
    p.add_argument("--mask", action="store_true")
    p.add_argument("--nums", type=int, default=-1)
    p.add_argument("--stop_layer", type=int, default=3)
    return p


def run_one(args):
    evaluator = load_nerf_from_ckpt(args.ckpt, args, mask=args.mask,
                                    frame_num=args.nums)
    if args.cache_scene_pts:
        return evaluator.cache_scene_pts(
            cache_dir=args.cache_dir, feat_comb=args.feat_comb,
            debug=args.debug)
    if args.scale_pose:
        return evaluator.eval_on_scaled_poses(pose_scale=args.scale_pose,
                                              debug=args.debug)
    return evaluator.eval_data_loader(None, save_depth=args.save_depth,
                                      cache_dir=args.cache_dir,
                                      debug=args.debug)


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()  # persistent XLA compile cache
    args = build_parser().parse_args(argv)
    if not args.dataset:
        return run_one(args)
    ckpt, cache_dir = args.ckpt, args.cache_dir
    ran = 0
    for scene in SCENES[args.dataset]:
        args.ckpt = ckpt.replace("#scene", scene)
        args.cache_dir = (cache_dir.replace("#scene", scene)
                          if cache_dir else None)
        if os.path.exists(args.ckpt):
            run_one(args)
            ran += 1
        else:
            print(f"eval_nerf: skipping {scene} — no checkpoint at "
                  f"{args.ckpt}")
    if ran == 0:
        raise SystemExit(f"eval_nerf: no checkpoint matched {ckpt!r} for "
                         f"any {args.dataset} scene — check the --ckpt "
                         f"template")


if __name__ == "__main__":
    main()
