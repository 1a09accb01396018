"""Localization benchmark CLI.

Capability match for ``model_eval/benchmark_nerfmatch.py``: ckpt globbing by
feature-layer dir + model name, multi-seed runs, the full eval flag surface
(solver, rthres, iters, iNeRF, pair_topk, oracle, retrieval-only,
query2query), tag-keyed cache dirs, and cross-run score aggregation
(``merge_scene_metrics``).
"""

from __future__ import annotations

import argparse
from argparse import Namespace
from collections import defaultdict
from pathlib import Path

import numpy as np

from ..eval.match_evaluator import load_nerfmatch_from_ckpt
from ..utils.metrics import POSE_THRES, average_pose_metrics, \
    summarize_pose_statis


def merge_scene_metrics(cache_root, scenes, conf="rth10test_coarse_colmap",
                        runs=("results",), feats=None, print_out=False):
    """Aggregate cached per-scene results across feature dirs and runs."""
    scores = defaultdict(list)
    feats = feats or ["pt3d", "pe3d"] + [f"layer{i}" for i in range(1, 8)]
    for feat in feats:
        feat_dir = Path(cache_root) / feat
        if not feat_dir.exists():
            continue
        for tag in runs:
            cache_dir = feat_dir / tag
            metr_all = []
            for scene in scenes:
                cache_path = cache_dir / f"{scene}_{conf}.npy"
                if not cache_path.exists():
                    continue
                metrics = np.load(cache_path, allow_pickle=True).item()
                metr_all.append(summarize_pose_statis(
                    metrics, pose_thres=POSE_THRES.get(scene, [(5, 5)]),
                    t_unit="cm", t_scale=1e2, print_out=print_out))
            if metr_all:
                cells = ["/".join(f"{f[k]:.1f}" for k in
                                  ("t_med", "r_med", "recall"))
                         for f in metr_all]
                print(f"{feat}/{tag}: {cells}")
                avg = average_pose_metrics(metr_all)
                for k, v in avg.items():
                    scores[k].append(v)
    if not scores:
        # The eval cache tag always carries an iteration suffix
        # (``_cache_tag`` appends ``_itr{iters}``, like the reference
        # nerfmatch_evaluator.py:813) — a conf without it matches nothing.
        print(f"merge_scene_metrics: NO cache files matched "
              f"'*_{conf}.npy' under {cache_root} (did you forget the "
              f"'_itr<N>' suffix in conf?)")
    return scores


def eval_ckpt(args):
    evaluator = load_nerfmatch_from_ckpt(args.ckpt, args, arg_mask=args.mask)
    if not evaluator.coarse_only:
        evaluator.coarse_only = args.coarse_only

    data_conf = Namespace()
    if args.pair_topk > 1:
        data_conf = Namespace(dataset="NeRFMatchMultiPair",
                              sample_mode=args.sample_mode,
                              sample_pts=args.sample_pts,
                              pair_topk=args.pair_topk)
    if args.scene and "allscenes" in args.ckpt:
        data_conf.scenes = [args.scene]
    if args.scene_anno_path:
        data_conf.scene_anno_path = args.scene_anno_path

    inerf_conf = None
    if args.inerf:
        inerf_conf = Namespace(num_optim=args.inerf_optim, lrate=args.inerf_lr,
                               lrdecay=args.inerf_lrd,
                               eval_pose=args.inerf_pose, ds=args.inerf_ds,
                               use_match_loss=args.inerf_match_loss)

    return evaluator.eval_multi_scenes(
        rthres=args.rthres, center_subpixel=args.center_subpixel,
        solver=args.solver, split=args.split, mutual=args.mutual,
        match_thres=args.match_thres, iters=args.iters,
        nerf_path=args.nerf_path, test_pair_txt=args.test_pair_txt,
        scene_dir=args.scene_dir, data_conf=data_conf,
        query2query=args.query2query, ow_cache=args.ow_cache,
        inerf_conf=inerf_conf, debug=args.debug,
        cached_pt=not args.no_cache_pt, cache_dir=args.cache_dir,
        cache_iters=args.cache_iters, retrieval_only=args.retrieval_only,
        match_oracle=args.match_oracle, seed=args.seed,
        visualize=args.visualize, eval_bs=args.eval_bs)


def benchmark(args):
    if args.ckpts:
        ckpts = [Path(c) for c in args.ckpts]
    else:
        ckpt_dir = Path(args.ckpt_dir)
        pattern = (f"{args.model_name}.ckpt" if "allscenes" in str(ckpt_dir)
                   else f"*_{args.model_name}.ckpt")
        if args.feats:
            ckpts = []
            for k in args.feats:
                ckpts += list(ckpt_dir.glob(f"{k}/{pattern}"))
        else:
            ckpts = list(ckpt_dir.glob(f"*/{pattern}"))
        if args.scene:
            ckpts = [c for c in ckpts if args.scene in str(c)]
    print(f"Found {len(ckpts)} ckpts.")

    cache_tag = f"{args.cache_tag}_" if args.cache_tag else ""
    if args.model_name != "best":
        cache_tag += f"{args.model_name}_"
    for ckpt in ckpts:
        root = ckpt.parent
        if args.seeds:
            for i, seed in enumerate(args.seeds):
                args.ckpt = str(ckpt)
                args.cache_dir = root / f"{cache_tag}run{i}"
                args.seed = seed
                eval_ckpt(args)
        else:
            args.ckpt = str(ckpt)
            args.cache_dir = root / f"{cache_tag}results"
            args.seed = None
            eval_ckpt(args)


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--ckpt_dir", type=str, default=None)
    p.add_argument("--scene_anno_path", type=str, default=None)
    p.add_argument("--ckpts", type=str, nargs="*", default=[])
    p.add_argument("--model_name", type=str, default="best_tmed")
    p.add_argument("--coarse_only", action="store_true")
    p.add_argument("--mutual", action="store_true")
    p.add_argument("--query2query", action="store_true")
    p.add_argument("--match_thres", type=float, default=0.0)
    p.add_argument("--ow_cache", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--solver", type=str, default="colmap")
    p.add_argument("--rthres", type=float, default=10)
    p.add_argument("--center_subpixel", action="store_true")
    p.add_argument("--iters", type=int, default=1)
    p.add_argument("--nerf_path", type=str, default=None)
    p.add_argument("--test_pair_txt", type=str, default=None)
    p.add_argument("--scene_dir", type=str, default=None)
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--scene", type=str, default=None)
    p.add_argument("--pair_topk", type=int, default=1)
    p.add_argument("--sample_pts", type=int, default=-1)
    p.add_argument("--sample_mode", type=str, default=None)
    p.add_argument("--mask", type=str, default="default")
    p.add_argument("--cache_tag", type=str, default=None)
    p.add_argument("--inerf", action="store_true")
    p.add_argument("--inerf_optim", type=int, default=5)
    p.add_argument("--inerf_lr", type=float, default=0.001)
    p.add_argument("--inerf_lrd", action="store_true")
    p.add_argument("--inerf_ds", type=int, default=8)
    p.add_argument("--inerf_pose", action="store_true")
    p.add_argument("--inerf_match_loss", action="store_true")
    p.add_argument("--cache_iters", action="store_true")
    p.add_argument("--no_cache_pt", action="store_true")
    p.add_argument("--retrieval_only", action="store_true")
    p.add_argument("--match_oracle", action="store_true")
    p.add_argument("--point_shard", action="store_true",
                   help="Shard matching over the device mesh (merged "
                        "multi-pair point clouds): the coarse dual-softmax "
                        "splits over the POINT axis and, for c2f models, "
                        "the fine subpixel stage splits over the MATCH "
                        "axis (parallel/point_sharding.py; results equal "
                        "the dense path).")
    p.add_argument("--pair_shard", action="store_true",
                   help="Shard the pair axis of multi-pair matching over "
                        "the device mesh (separate top-k pairs).")
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--eval_bs", type=int, default=1,
                   help="queries per matcher/render dispatch (single-shot "
                        "AND --iters protocols; results identical). "
                        "--inerf/--match_oracle/--retrieval_only/"
                        "--visualize runs fall back to per-query bs=1, so "
                        "their localize_time stays a per-query number.")
    p.add_argument("--seeds", type=int, nargs="*", default=[])
    p.add_argument("--feats", type=str, nargs="*", default=[])
    return p


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()  # persistent XLA compile cache
    args = build_parser().parse_args(argv)
    benchmark(args)


if __name__ == "__main__":
    main()
