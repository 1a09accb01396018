"""NeRFMatch localization evaluator.

Capability match for ``nerfmatch/nerfmatch_evaluator.py``: loads a matcher
ckpt (auto coarse-vs-c2f by ``ffeat_dim`` presence), per-query localization
(optional on-the-fly NeRF render at the current pose estimate -> match ->
host PnP), iterative refinement (``iters``), retrieval-only / query2query /
match-oracle ablation modes, iNeRF gradient pose refinement (see
:mod:`.inerf`), wall-clock timers, the multi-scene driver with tag-keyed
result caches and recall/AUC summaries.

Device/host split: matching runs as one jitted program on TPU; only the
final fixed-size top-k match lists transfer to the host for the C++ PnP
solver.
"""

from __future__ import annotations

import os
import time
from argparse import Namespace
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import merge_configs
from ..data import init_data_loader
from ..data.loaders import init_mixed_dataset, init_multiscene_dataset, DataLoader
from ..models.matcher_c2f import C2FMatcherConfig, NeRFMatcherMS
from ..models.matcher_coarse import CoarseMatcherConfig, NeRFMatcherCoarse
from ..utils import get_logger
from ..utils.geometry import pose_err
from ..utils.metrics import POSE_THRES, average_pose_metrics, \
    summarize_pose_statis
from ..pose import estimate_pose
from ..train.checkpoint import convert_torch_params, load_checkpoint, \
    load_torch_state_dict
from .nerf_evaluator import load_nerf_render_from_ckpt

logger = get_logger(level="INFO", name="nerfmatch_eval")


def update_paths(conf, root_dir):
    conf.data_dir = os.path.join(root_dir, conf.data_dir)
    conf.scene_dir = os.path.join(root_dir, conf.scene_dir)
    conf.train_pair_txt = os.path.join(root_dir, conf.train_pair_txt)
    conf.test_pair_txt = os.path.join(root_dir, conf.test_pair_txt)


def parse_nerf_stop_layer(scene_dir: str) -> int:
    """Feature layer from the scene-dir tag (``.../inter_layer3/...``)."""
    parts = str(scene_dir).split("inter_layer")
    if len(parts) == 2:
        return int(parts[1].split("/")[0])
    return -1


def load_nerfmatch_from_ckpt(ckpt_path, args=None, root_dir: str = ".",
                             arg_mask=None):
    """Build a NeRFMatchEvaluator from a torch Lightning or native ckpt."""
    ckpt_path = str(ckpt_path)
    if (Path(ckpt_path) / "meta.json").exists():
        _, _, _, config = load_checkpoint(Path(ckpt_path), None)
        state = None
    else:
        state, hparams = load_torch_state_dict(ckpt_path)
        config = Namespace(**hparams)
    config.ckpt = ckpt_path

    if getattr(config.data, "datasets", None):
        for _, dt_config in vars(config.data.datasets).items():
            update_paths(dt_config, root_dir)
    else:
        update_paths(config.data, root_dir)

    if args:
        config = merge_configs(config, args)
        if getattr(args, "img_wh", None):
            config.data.img_wh = config.img_wh
        if getattr(args, "pair_topk", None):
            config.data.pair_topk = args.pair_topk
        if getattr(args, "scene_dir", None):
            config.data.scene_dir = args.scene_dir
        if getattr(args, "scene", None):
            config.data.scenes = [args.scene]
        if arg_mask == "no mask":
            config.data.use_msk = False
        elif arg_mask not in (None, "default"):
            config.data.use_msk = arg_mask

    evaluator = NeRFMatchEvaluator(config)
    if state is not None:
        params, missing = convert_torch_params(
            evaluator.params, state,
            backbone_extra="model." if not evaluator.coarse_only else "")
        evaluator.params = params
        if missing:
            logger.warning(f"{len(missing)} params missing (e.g. {missing[:3]})")
    else:
        template = evaluator.params
        evaluator.params, _, _, _ = load_checkpoint(Path(ckpt_path), template)
    return evaluator


class NeRFMatchEvaluator:
    def __init__(self, config, data_loader=None, params=None):
        self.config = config
        self.seed = config.exp.seed
        model_conf = config.model
        # coarse-vs-c2f auto-detection by ffeat_dim presence (:128-133).
        if not hasattr(model_conf, "ffeat_dim"):
            self.model = NeRFMatcherCoarse(
                CoarseMatcherConfig.from_namespace(model_conf))
            self.coarse_only = True
        else:
            self.model = NeRFMatcherMS(
                C2FMatcherConfig.from_namespace(model_conf))
            self.coarse_only = False
        self.params = params if params is not None else \
            self.model.init_params(jax.random.PRNGKey(0))

        self.data_loader = data_loader
        if data_loader is None and hasattr(config.data, "dataset"):
            try:
                self.data_loader = init_data_loader(
                    config.data, split=getattr(config, "split", "test"))
            except Exception as e:  # dataset dirs may not exist at init
                logger.warning(f"Deferred data loading: {e}")

        ckpt = str(getattr(config, "ckpt", "eval"))
        self.cache_dir = Path(ckpt.replace("checkpoints/", "")
                              .replace(".ckpt", "_eval_results"))
        self.timer = defaultdict(list)
        self.max_matches = int(getattr(config, "max_matches", 2048))
        # Mesh-sharded matching over a multi-chip mesh:
        # --point_shard: merged multi-pair point clouds — shard the POINT
        #   axis of the (M, N) dual-softmax (eval_match_point_sharded);
        # --pair_shard: separate top-k pairs — shard the PAIR axis of
        #   forward_multi_pair (parallel/pair_sharding.py).
        self.point_shard_mesh = None
        self.pair_shard_mesh = None
        n_dev = len(jax.devices())
        if n_dev > 1:
            from ..parallel.mesh import make_mesh

            if bool(getattr(config, "point_shard", False)):
                # Both model families implement it: the coarse matcher
                # shards its whole match program; NeRFMatcherMS shards the
                # coarse dual-softmax and runs the fine stage replicated.
                self.point_shard_mesh = make_mesh(data=n_dev)
            if bool(getattr(config, "pair_shard", False)):
                self.pair_shard_mesh = make_mesh(data=n_dev)

    # ------------------------------------------------------------------
    def _extract_matches_host(self, batch, mutual, match_thres):
        """Run the matcher -> host-side (pt2d, pt3d) correspondences.

        Handles both single-pair (pt3d (B,N,3)) and multi-pair (B,K,N,3)
        layouts; returns concatenated matches for batch item 0 (eval bs=1).
        """
        img = jnp.asarray(batch["image"])
        pt3d = np.asarray(batch["pt3d"])
        pt_feat = jnp.asarray(batch["pt_feat"])
        im_mask = jnp.asarray(np.asarray(batch["im_mask"], np.float32))
        pt_mask = jnp.asarray(np.asarray(batch["pt_mask"], np.float32))
        pt2d = np.asarray(batch["pt2d"])[0]

        multi = pt3d.ndim == 4
        t0 = time.perf_counter()
        if multi:
            # Multi-pair: one device program (image features shared, pairs
            # mapped with lax.map), stacked dense matches (K, B, M).
            K_pairs = pt3d.shape[1]
            outs = self.model.eval_match(
                self.params, img, pt_feat, jnp.asarray(pt3d),
                im_mask=im_mask, pt_mask=pt_mask, mutual=mutual,
                match_thres=match_thres, top_k=self.max_matches,
                pair_mesh=self.pair_shard_mesh)
            outs = jax.device_get(outs)
            # Honor --coarse_only on c2f checkpoints here too (the
            # single-pair path gates on it at line ~222); otherwise the
            # ablation would be silently fine-refined yet cached under
            # the '_coarse' tag.
            use_fine = "expec_f" in outs and not self.coarse_only
            all2d, all3d = [], []
            for k in range(K_pairs):
                lists = {kk: outs["lists"][kk][k] for kk in
                         ("i_ids", "j_ids", "mconf", "valid")}
                valid = lists["valid"][0]
                i_ids = lists["i_ids"][0][valid]
                mpt2d = pt2d[i_ids]
                if use_fine:
                    M = outs["j_ids"].shape[2]
                    expec = outs["expec_f"][k].reshape(-1, M, 3)[0][i_ids]
                    mpt2d = np.asarray(self.model.fine_coords(
                        jnp.asarray(expec), jnp.asarray(mpt2d)))
                all2d.append(mpt2d)
                all3d.append(pt3d[0, k][lists["j_ids"][0][valid]])
            self.timer["match_time"].append((time.perf_counter() - t0) / K_pairs)
            return np.concatenate(all2d), np.concatenate(all3d)

        mesh = self.point_shard_mesh
        if mesh is not None and pt3d.shape[1] % mesh.devices.size == 0:
            out = self.model.eval_match_point_sharded(
                self.params, mesh, img, pt_feat, jnp.asarray(pt3d),
                im_mask=im_mask, pt_mask=pt_mask, mutual=mutual,
                match_thres=match_thres, top_k=self.max_matches)
        else:
            out = self.model.eval_match(
                self.params, img, pt_feat, jnp.asarray(pt3d),
                im_mask=im_mask, pt_mask=pt_mask, mutual=mutual,
                match_thres=match_thres, top_k=self.max_matches)
        lists = jax.device_get(out["lists"])
        self.timer["match_time"].append(time.perf_counter() - t0)
        return self._item_matches(out, lists, pt2d[None], pt3d, 0)

    # ------------------------------------------------------------------
    def _item_matches(self, out, lists, pt2d_all, pt3d, b):
        """Host-side match lists for batch item ``b`` of a device output."""
        valid = lists["valid"][b]
        i_ids = lists["i_ids"][b][valid]
        j_ids = lists["j_ids"][b][valid]
        mpt2d = pt2d_all[b][i_ids]
        if not self.coarse_only:
            M = out["j_ids"].shape[1]
            expec = np.asarray(out["expec_f"]).reshape(-1, M, 3)[b][i_ids]
            mpt2d = np.asarray(self.model.fine_coords(
                jnp.asarray(expec), jnp.asarray(mpt2d)))
        return mpt2d, pt3d[b][j_ids]

    # ------------------------------------------------------------------
    def _eval_batch_queries(self, batch, mutual, match_thres, solver,
                            rthres, center_subpixel, iters: int = 1,
                            renderer=None, renderer_params=None):
        """All queries of a collated batch through ONE matcher program.

        The inference programs are batched over queries end-to-end (leading
        ``B`` dim throughout ``models/``), so ``--eval_bs`` amortizes
        per-dispatch overhead and fills conv MXU tiles better than bs=1;
        per-query PnP stays on host.  ``iters > 1`` (the production
        7-Scenes protocol, reference ``model_eval/README.md:54-141``)
        batches the re-render at the current pose estimates too — one
        scan-grouped fused render for the whole batch
        (``NerfRenderer.render_novel_views``) instead of the reference's
        per-query sequential re-render; queries whose PnP failed keep
        their previous scene points (same as the per-query path, which
        skips the re-render when ``c2w_est`` is None).  iNeRF gradient
        refinement stays per-query (bs=1)."""
        ts = time.perf_counter()
        pt3d = np.asarray(batch["pt3d"])
        assert pt3d.ndim == 3, "eval_bs>1 requires single-pair batches"
        B = pt3d.shape[0]
        Ks = np.asarray(batch["K"])
        c2ws = np.asarray(batch["c2w"])
        pt2d_all = np.asarray(batch["pt2d"])
        pt_feat = np.asarray(batch["pt_feat"])
        pt_mask = np.asarray(batch["pt_mask"], np.float32)
        if iters > 1:
            assert renderer is not None and renderer_params is not None, \
                "iters>1 needs the NeRF renderer for the re-render loop"
        H, W = np.asarray(batch["image"]).shape[1:3]

        c2w_ests = [None] * B
        res = dict(R_err=[float("inf")] * B, t_err=[float("inf")] * B,
                   num_matches=[0] * B, iter_t_errs=[], iter_R_errs=[])
        for itr in range(iters):
            dead = set()  # queries whose points were dropped this iter
            if itr > 0:
                # Batched re-render at the current estimates (only queries
                # whose PnP succeeded; the rest keep their scene points).
                live = [b for b in range(B) if c2w_ests[b] is not None]
                if live:
                    un = (np.asarray(batch["unnorm_scene"])
                          if "unnorm_scene" in batch else
                          np.broadcast_to(renderer.unnorm_scene, (B, 4, 4)))
                    outs = renderer.render_novel_views(
                        renderer_params, (H, W), Ks[live],
                        [c2w_ests[b] for b in live],
                        [un[b] for b in live], downsample=8)
                    n_new = outs["pt3d"].shape[1]
                    if n_new != pt3d.shape[1]:
                        # Re-render changes the point budget: the cached
                        # points of dead (PnP-failed) queries no longer fit
                        # the arrays — keep their iter-0 results instead of
                        # re-solving on zeros (matches the per-query path,
                        # which skips the re-render when c2w_est is None).
                        dead = set(range(B)) - set(live)
                        pt3d = np.zeros((B, n_new, 3), np.float32)
                        pt_feat = np.zeros(
                            (B, n_new, outs["pt_feat"].shape[-1]), np.float32)
                        pt_mask = np.zeros((B, n_new), np.float32)
                    else:
                        pt3d, pt_feat, pt_mask = (pt3d.copy(),
                                                  pt_feat.copy(),
                                                  pt_mask.copy())
                    for j, b in enumerate(live):
                        pt3d[b] = outs["pt3d"][j]
                        pt_feat[b] = outs["pt_feat"][j]
                        pt_mask[b] = 1.0
            t_match = time.perf_counter()
            out = self.model.eval_match(
                self.params, jnp.asarray(batch["image"]),
                jnp.asarray(pt_feat), jnp.asarray(pt3d),
                im_mask=jnp.asarray(np.asarray(batch["im_mask"], np.float32)),
                pt_mask=jnp.asarray(pt_mask),
                mutual=mutual, match_thres=match_thres,
                top_k=self.max_matches)
            lists = jax.device_get(out["lists"])
            # One match_time entry per query per iteration, mirroring the
            # per-query path (eval_match_pose records one per call).
            self.timer["match_time"].extend(
                [(time.perf_counter() - t_match) / B] * B)
            for b in range(B):
                if b in dead:
                    continue  # keep iter-0 R_err/t_err/num_matches
                mpt2d, mpt3d = self._item_matches(out, lists, pt2d_all,
                                                  pt3d, b)
                c2w_est, r_err, t_err, n = self._solve_pose(
                    mpt2d, mpt3d, Ks[b], c2ws[b], solver, rthres,
                    center_subpixel)
                c2w_ests[b] = c2w_est
                res["R_err"][b] = r_err
                res["t_err"][b] = t_err
                res["num_matches"][b] = n
        self.timer["localize_time"].extend(
            [(time.perf_counter() - ts) / B] * B)
        return res

    # ------------------------------------------------------------------
    def eval_match_pose(self, batch, mutual: bool = True,
                        match_thres: float = 0.0, solver: str = "colmap",
                        rthres: float = 1.0, center_subpixel: bool = False,
                        match_oracle: bool = False):
        """Match + PnP -> (c2w_est, R_err, t_err, num_matches)."""
        K = np.asarray(batch["K"])[0]
        c2w_gt = np.asarray(batch["c2w"])[0]

        if match_oracle:
            if "conf_gt" not in batch:
                # The datasets build conf_gt only off the test split (the
                # reference does the same, nerfmatch_dataset.py:270); the
                # oracle ablation therefore needs --split val (or a
                # multi-pair dataset, which always builds it).
                raise ValueError(
                    "--match_oracle needs conf_gt in the batch: run it on "
                    "a non-test split (reference behavior is identical)")
            conf_gt = np.asarray(batch["conf_gt"])[0]
            i2d, i3d = np.where(conf_gt)
            pt3d = np.asarray(batch["pt3d"])[0].reshape(-1, 3)[i3d]
            if not self.coarse_only and "pt2d_proj" in batch:
                pt2d = np.asarray(batch["pt2d_proj"])[0][i3d]
            else:
                pt2d = np.asarray(batch["pt2d"])[0][i2d]
        else:
            pt2d, pt3d = self._extract_matches_host(batch, mutual, match_thres)

        return self._solve_pose(pt2d, pt3d, K, c2w_gt, solver, rthres,
                                center_subpixel)

    # ------------------------------------------------------------------
    def _solve_pose(self, pt2d, pt3d, K, c2w_gt, solver, rthres,
                    center_subpixel):
        """PnP + pose error -> (c2w_est, R_err, t_err, num_matches)."""
        # --center_subpixel is accepted for CLI parity but is an identity:
        # the reference's +0.5 cancels pycolmap's half-integer pixel-center
        # convention, which neither in-tree backend uses — shifting would
        # bias every correspondence by half a pixel (see
        # pose.estimate_pose_pycolmap).
        del center_subpixel
        solver_name = {"colmap": "native", "cv2": "cv", "cv": "cv",
                       "native": "native"}[solver]
        res = estimate_pose(pt2d, pt3d, K, ransac_thres=rthres,
                            solver=solver_name)
        if res is None:
            return None, float("inf"), float("inf"), len(pt2d)
        R, t, _ = res
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = t
        c2w_est = np.linalg.inv(w2c)
        r_err, t_err = pose_err(jnp.asarray(c2w_est, jnp.float32),
                                jnp.asarray(c2w_gt, jnp.float32))
        return c2w_est, float(r_err), float(t_err), len(pt2d)

    # ------------------------------------------------------------------
    def eval_batch(self, batch, renderer=None, renderer_params=None,
                   inerf_conf=None, iters: int = 1, mutual: bool = True,
                   match_thres: float = 0.0, match_oracle: bool = False,
                   solver: str = "colmap", rthres: float = 1.0,
                   center_subpixel: bool = False, query2query: bool = False,
                   retrieval_only: bool = False, cached_pt: bool = True,
                   cache_iters: bool = False, debug: bool = False,
                   overlay_ims=None):
        """Per-query localization with optional iterative re-rendering."""
        if int(np.asarray(batch["image"]).shape[0]) > 1:
            assert inerf_conf is None and not match_oracle \
                and not retrieval_only and not query2query and cached_pt, \
                "eval_bs>1 supports the cached-pt protocols (single-shot " \
                "and --iters re-render); iNeRF/oracle/retrieval stay bs=1"
            return self._eval_batch_queries(batch, mutual, match_thres,
                                            solver, rthres, center_subpixel,
                                            iters=iters, renderer=renderer,
                                            renderer_params=renderer_params)
        K = np.asarray(batch["K"])[0]
        if "unnorm_scene" in batch:
            unnorm_scene = np.asarray(batch["unnorm_scene"])[0]
        elif renderer is not None:
            unnorm_scene = renderer.unnorm_scene
        else:
            # retrieval_only with no scene caches: the minimal samples
            # carry no unnorm_scene and the pose comes from rc2w directly.
            unnorm_scene = None

        iter_t_errs, iter_R_errs = [], []
        ts = time.perf_counter()
        H, W = batch["image"].shape[1:3]

        if query2query:
            c2w_est = np.asarray(batch["c2w"])[0]
        elif (not cached_pt) or retrieval_only:
            c2w_est = np.asarray(batch["rc2w"])[0]
        else:
            c2w_est = None

        num_matches = 0
        R_err = t_err = float("inf")
        for itr in range(iters):
            if retrieval_only:
                R_err, t_err = map(float, pose_err(
                    jnp.asarray(np.asarray(batch["c2w"])[0], jnp.float32),
                    jnp.asarray(c2w_est, jnp.float32)))
            else:
                if c2w_est is not None:
                    # Re-render scene points at the current pose estimate.
                    outs = renderer.render_novel_view(
                        renderer_params, (H, W), K, c2w_est, unnorm_scene,
                        downsample=8)
                    batch = dict(batch)
                    batch["pt3d"] = outs["pt3d"][None]
                    batch["pt_feat"] = np.asarray(outs["pt_feat"])[None]
                    batch["pt_mask"] = np.ones(outs["pt3d"].shape[:1],
                                               np.float32)[None]
                c2w_est, R_err, t_err, num_matches = self.eval_match_pose(
                    batch, mutual=mutual, match_thres=match_thres,
                    solver=solver, rthres=rthres,
                    center_subpixel=center_subpixel, match_oracle=match_oracle)
                if inerf_conf and cache_iters:
                    iter_t_errs.append(t_err)
                    iter_R_errs.append(R_err)

            if c2w_est is not None and inerf_conf:
                from .inerf import inerf_refinement

                res = inerf_refinement(
                    self, batch, renderer, renderer_params, unnorm_scene,
                    c2w_est, inerf_conf, mutual=mutual,
                    match_thres=match_thres, solver=solver, rthres=rthres,
                    cache_iters=cache_iters, iter_t_errs=iter_t_errs,
                    iter_R_errs=iter_R_errs, debug=debug,
                    overlay_ims=overlay_ims)
                if np.isfinite(res[1]):
                    c2w_est, R_err, t_err = res

            if cache_iters:
                iter_t_errs.append(t_err)
                iter_R_errs.append(R_err)
            if debug:
                logger.info(f">> iter={itr} matches={num_matches} "
                            f"t={t_err * 100:.3f}cm R={R_err:.3f}")

        self.timer["localize_time"].append(time.perf_counter() - ts)
        return dict(R_err=[R_err], t_err=[t_err], num_matches=[num_matches],
                    iter_t_errs=iter_t_errs, iter_R_errs=iter_R_errs)

    # ------------------------------------------------------------------
    def eval_data_loader(self, renderer=None, renderer_params=None,
                         iters: int = 1, rthres: float = 1.0,
                         center_subpixel: bool = False, solver: str = "colmap",
                         mutual: bool = True, match_thres: float = 0.0,
                         match_oracle: bool = False, data_loader=None,
                         query2query: bool = False, cached_pt: bool = True,
                         debug: bool = False, inerf_conf=None,
                         retrieval_only: bool = False,
                         cache_iters: bool = False, visualize: bool = False):
        data_loader = data_loader or self.data_loader
        metrics = defaultdict(list)
        vis_dir = None
        if visualize:
            scene = getattr(data_loader.dataset, "scene", "scene")
            vis_dir = self.cache_dir / "visualization" / scene
            vis_dir.mkdir(parents=True, exist_ok=True)
        for i, batch in enumerate(data_loader):
            overlay_ims = [] if visualize else None
            im = self.eval_batch(
                batch, renderer, renderer_params, inerf_conf, iters=iters,
                rthres=rthres, center_subpixel=center_subpixel, solver=solver,
                mutual=mutual, match_thres=match_thres,
                match_oracle=match_oracle, query2query=query2query,
                retrieval_only=retrieval_only, cached_pt=cached_pt,
                cache_iters=cache_iters, debug=debug, overlay_ims=overlay_ims)
            if visualize and overlay_ims and im["t_err"][0] * 100 > 50:
                # Failure case (>50cm): dump the refinement overlay GIF.
                import imageio

                name = f"{i}_t{im['t_err'][0] * 100:.1f}cm"                        f"_R{im['R_err'][0]:.1f}deg.gif"
                imageio.mimwrite(vis_dir / name, overlay_ims, duration=250)
            for k in ["R_err", "t_err", "num_matches", "iter_t_errs",
                      "iter_R_errs"]:
                if k in im and len(im[k]):
                    metrics[k].append(np.asarray(im[k]))
            if debug:
                logger.info(f"{i} t={im['t_err'][0] * 100:.1f}cm "
                            f"r={im['R_err'][0]:.3f}deg")
                if i >= 5:
                    break
        for k in list(metrics.keys()):
            try:
                if "iter" in k:
                    metrics[k] = np.stack(metrics[k])
                else:
                    metrics[k] = np.concatenate(metrics[k]).squeeze()
            except ValueError:
                pass
        return dict(metrics)

    # ------------------------------------------------------------------
    def eval_multi_scenes(self, split: str = "test", rthres: float = 1.0,
                          center_subpixel: bool = False,
                          solver: str = "colmap", mutual: bool = True,
                          match_thres: float = 0.0, iters: int = 1,
                          nerf_path=None, inerf_conf=None,
                          test_pair_txt=None, scene_dir=None,
                          ow_cache: bool = False, data_conf=None,
                          query2query: bool = False, cached_pt: bool = True,
                          stop_layer: int = -1, debug: bool = False,
                          cache_dir=None, cache_iters: bool = False,
                          retrieval_only: bool = False,
                          match_oracle: bool = False, seed=None,
                          visualize: bool = False,
                          shard_scenes: bool = False, eval_bs: int = 1):
        """Scene loop with tag-keyed result caching + cross-scene averages."""
        if cache_dir:
            self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)

        conf = self.config.data
        if data_conf is not None:
            conf = merge_configs(conf, data_conf)
        if test_pair_txt:
            conf.test_pair_txt = test_pair_txt
        if scene_dir:
            conf.scene_dir = scene_dir

        if hasattr(conf, "datasets"):
            datasets = init_mixed_dataset(conf, split=split, concat=False)
        else:
            datasets = init_multiscene_dataset(conf, split=split, concat=False)

        if shard_scenes and jax.process_count() > 1:
            # Scene-level parallelism across hosts/slices: each process takes
            # a strided subset; summaries are per-process (merge caches with
            # cli.benchmark_nerfmatch.merge_scene_metrics).  Replaces the
            # reference's "run each scene manually in parallel" advice.
            datasets = datasets[jax.process_index()::jax.process_count()]

        metr_all = []
        for dataset in datasets:
            if seed is not None:
                np.random.seed(seed)
            self.timer = defaultdict(list)
            cache_path = self._cache_tag(
                dataset, split, rthres, mutual, match_thres, solver,
                center_subpixel, retrieval_only, inerf_conf, iters, conf,
                test_pair_txt, cached_pt, query2query, cache_iters,
                match_oracle, debug)
            logger.info(f"Cache path: {cache_path}")
            if os.path.exists(cache_path) and not ow_cache:
                metrics = np.load(cache_path, allow_pickle=True).item()
            else:
                # Query batching (--eval_bs): the cached-point protocols
                # are batchable — single-shot AND the --iters re-render
                # loop (batched through render_novel_views).  iNeRF
                # refinement re-renders inside a per-query gradient loop;
                # visualization and multi-pair layouts key off batch
                # item 0 — those stay bs=1.
                from ..data import NeRFMatchMultiPair

                bs = eval_bs if (
                    eval_bs > 1 and not inerf_conf
                    and cached_pt and not query2query and not retrieval_only
                    and not match_oracle and not visualize and not cache_iters
                    and not isinstance(dataset, NeRFMatchMultiPair)
                ) else 1
                loader = DataLoader(dataset, batch_size=bs, shuffle=False)
                renderer = renderer_params = None
                if (not cached_pt) or query2query or (iters > 1) or inerf_conf:
                    if nerf_path is None:
                        raise ValueError(
                            "This protocol re-renders through the NeRF "
                            "(uncached points / --iters>1 / iNeRF / "
                            "query2query) but no NeRF checkpoint was given "
                            "— pass --nerf_path (supports $scene/#scene "
                            "placeholders).")
                    sl = stop_layer if stop_layer > 0 else \
                        parse_nerf_stop_layer(dataset.scene_dir)
                    if sl < 0 and iters > 1:
                        # The scene cache encodes its feature layer in the
                        # path (reference convention `.../inter_layer3/...`,
                        # model_eval/README.md:56).  Re-rendering with a
                        # DIFFERENT tap than the matcher was trained on
                        # silently collapses matches — refuse to guess.
                        logger.warning(
                            f"scene_dir {dataset.scene_dir} has no "
                            "inter_layer<k> tag: --iters re-renders will "
                            "use the final-layer feature tap, which "
                            "likely mismatches the cached features the "
                            "matcher was trained on.")
                    nerf_ckpt = str(nerf_path).replace(
                        "$scene", dataset.scene).replace("#scene", dataset.scene)
                    renderer, renderer_params = load_nerf_render_from_ckpt(
                        nerf_ckpt, stop_layer=sl, serving=True)
                metrics = self.eval_data_loader(
                    renderer=renderer, renderer_params=renderer_params,
                    iters=iters, rthres=rthres,
                    center_subpixel=center_subpixel, solver=solver,
                    mutual=mutual, match_thres=match_thres,
                    match_oracle=match_oracle, data_loader=loader,
                    query2query=query2query, cached_pt=cached_pt, debug=debug,
                    inerf_conf=inerf_conf, retrieval_only=retrieval_only,
                    cache_iters=cache_iters, visualize=visualize)
                for k, v in self.timer.items():
                    metrics[k] = np.asarray(v)
                np.save(cache_path, metrics)

            thres = POSE_THRES.get(dataset.scene, [(5, 5)])
            metr = summarize_pose_statis(metrics, pose_thres=thres,
                                         t_unit="cm", t_scale=1e2)
            metr_all.append(metr)

        if metr_all:
            return average_pose_metrics(metr_all), metr_all
        return None, []

    def _cache_tag(self, dataset, split, rthres, mutual, match_thres, solver,
                   center_subpixel, retrieval_only, inerf_conf, iters, conf,
                   test_pair_txt, cached_pt, query2query, cache_iters,
                   match_oracle, debug):
        """Reproduce the reference's tag-keyed result cache naming."""
        path = str(self.cache_dir / f"{dataset.scene}_rth{rthres:.0f}{split}.npy")
        if self.coarse_only:
            path = path.replace(".npy", "_coarse.npy")
        if not mutual:
            path = path.replace(".npy", "_no_mutual.npy")
        if match_thres > 0:
            path = path.replace(".npy", f"_sc{match_thres:.2f}.npy")
        if solver != "cv":
            path = path.replace(".npy", f"_{solver}.npy")
        if center_subpixel:
            path = path.replace(".npy", "_subpx.npy")
        if retrieval_only:
            path = path.replace(".npy", "_IR.npy")
        if inerf_conf:
            num_optim = getattr(inerf_conf, "num_optim", 5)
            lrate = getattr(inerf_conf, "lrate", 0.001)
            ds = getattr(inerf_conf, "ds", 8)
            tag = f"_itr{iters}ds{ds}inerf{num_optim}lr{lrate}"
            tag += "lrdcos" if getattr(inerf_conf, "lrdecay", False) else ""
            tag += "pose" if getattr(inerf_conf, "eval_pose", False) else "match"
            path = path.replace(".npy", f"{tag}.npy")
        else:
            path = path.replace(".npy", f"_itr{iters}.npy")
        if getattr(conf, "dataset", "") == "NeRFMatchMultiPair":
            path = path.replace(
                ".npy", f"_top{conf.pair_topk}pt{getattr(conf, 'sample_pts', -1)}.npy")
        if not cached_pt:
            path = path.replace(".npy", "_nocache.npy")
        if query2query:
            path = path.replace(".npy", ".query2query.npy")
        if cache_iters:
            path = path.replace(".npy", ".itercache.npy")
        if match_oracle:
            path = path.replace(".npy", ".match_oracle.npy")
        if debug:
            path = path.replace(".npy", ".debug.npy")
        return path
