"""Hierarchical mip-NeRF renderer: a jit-compiled pure render over ray batches.

TPU-first redesign of the reference's ``NerfRenderer``
(``nerfmatch/nerf/renderer.py:26-333``):

* no in-graph Python chunk loop — the whole ray batch is one traced program
  (the MLP over rays x samples is a single large matmul for the MXU); host-side
  chunking only for full-image eval, with padded fixed-size chunks so there is
  exactly one compilation per chunk shape;
* explicit PRNG keys for perturbed sampling / density noise;
* coarse-to-fine hierarchy with static model configs (coarse/fine/single);
* feature tap + along-ray feature compositing ('lin' weighted sum or 'max'
  surface sample) for NeRF descriptors (``renderer.py:250-265``);
* appearance-embedding table (16-dim) as part of the params pytree.

Params pytree layout (mirrors the torch state dict for the ckpt bridge):
``{"nerf_coarse": {...}, "nerf_fine": {...}, "embedding_a": {"weight": (V, 16)}}``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .compositing import composite_features, t_to_s, volume_render
from .embedding import fourier_embedding, fourier_embedding_dim, ipe_embedding, \
    ipe_embedding_dim, pe_embedding
from .model import NerfConfig, init_nerf_params, nerf_apply
from .rays import RAY_VIEWDIR, sample_nerf_rays
from .sampling import sample_along_rays
from ..utils.geometry import unnormalize_pts

APP_EMBED_DIM = 16

# int8 mode the LOCALIZATION-SERVING paths (scene-point caching +
# localize-time re-rendering) default to when the config does not set
# render.trunk_int8 — quality-gated end-to-end by scripts/int8_e2e_gate.py
# (recall + median-drift-vs-noise-floor criteria; verdict recorded in
# PARITY.md "int8 serving mode").  Gate run 2026-08-20 (30-epoch NeRF,
# 4 modes x {single-shot, --iters 2}): "coarse" PASSES every arm
# (single-shot median drift 0.067deg/0.0104 vs limits 0.74/0.012;
# --iters 2: 1.08deg/0.042 vs 2.21/0.067; recall unchanged), "both"
# FAILS (single-shot |dt| 0.0258 > 0.0120 limit) and stays opt-in.
# Reconstruction eval (PSNR renders) keeps RenderConfig's own "none"
# default.
SERVING_INT8_DEFAULT = "coarse"  # gate verdict: coarse PASS / both FAIL


def serving_int8_mode(config) -> str:
    """Resolve the int8 serving mode for cache/localization paths: an
    explicit ``render.trunk_int8`` (including 'none') always wins; an
    absent key means the gate-approved serving default."""
    mode = getattr(getattr(config, "render", None), "trunk_int8", None)
    return SERVING_INT8_DEFAULT if mode is None else mode


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    embed_type: str = "mip"              # "mip" | "normal"
    xyz_num_freqs: int = 15
    dirs_num_freqs: int = 4
    use_viewdirs: bool = True
    use_disp: bool = False
    perturb: bool = True
    noise_std: float = 1.0
    white_bg: bool = False
    chunksize: int = 16384               # reference MLP-chunking knob (in
                                         # rays*samples); accepted for config
                                         # parity but intentionally superseded
                                         # here — eval chunks by RAYS
                                         # (predict's chunk_rays), sized for
                                         # TPU dispatch, and training renders
                                         # whole batches in one program
    single_model: bool = False
    appearance_embedding: bool = False
    mip_var_scale: float = -1.0
    feat_comb: str = "lin"               # "lin" | "max"
    output_dim: int = 4
    num_out_ch: int = 0                  # extra scene-coord channels (out_scr)
    out_scr: bool = False
    compute_dtype: str = "float32"       # "bfloat16": bf16 MLP trunk (MXU)
    early_term_eps: float = 1e-4         # fused EVAL path: skip sample blocks
                                         # once every ray in the tile is opaque
                                         # (outputs bounded within eps — below
                                         # the ~8e-4 fused-bf16 noise floor).
                                         # ON by default: quality-gated e2e on
                                         # an enclosed indoor scene (scripts/
                                         # earlyterm_e2e_gate.py — identical
                                         # matches/poses, 1.86x faster scene
                                         # caching); costs ~3-11% on soft or
                                         # transparent scenes -> set 0 there.
                                         # Training is unaffected.
    trunk_int8: str = "none"             # fused EVAL path serving mode:
                                         # "coarse" / "both" / "posttap"
                                         # run the named stages' MLP trunks
                                         # ("posttap": coarse fully + the
                                         # fine trunk AFTER the feat tap —
                                         # per-sample descriptor taps stay
                                         # exact-bf16) as int8 MXU
                                         # dots with static per-scene
                                         # activation scales (2x MACs/cycle;
                                         # ops/pallas/quant.py).  Needs one
                                         # calibration pass per scene —
                                         # predict()/render_novel_views()
                                         # calibrate lazily from their first
                                         # ray batch.  Output deltas vs f32:
                                         # coarse-only ~1.2e-3 mean rgb
                                         # (resample jitter only), both
                                         # ~3.4e-3 — gate quality end-to-end
                                         # before serving with it
                                         # (scripts/int8_e2e_gate.py).
                                         # Training is unaffected.

    @classmethod
    def from_config(cls, config):
        """Build from a reference-style nested config namespace."""
        render = config.render
        emb = config.embedding
        data = getattr(config, "data", None)
        return cls(
            embed_type=getattr(emb, "type", "normal"),
            xyz_num_freqs=emb.xyz_num_freqs,
            dirs_num_freqs=getattr(emb, "dirs_num_freqs", 4),
            use_viewdirs=render.use_viewdirs,
            use_disp=render.use_disp,
            perturb=render.perturb,
            noise_std=render.noise_std,
            white_bg=render.white_bg or bool(getattr(data, "white_bg", False)),
            chunksize=render.chunksize,
            single_model=bool(getattr(render, "single_model", False)),
            appearance_embedding=bool(getattr(emb, "appearance_embed", False)),
            mip_var_scale=getattr(emb, "mip_var_scale", -1),
            output_dim=getattr(getattr(config, "fine_nerf", None), "output_dim", 4),
            out_scr=bool(getattr(data, "out_scr", False)),
            num_out_ch=3 if getattr(data, "out_scr", False) else 0,
            compute_dtype=getattr(render, "compute_dtype", "float32"),
            early_term_eps=getattr(render, "early_term_eps", 1e-4),
            trunk_int8=getattr(render, "trunk_int8", "none"),
        )


class NerfRenderer:
    """Static config holder; all compute methods are pure in params."""

    def __init__(self, config, num_frames: int | None = None, stop_layer: int = -1):
        """``config``: reference-style namespace with ``render``, ``embedding``,
        ``coarse_nerf``, ``fine_nerf`` (and optionally ``data``) sections."""
        self.cfg = RenderConfig.from_config(config)
        in_ch = 3
        if self.cfg.embed_type == "mip":
            xyz_emb_dim = ipe_embedding_dim(in_ch, self.cfg.xyz_num_freqs)
        else:
            xyz_emb_dim = fourier_embedding_dim(in_ch, self.cfg.xyz_num_freqs)
        if self.cfg.use_viewdirs:
            if self.cfg.embed_type == "mip":
                dirs_emb_dim = 2 * 3 * self.cfg.dirs_num_freqs + 3
            else:
                dirs_emb_dim = fourier_embedding_dim(3, self.cfg.dirs_num_freqs)
        else:
            dirs_emb_dim = 0
        self.xyz_emb_dim = xyz_emb_dim
        self.dirs_emb_dim = dirs_emb_dim
        app_dim = APP_EMBED_DIM if self.cfg.appearance_embedding else 0

        common = dict(
            use_viewdirs=self.cfg.use_viewdirs,
            xyz_dim=xyz_emb_dim,
            dirs_dim=dirs_emb_dim,
            app_dim=app_dim,
            out_3d_pnt=self.cfg.out_scr,
            out_add_ch=self.cfg.num_out_ch,
        )
        self.coarse_cfg = None
        if not self.cfg.single_model:
            self.coarse_cfg = NerfConfig.from_namespace(config.coarse_nerf, **common)
        fine_ns = getattr(config, "fine_nerf", None)
        self.fine_cfg = None
        if fine_ns is not None:
            self.fine_cfg = NerfConfig.from_namespace(
                fine_ns, stop_layer=stop_layer, **common)
        self.num_frames = num_frames
        self.act_scales = None  # per-scene int8 scales (calibrate_int8)

    # ------------------------------------------------------------------
    # Params
    # ------------------------------------------------------------------

    def init_params(self, key):
        keys = jax.random.split(key, 3)
        params = {}
        if self.coarse_cfg is not None:
            params["nerf_coarse"] = init_nerf_params(keys[0], self.coarse_cfg)
        if self.fine_cfg is not None:
            params["nerf_fine"] = init_nerf_params(keys[1], self.fine_cfg)
        if self.cfg.appearance_embedding:
            params["embedding_a"] = {
                "weight": jax.random.normal(
                    keys[2], (self.num_frames, APP_EMBED_DIM), jnp.float32
                )
            }
        return params

    # ------------------------------------------------------------------
    # Encoders
    # ------------------------------------------------------------------

    def encode_xyz(self, pts, var=None):
        if self.cfg.embed_type == "mip":
            enc, _ = ipe_embedding(pts, var, self.cfg.xyz_num_freqs)
            return enc
        return fourier_embedding(pts, self.cfg.xyz_num_freqs)

    def encode_dirs(self, dirs):
        if self.cfg.embed_type == "mip":
            return pe_embedding(dirs, self.cfg.dirs_num_freqs)
        return fourier_embedding(dirs, self.cfg.dirs_num_freqs)

    # ------------------------------------------------------------------
    # Core render
    # ------------------------------------------------------------------

    def _forward_nerf(self, params, model_cfg, pts, var, viewdirs, app_emb,
                      validation: bool):
        """Encode + MLP over (R, S) samples; returns (raw (R,S,C), feat (R,S,F))."""
        R, S = pts.shape[:2]
        inputs = self.encode_xyz(pts, var)
        if self.cfg.use_viewdirs:
            dirs_emb = self.encode_dirs(viewdirs)  # (R, D)
            dirs_emb = jnp.broadcast_to(dirs_emb[:, None, :], (R, S, dirs_emb.shape[-1]))
            inputs = jnp.concatenate([inputs, dirs_emb], axis=-1)
        if app_emb is not None:
            app = jnp.broadcast_to(app_emb[:, None, :], (R, S, app_emb.shape[-1]))
            inputs = jnp.concatenate([inputs, app], axis=-1)
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else None
        return nerf_apply(params, model_cfg, inputs, val=validation,
                          compute_dtype=dtype)

    def render_rays(self, params, rays, key=None, ray_id=None, train: bool = False,
                    ret_pfeat: bool = False, validation: bool | None = None):
        """Hierarchical render of a ray batch (R, 12) -> dict of per-ray maps.

        Pure function of (params, rays, key); jit with
        ``jax.jit(renderer.render_rays, static_argnames=("train", "ret_pfeat",
        "validation"))`` or use :meth:`render_fn`.
        """
        if validation is None:
            validation = not train
        rays_d = rays[..., 3:6]
        viewdirs = rays[..., RAY_VIEWDIR] if rays.shape[-1] >= 11 else rays_d
        mip = self.cfg.embed_type == "mip"

        if self.cfg.single_model:
            stages = [("coarse", "nerf_fine", self.fine_cfg),
                      ("fine", "nerf_fine", self.fine_cfg)]
        else:
            stages = [("coarse", "nerf_coarse", self.coarse_cfg),
                      ("fine", "nerf_fine", self.fine_cfg)]

        if self.cfg.appearance_embedding:
            if ray_id is None:
                ray_id = jnp.ones((rays.shape[0],), jnp.int32)
            app_emb = params["embedding_a"]["weight"][ray_id]
        else:
            app_emb = None

        if key is None:
            key = jax.random.PRNGKey(0)

        preds = {}
        z_vals = weights = None
        for stage, pkey, mcfg in stages:
            if mcfg is None:
                continue
            key, k_samp, k_noise = jax.random.split(key, 3)
            pts, z_vals = sample_along_rays(
                rays, num_pts=mcfg.num_pts, z_vals=z_vals, weights=weights,
                use_disp=self.cfg.use_disp,
                perturb=self.cfg.perturb if train else False,
                embed_type=self.cfg.embed_type, model_type=stage,
                randomized=train, scale_var=self.cfg.mip_var_scale,
                key=k_samp,
            )
            if mip:
                pts, var = pts
            else:
                var = None

            raw, feats = self._forward_nerf(
                params[pkey], mcfg, pts, var, viewdirs, app_emb, validation)

            rendered = volume_render(
                raw[..., : self.cfg.output_dim + self.cfg.num_out_ch + 3],
                z_vals, rays_d,
                noise_std=self.cfg.noise_std if train else 0.0,
                white_bg=self.cfg.white_bg, mip=mip,
                input_dim=self.cfg.output_dim, key=k_noise,
                out_last=self.cfg.num_out_ch > 0,
            )
            weights = rendered["weights"]

            if ret_pfeat:
                preds[f"feat_{stage}"] = composite_features(
                    weights, feats, self.cfg.feat_comb)

            if self.cfg.out_scr and not validation:
                preds[f"scr_{stage}"] = (
                    rays[:, :3]
                    + rays_d * jax.lax.stop_gradient(rendered["depth"])[:, None]
                    - rendered["last"]
                )

            if validation:
                preds[f"pts_{stage}"] = composite_features(
                    weights, pts, self.cfg.feat_comb)

            if stage == "fine" and not validation:
                # Batch-global min/max normalization is reference-faithful
                # (renderer.py:284: t_to_s(z_vals, z_vals.min(),
                # z_vals.max())) — NOT the per-ray near/far of the
                # mip-NeRF 360 paper; kept verbatim for loss parity.
                s_vals = t_to_s(z_vals, near=jnp.min(z_vals), far=jnp.max(z_vals))
                preds["s_fine"] = s_vals
                preds["weights_fine"] = weights

            preds[f"rgb_{stage}"] = rendered["rgb"]
            preds[f"depth_{stage}"] = rendered["depth"]
        return preds

    # ------------------------------------------------------------------
    # Jitted entry points
    # ------------------------------------------------------------------

    @functools.cached_property
    def _render_jit(self):
        return jax.jit(
            self.render_rays,
            static_argnames=("train", "ret_pfeat", "validation"),
        )

    def render_fn(self):
        return self._render_jit

    @property
    def fused_eval_supported(self) -> bool:
        """The fused Pallas path covers the production eval configs: mip
        hierarchy, viewdirs, 128 samples, linear feature compositing
        (appearance embeddings ride in the per-ray extras).

        ``use_disp`` needs no gate: the mip sampler ignores it entirely
        (hardcoded ``lindisp=False``, matching the reference's
        ``render_utils.py:283-295``), and the fused path requires mip.
        ``mip_var_scale`` threads through ``FusedRenderSpec.var_scale``
        (folded into the moment-extraction constants; parity-tested).
        ``feat_comb='max'`` threads through ``FusedRenderSpec.feat_max``
        (first-occurrence argmax surface sample, carried across sample
        blocks; parity-tested against the XLA path).

        Backend: Mosaic/TPU-only kernels — exclude known non-TPU backends
        (the dev tunnel reports "axon", so exclusion not "tpu" matching;
        same pattern as ``fused_attention_available``) unless a test
        forces interpret mode via ``fused_interpret``."""
        if (jax.default_backend() in ("cpu", "gpu", "cuda", "rocm", "metal")
                and not getattr(self, "fused_interpret", False)):
            return False
        coarse_pts = (self.coarse_cfg.num_pts if self.coarse_cfg is not None
                      else self.fine_cfg.num_pts if self.fine_cfg else None)
        if self.fine_cfg is not None:
            from ..ops.pallas.render_kernel import eval_feat_layer
            o3p = self.fine_cfg.out_3d_pnt
            # "viewdir" descriptors tap h_rgb (model.py:171), not a trunk
            # activation — the kernel cannot reproduce them; and a final-
            # layer tap that coincides with a skip concat returns the
            # POST-concat pt_feat in the XLA path (model.py:139-141),
            # which the kernel's skip-as-extra-matmul layout never forms.
            if (self.fine_cfg.stop_layer < 0 and isinstance(o3p, str)
                    and "viewdir" in o3p):
                return False
            fl = eval_feat_layer(self.fine_cfg)
            if fl == self.fine_cfg.layer_num - 1 \
                    and fl in self.fine_cfg.skips:
                return False
        return (self.cfg.embed_type == "mip" and self.cfg.use_viewdirs
                and self.fine_cfg is not None
                and self.fine_cfg.num_pts == 128
                # Both fused stages sample fine_cfg.num_pts fenceposts; a
                # different coarse count must fall back to XLA, not be
                # silently rendered at 128.
                and coarse_pts == 128)

    def calibrate_int8(self, params, rays):
        """Calibrate per-scene int8 activation scales for the fused eval
        path (``cfg.trunk_int8`` in {"coarse", "both", "posttap"}) and
        invalidate the
        cached fused programs so they rebuild with the quantized trunks.
        ``rays``: a representative (N, 12) packed ray batch of the scene.
        Called lazily by ``predict``/``render_novel_views`` with their
        first batch; call explicitly to control the calibration set."""
        from ..ops.pallas.quant import calibrate_act_scales

        self.act_scales = calibrate_act_scales(self, params, rays)
        for cached in ("_fused_eval", "_fused_eval_scan"):
            self.__dict__.pop(cached, None)
        return self.act_scales

    def _ensure_int8_calibrated(self, params, rays):
        mode = getattr(self.cfg, "trunk_int8", "none")
        if mode != "none" and getattr(self, "act_scales", None) is None:
            n = min(1024, rays.shape[0])
            self.calibrate_int8(params, np.asarray(rays[:n]))

    def _fused_factory_kwargs(self):
        mode = getattr(self.cfg, "trunk_int8", "none")
        if mode != "none" and getattr(self, "act_scales", None) is None:
            raise RuntimeError(
                f"render.trunk_int8={mode!r} requires per-scene activation "
                "scales: call renderer.calibrate_int8(params, rays) before "
                "the fused eval path (predict/render_novel_views do this "
                "lazily with their first ray batch)")
        return dict(
            interpret=getattr(self, "fused_interpret", False),
            early_term_eps=self.cfg.early_term_eps,
            trunk_int8=mode,
            act_scales=getattr(self, "act_scales", None))

    @functools.cached_property
    def _fused_eval(self):
        """One jitted call per chunk: weight packing and the appearance
        embedding gather live INSIDE the jit — issuing them eagerly costs
        dozens of dispatches per chunk (seconds over a remote device link).
        """
        from ..ops.pallas.render_kernel import make_fused_hierarchical

        render, pack = make_fused_hierarchical(
            self, **self._fused_factory_kwargs())
        if self.cfg.appearance_embedding:
            def call(params, rays, rid):
                wc, wf = pack(params)
                app = params["embedding_a"]["weight"][rid]
                return render(wc, wf, rays, app)
        else:
            def call(params, rays, rid=None):
                wc, wf = pack(params)
                return render(wc, wf, rays, None)
        return jax.jit(call)

    @functools.cached_property
    def _fused_eval_scan(self):
        """Scan-grouped dispatch: weights packed ONCE, then ``lax.scan`` of
        the fused render over a (G, C, 12) chunk stack — one program and one
        host dispatch per G chunks.  Scene caching renders thousands of
        chunks; folding the chunk loop into the program amortizes the
        per-dispatch floor and the per-chunk weight repack (measured on v5e:
        23.1 -> 22.0 ms per 9216-ray chunk at G=8)."""
        from ..ops.pallas.render_kernel import make_fused_hierarchical

        render, pack = make_fused_hierarchical(
            self, **self._fused_factory_kwargs())
        if self.cfg.appearance_embedding:
            def call(params, rays3, rid2):
                wc, wf = pack(params)
                emb = params["embedding_a"]["weight"]

                def body(_, rr):
                    rays, rid = rr
                    return None, render(wc, wf, rays, emb[rid])

                return jax.lax.scan(body, None, (rays3, rid2))[1]
        else:
            def call(params, rays3, rid2=None):
                wc, wf = pack(params)

                def body(_, rays):
                    return None, render(wc, wf, rays, None)

                return jax.lax.scan(body, None, rays3)[1]
        return jax.jit(call)

    def fused_predict(self, params, rays, w: int | None = None,
                      h: int | None = None, chunk_rays: int = 9216,
                      ray_id=None, scan_chunks: int = 8):
        """Eval render through the fused kernel (rgb/depth/feat/pts only).

        Full groups of ``scan_chunks`` chunks go through the scan-grouped
        program (one dispatch per group); the tail falls back to the
        per-chunk program.  Exactly two compiled programs regardless of the
        batch size."""
        if rays.shape[0] == 0:
            raise ValueError("fused_predict: empty ray batch")
        self._ensure_int8_calibrated(params, rays)
        fn = self._fused_eval
        rid_np = None
        if self.cfg.appearance_embedding:
            rid_np = (np.ones((rays.shape[0],), np.int32) if ray_id is None
                      else np.asarray(ray_id).astype(np.int32))
        n = rays.shape[0]
        # Pad to a 128-ray multiple (one compile per distinct padded size);
        # chunk only batches larger than chunk_rays.
        n_pad = (-n) % 128
        rays_np = np.asarray(rays)
        rays_p = np.concatenate(
            [rays_np, np.broadcast_to(rays_np[-1:], (n_pad, rays_np.shape[-1]))]
        ) if n_pad else rays_np
        rid_p = None
        if rid_np is not None:
            rid_p = np.concatenate(
                [rid_np, np.broadcast_to(rid_np[-1:], (n_pad,))]
            ) if n_pad else rid_np
        step = chunk_rays if rays_p.shape[0] > chunk_rays else rays_p.shape[0]
        step = max(step - step % 128, 128)
        chunks = []
        start = 0
        group = scan_chunks * step
        while scan_chunks > 1 and rays_p.shape[0] - start >= group:
            part = rays_p[start : start + group].reshape(
                scan_chunks, step, rays_p.shape[-1])
            if rid_p is not None:
                rp = rid_p[start : start + group].reshape(scan_chunks, step)
                out = self._fused_eval_scan(params, jnp.asarray(part),
                                            jnp.asarray(rp))
            else:
                out = self._fused_eval_scan(params, jnp.asarray(part))
            chunks.append({k: np.asarray(v).reshape(-1, *v.shape[2:])
                           for k, v in out.items()})
            start += group
        for i in range(start, rays_p.shape[0], step):
            part = rays_p[i : i + step]
            rpart = rid_p[i : i + step] if rid_p is not None else None
            # rays_p and step are both 128-multiples, so every tail slice
            # already is too.
            assert part.shape[0] % 128 == 0, part.shape
            if rpart is not None:
                chunks.append(fn(params, jnp.asarray(part), jnp.asarray(rpart)))
            else:
                chunks.append(fn(params, jnp.asarray(part)))
        preds = {k: np.concatenate([np.asarray(c[k]) for c in chunks])[:n]
                 for k in chunks[0]}
        if w is not None and h is not None:
            for k in ["rgb_coarse", "depth_coarse", "rgb_fine", "depth_fine"]:
                if k in preds and preds[k].shape[0] == h * w:
                    preds[k] = preds[k].reshape(h, w, -1)
        return preds

    def predict(self, params, rays, w: int | None = None, h: int | None = None,
                ray_id=None, ret_pfeat: bool = False, chunk_rays: int = 4096,
                use_fused: bool | None = None):
        """Full-batch eval render with host-side fixed-shape chunking.

        Pads the ray batch to a multiple of ``chunk_rays`` so only one program
        is compiled, then strips padding and reshapes image-shaped outputs.
        ``use_fused`` (default: auto when supported and features are
        requested) routes through the fused Pallas kernel.
        """
        if use_fused is None:
            use_fused = ret_pfeat and self.fused_eval_supported
        if use_fused and self.fused_eval_supported:
            return self.fused_predict(params, rays, w, h, ray_id=ray_id)
        n = rays.shape[0]
        if n == 0:
            raise ValueError("predict: empty ray batch")
        n_pad = (-n) % chunk_rays
        rays_p = np.concatenate(
            [np.asarray(rays), np.broadcast_to(np.asarray(rays[-1:]), (n_pad, rays.shape[-1]))]
        ) if n_pad else np.asarray(rays)
        rid = None
        if ray_id is not None:
            rid = np.concatenate([np.asarray(ray_id),
                                  np.zeros(n_pad, np.int32)]) if n_pad else np.asarray(ray_id)

        chunks = []
        fn = self._render_jit
        for i in range(0, rays_p.shape[0], chunk_rays):
            r = jnp.asarray(rays_p[i : i + chunk_rays])
            ri = jnp.asarray(rid[i : i + chunk_rays]) if rid is not None else None
            chunks.append(fn(params, r, ray_id=ri, train=False,
                             ret_pfeat=ret_pfeat, validation=True))
        preds = {
            k: np.concatenate([np.asarray(c[k]) for c in chunks])[:n]
            for k in chunks[0]
        }
        img_keys = ["rgb_coarse", "depth_coarse", "rgb_fine", "depth_fine"]
        if w is not None and h is not None:
            for k in img_keys:
                if k in preds and preds[k].shape[0] == h * w:
                    preds[k] = preds[k].reshape(h, w, -1)
        return preds

    def render_novel_view(self, params, img_hw, K, c2w, unnorm_scene,
                          downsample: int = 8):
        """Render rgb + 3D points + NeRF features on a ds-grid at a given pose.

        Matches the reference API (``renderer.py:315-333``): ``c2w`` is a
        *world*-frame pose; it is normalized into the scene sphere internally,
        and returned points are un-normalized back to world coords.
        """
        H, W = img_hw
        unnorm_scene = np.asarray(unnorm_scene)
        c2w_n = jnp.asarray(np.linalg.inv(unnorm_scene) @ np.asarray(c2w))
        rays = sample_nerf_rays(H, W, jnp.asarray(K), c2w_n, ds=downsample,
                                embed_type=self.cfg.embed_type)
        preds = self.predict(params, rays, W // downsample, H // downsample,
                             ret_pfeat=True)
        pt3d = unnormalize_pts(jnp.asarray(preds["pts_fine"])[None],
                               jnp.asarray(unnorm_scene)[None])[0]
        return dict(im_pred=preds["rgb_fine"], pt3d=np.asarray(pt3d),
                    pt_feat=preds["feat_fine"])

    def render_novel_views(self, params, img_hw, Ks, c2ws, unnorm_scenes,
                           downsample: int = 8):
        """Batched :meth:`render_novel_view` at ``B`` poses.

        One scan-grouped fused dispatch instead of ``B`` sequential renders
        — the ``--eval_bs`` batching for the ``--iters 2`` re-render loop
        (the production 7-Scenes protocol, reference
        ``model_eval/README.md:54-141``; the reference re-renders one query
        at a time, ``nerfmatch_evaluator.py``).

        Bit-matches the per-pose path: identical per-pose ray building and
        128-multiple padding, and the scan body is the same fused kernel
        the single-chunk program runs (per-chunk ray tiling unchanged, so
        even the early-termination tile votes are identical).
        """
        H, W = img_hw
        B = len(c2ws)
        if not self.fused_eval_supported:
            outs = [self.render_novel_view(params, img_hw, Ks[b], c2ws[b],
                                           unnorm_scenes[b], downsample)
                    for b in range(B)]
            return {k: np.stack([np.asarray(o[k]) for o in outs])
                    for k in outs[0]}
        rays = []
        for b in range(B):
            un = np.asarray(unnorm_scenes[b])
            c2w_n = jnp.asarray(np.linalg.inv(un) @ np.asarray(c2ws[b]))
            rays.append(np.asarray(sample_nerf_rays(
                H, W, jnp.asarray(Ks[b]), c2w_n, ds=downsample,
                embed_type=self.cfg.embed_type)))
        n = rays[0].shape[0]
        n_pad = (-n) % 128
        rays_p = np.stack([
            np.concatenate([r, np.broadcast_to(r[-1:], (n_pad, r.shape[-1]))])
            if n_pad else r for r in rays])
        self._ensure_int8_calibrated(params, rays_p[0])
        if self.cfg.appearance_embedding:
            rid = jnp.ones((B, rays_p.shape[1]), jnp.int32)
            out = self._fused_eval_scan(params, jnp.asarray(rays_p), rid)
        else:
            out = self._fused_eval_scan(params, jnp.asarray(rays_p))
        pts = np.asarray(out["pts_fine"])[:, :n]
        feat = np.asarray(out["feat_fine"])[:, :n]
        # Same shape contract as the per-pose fallback, whose predict(w, h)
        # reshapes rgb to images: (B, H/ds, W/ds, 3).
        rgb = np.asarray(out["rgb_fine"])[:, :n].reshape(
            B, H // downsample, W // downsample, -1)
        pt3d = np.stack([
            np.asarray(unnormalize_pts(
                jnp.asarray(pts[b])[None],
                jnp.asarray(np.asarray(unnorm_scenes[b]))[None])[0])
            for b in range(B)])
        return dict(im_pred=rgb, pt3d=pt3d, pt_feat=feat)
