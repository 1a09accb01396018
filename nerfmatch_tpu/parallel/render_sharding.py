"""Ray-axis-sharded fused rendering over a device mesh.

The SURVEY §5 scaling story for rendering: rays are embarrassingly parallel,
so the multi-chip feature-cache / eval render is the fused single-chip
Pallas program wrapped in ``shard_map`` with the ray axis split over the
``data`` mesh axis (the reference renders per-GPU image shards by hand,
``model_eval/README.md:116``).  Weights are replicated; no collectives are
needed — each device runs the full coarse->resample->fine pipeline on its
ray shard and the outputs come back sharded on the same axis.

``shard_map`` (rather than plain jit sharding propagation) is load-bearing:
Pallas kernels see the per-device LOCAL shapes, so the same kernel grid that
runs single-chip runs per-shard unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import data_sharding, replicated


def make_sharded_render(mesh: Mesh, renderer, interpret: bool = False,
                        ray_tile: int = 16):
    """Build ``render(w_coarse, w_fine, rays) -> preds`` with rays sharded
    over the mesh's ``data`` axis.

    ``rays`` (N, 12) must have N divisible by (data axis size * ray_tile).
    Returns per-ray outputs sharded the same way (a host fetch gathers
    them transparently).
    """
    from ..ops.pallas.render_kernel import make_fused_hierarchical

    render, pack = make_fused_hierarchical(renderer, interpret=interpret,
                                           ray_tile=ray_tile)
    # Appearance renderers take a 4th per-ray operand (the gathered
    # embedding rows) — shard it on the ray axis like the rays.
    app_dim = 16 if renderer.cfg.appearance_embedding else 0
    in_specs = (P(), P(), P("data", None)) + \
        ((P("data", None),) if app_dim else ())

    sharded = jax.jit(partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P("data"),
        # pallas_call's out_shape structs carry no varying-mesh-axes info;
        # skip the vma check (outputs are plainly data-sharded).
        check_vma=False,
    )(render))

    def render_sharded(w_coarse, w_fine, rays, app=None):
        if app_dim and app is None:
            raise ValueError("appearance-embedding renderer: pass per-ray "
                             "app rows (params['embedding_a']['weight']"
                             "[ray_id]) as the 4th argument")
        rays = jax.device_put(rays, data_sharding(mesh, 2))
        w_coarse = jax.device_put(w_coarse, replicated(mesh))
        w_fine = jax.device_put(w_fine, replicated(mesh))
        if app_dim:
            app = jax.device_put(app, data_sharding(mesh, 2))
            return sharded(w_coarse, w_fine, rays, app)
        return sharded(w_coarse, w_fine, rays)

    return render_sharded, pack
