"""mip-NeRF subsystem: encodings, sampling, compositing, MLP, renderer."""

from .embedding import fourier_embedding, fourier_embedding_dim, ipe_embedding, pe_embedding
from .rays import get_ray_dirs, get_rays_c2w, prepare_rays_data, sample_nerf_rays
from .sampling import (
    sample_along_rays,
    sample_pts_init,
    sample_pdf,
    sample_gaussians_along_rays,
    resample_gaussians_along_rays,
)
from .compositing import volume_render
from .scene import (
    frustum_world_bounds,
    compute_world2nscene,
    compute_scene_normalization_fst,
    rays_intersect_sphere,
)
from .model import init_nerf_params, nerf_apply, NerfConfig
from .renderer import NerfRenderer, RenderConfig
