"""nerfmatch_tpu — a TPU-native (JAX/XLA/Pallas) NeRFMatch framework.

A from-scratch rebuild of the capabilities of nv-dvl/nerfmatch ("The NeRFect
Match", ECCV 2024) designed for TPU hardware:

- pure-functional models (parameter pytrees + apply functions) compiled with
  ``jax.jit`` / ``pjit`` over ``jax.sharding.Mesh`` device meshes,
- fixed shapes everywhere (padded + masked match sets instead of the
  reference's data-dependent cardinalities),
- Pallas kernels for the hot ray-render and matching ops,
- a host-side C++ PnP/RANSAC pose solver (replacing pycolmap/OpenCV).

Layout:
  config           YAML config system (inherit / wildcard / CLI merge)
  utils            geometry, metrics, optimizers, image IO
  nerf             mip-NeRF ops + renderer (embedding, sampling, compositing)
  models           matcher models (attention, ConvFormer backbone, coarse/c2f)
  ops              fixed-shape matching ops + Pallas kernels
  parallel         mesh construction and sharding rules
  data             host-side data pipeline
  train            training runtimes (optax + orbax)
  eval             evaluation / localization runtimes
  pose             PnP + RANSAC pose solving (native C++ w/ cv2+numpy fallback)
"""

__version__ = "0.1.0"
