"""NeRF training CLI (capability match for ``model_train/train_nerf.py``)."""

from __future__ import annotations

import argparse

from ..config import load_yaml_config, merge_configs
from ..train.nerf_trainer import train


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="Path to (.yml) config file.")
    parser.add_argument("--scene", type=str, default=None)
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--prefix", type=str, default=None)
    parser.add_argument("--gpus", type=int, default=None,
                        help="Cap the device-mesh size (reference --gpus).")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="Raise at the op producing a NaN in the train "
                             "step (reference pl.Trainer detect_anomaly; "
                             "JAX re-runs the jitted step de-optimized to "
                             "locate it — debug only, slow).")
    return parser


def main(argv=None):
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()  # persistent XLA compile cache
    from ..parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()  # multi-host mesh (no-op single-process)
    args = build_parser().parse_args(argv)
    config, _ = load_yaml_config(args.config)
    config = merge_configs(config, args)
    if args.scene is not None:
        config.data.scene = args.scene
    if args.max_epochs is not None:
        config.exp.max_epochs = args.max_epochs
    if args.batch_size is not None:
        config.exp.batch_size = args.batch_size
    if args.prefix is not None:
        config.exp.prefix = args.prefix
    if args.gpus is not None:
        config.exp.gpus = args.gpus
    if args.debug:
        config.exp.debug = True
        config.exp.prefix = "debug"
    if args.detect_anomaly:
        import jax

        jax.config.update("jax_debug_nans", True)
    return train(config)


if __name__ == "__main__":
    main()
