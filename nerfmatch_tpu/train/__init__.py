"""Training runtimes: checkpointing, NeRF trainer, matcher trainers."""
