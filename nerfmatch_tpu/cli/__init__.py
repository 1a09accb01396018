"""CLI entry points (python -m nerfmatch_tpu.cli.<name>)."""
