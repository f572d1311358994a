"""Shared argparse plumbing for the repo-root entry-point scripts."""

from configurable_spectrograms_tpu.cli.common import (
    add_render_style_arguments,
    report_render_outcome,
    clean_exit,
    run_cli,
)

__all__ = ["add_render_style_arguments", "clean_exit", "report_render_outcome", "run_cli"]
