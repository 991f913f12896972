"""Command-line interface for the TPU-native STAC pipeline.

Same surface as the reference CLI (stac_mjx/cli.py): --config-path /
--config-name / --base-path / --print-config / --skip-xla-flags plus
pass-through ``group=name`` / ``a.b=value`` overrides.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import stac_mjx_tpu
from stac_mjx_tpu.config import compose_config


def parse_args(argv=None):
    """Parse CLI args; unknown args become config overrides."""
    parser = argparse.ArgumentParser(
        description="Run TPU-native STAC inverse kinematics from the command line."
    )
    parser.add_argument(
        "--config-path",
        default="configs",
        help="Path to config directory (default: configs)",
    )
    parser.add_argument(
        "--config-name",
        default="config",
        help="Config name to load (default: config)",
    )
    parser.add_argument(
        "--base-path",
        default=str(Path.cwd()),
        help="Base path for resolving data/model paths in the config (default: CWD)",
    )
    parser.add_argument(
        "--print-config",
        action="store_true",
        help="Print the resolved config and exit.",
    )
    parser.add_argument(
        "--skip-xla-flags",
        action="store_true",
        help="Do not set XLA flags before running.",
    )
    parser.add_argument(
        "--cpu",
        action="store_true",
        help="Force the CPU backend (debug/goldens).",
    )
    args, overrides = parser.parse_known_args(argv)
    return args, overrides


def run_pipeline(cfg, base_path: Path, enable_xla: bool = True):
    """Execute the STAC pipeline given a composed config."""
    if enable_xla:
        stac_mjx_tpu.enable_xla_flags()
    kp_data, sorted_kp_names = stac_mjx_tpu.load_data(cfg, base_path=base_path)
    return stac_mjx_tpu.run_stac(cfg, kp_data, sorted_kp_names, base_path=base_path)


def main(argv=None) -> int:
    """CLI entry point."""
    logging.basicConfig(level=logging.INFO)
    args, overrides = parse_args(argv)
    base_path = Path(args.base_path).resolve()

    if args.cpu:
        from stac_mjx_tpu.utils.xla import force_cpu

        force_cpu()

    cfg = compose_config(
        config_path=args.config_path,
        config_name=args.config_name,
        overrides=overrides,
    )
    if args.print_config:
        print(cfg.to_yaml())
        return 0

    fit_path, ik_only_path = run_pipeline(
        cfg=cfg, base_path=base_path, enable_xla=not args.skip_xla_flags
    )
    logging.info("Run complete.")
    logging.info("Fit path: %s", fit_path)
    logging.info("IK-only path: %s", ik_only_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
