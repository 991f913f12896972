"""Console entry point (``stac-mjx-tpu``).

Flag surface matches the reference CLI (stac_mjx/cli.py:14-55): config
directory/name, base path, --print-config, --skip-xla-flags, plus free-form
``group=name`` / ``a.b=value`` overrides forwarded to config composition.
TPU-build extras: ``--cpu`` (force the CPU backend) and ``--distributed``
(multi-host pod entry; one process per host).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

log = logging.getLogger(__name__)

_FLAGS = (
    ("--config-path", dict(default="configs", help="config directory")),
    ("--config-name", dict(default="config", help="root config to compose")),
    ("--base-path", dict(default=None, help="root for data/model paths (default: CWD)")),
    (
        "--print-config",
        dict(action="store_true", help="dump the composed config as YAML and exit"),
    ),
    (
        "--skip-xla-flags",
        dict(action="store_true", help="leave XLA flags/compile cache untouched"),
    ),
    ("--cpu", dict(action="store_true", help="force the CPU backend")),
    (
        "--distributed",
        dict(
            action="store_true",
            help="multi-host run: initialize jax.distributed and shard clips "
            "over every chip in the pod (launch one process per host)",
        ),
    ),
)


def build_parser() -> argparse.ArgumentParser:
    """The argument parser; config overrides are collected as unknowns."""
    parser = argparse.ArgumentParser(
        prog="stac-mjx-tpu",
        description="TPU-native STAC: register mocap keypoints onto a MuJoCo "
        "body model. Unrecognized KEY=VALUE arguments override config fields.",
    )
    for flag, kw in _FLAGS:
        parser.add_argument(flag, **kw)
    return parser


def parse_args(argv=None):
    """Split argv into known flags and pass-through config overrides."""
    return build_parser().parse_known_args(argv)


def run_pipeline(cfg, base_path: Path, enable_xla: bool = True):
    """Load data and execute the pipeline for a composed config."""
    import stac_mjx_tpu

    if enable_xla:
        stac_mjx_tpu.enable_xla_flags()
    kp_data, kp_names = stac_mjx_tpu.load_data(cfg, base_path=base_path)
    return stac_mjx_tpu.run_stac(cfg, kp_data, kp_names, base_path=base_path)


def main(argv=None) -> int:
    """Entry point: compose config, then run (or just print) it."""
    logging.basicConfig(level=logging.INFO)
    args, overrides = parse_args(argv)

    if args.cpu:
        from stac_mjx_tpu.utils.xla import force_cpu

        force_cpu()
    if args.distributed:
        from stac_mjx_tpu.parallel.mesh import init_distributed

        init_distributed()

    from stac_mjx_tpu.config import compose_config

    cfg = compose_config(
        config_path=args.config_path,
        config_name=args.config_name,
        overrides=overrides,
    )
    if args.print_config:
        print(cfg.to_yaml())
        return 0

    base_path = Path(args.base_path).resolve() if args.base_path else Path.cwd()
    if args.distributed:
        from stac_mjx_tpu.parallel.distributed import run_stac_distributed

        paths = run_stac_distributed(cfg, base_path=base_path)
    else:
        paths = run_pipeline(
            cfg, base_path=base_path, enable_xla=not args.skip_xla_flags
        )
    log.info("artifacts: fit=%s ik=%s", *paths)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
