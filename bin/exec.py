#!/usr/bin/env python
"""CLI entry point — parity with /root/reference/bin/exec.py (hydra app with
train / iotest / inference / visualize modes, output dir output/<detector>/<run.id>,
rank-0 logging, full config dump at startup), without the hydra dependency.

Usage:
    python bin/exec.py --config-name dune3d run.id=mytrain run.minibatch_size=8
    python bin/exec.py --config-name synthetic mode=iotest
    python bin/exec.py --config-name dune3d mode=inference run.id=mytrain
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sparseeventid_tpu.config import format_config, load_config
from sparseeventid_tpu.utils import getLogger


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--config-name", default="synthetic", help="recipe name under recipes/"
    )
    parser.add_argument(
        "--recipes-dir", default=None, help="override recipes directory"
    )
    parser.add_argument(
        "overrides", nargs="*", help="hydra-style dotted overrides key=value"
    )
    args = parser.parse_args(argv)

    cfg = load_config(
        args.config_name,
        args.overrides,
        recipes_dir=Path(args.recipes_dir) if args.recipes_dir else None,
    )

    logger = getLogger()
    logger.info("-- CONFIG --\n" + format_config(cfg))

    from sparseeventid_tpu.parallel import initialize_distributed

    if cfg.run.distributed:
        initialize_distributed()

    from sparseeventid_tpu.train.trainer import run_mode

    return run_mode(cfg)


if __name__ == "__main__":
    main()
