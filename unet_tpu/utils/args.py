"""Defaults-dict -> argparse auto-generation.

The reference's config/flag system (reference utils.py:26-33,
train_unet.py:660-727): every key of a defaults dict becomes a CLI flag
with type inferred from the default; bools accept true/false strings.
"""

from __future__ import annotations

import argparse
from typing import Dict


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def add_dict_to_argparser(parser: argparse.ArgumentParser,
                          defaults: Dict) -> None:
    for k, v in defaults.items():
        v_type = type(v)
        if v is None:
            v_type = str
        elif isinstance(v, bool):
            v_type = str2bool
        parser.add_argument(f"--{k}", default=v, type=v_type)


def args_to_dict(args: argparse.Namespace, keys) -> Dict:
    return {k: getattr(args, k) for k in keys}
