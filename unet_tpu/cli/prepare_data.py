"""Dataset preparation CLI (reference prepare_data.py surface).

python -m unet_tpu.cli.prepare_data --data_dir DIR --output_name out.bin

Writes the magic-20240620 .bin dataset format the trainers stream from.
"""

from __future__ import annotations

import argparse

from unet_tpu.data.dataset import images_to_bin
from unet_tpu.utils.args import add_dict_to_argparser


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, dict(
        data_dir="", output_name="data.bin", size=64))
    args = parser.parse_args(argv)
    if not args.data_dir:
        parser.error("--data_dir is required")
    n = images_to_bin(args.data_dir, args.output_name, size=args.size)
    print(f"wrote {n} images to {args.output_name}")


if __name__ == "__main__":
    main()
