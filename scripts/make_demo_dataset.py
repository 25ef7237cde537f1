"""Build a real-image training set from photos bundled on this machine.

The reference's demo trains on ImageNet-64 elephants
(reference README.md:72-82); this machine has no network egress, so the
committed training demo (docs/TRAINING_DEMO.md) uses the photographic
images that ship inside installed packages — sklearn's `china.jpg` and
`flower.jpg` sample photos and matplotlib's `grace_hopper.jpg` portrait
— expanded into N random scale-augmented square crops, then packed into
the reference .bin format by the framework's own prepare_data path
(unet_tpu/cli/prepare_data.py, format contract reference
prepare_data.py:19-38).

Usage: python scripts/make_demo_dataset.py --out /tmp/demo64.bin
        [--n 4096] [--size 64] [--seed 0] [--keep_crops DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def source_images():
    """(name, PIL.Image) for every usable photo bundled on the machine."""
    from PIL import Image

    out = []
    try:
        from sklearn.datasets import load_sample_images

        for name, arr in zip(["china", "flower"],
                             load_sample_images().images):
            out.append((name, Image.fromarray(np.asarray(arr, np.uint8))))
    except Exception:
        pass
    try:
        import matplotlib

        p = os.path.join(matplotlib.get_data_path(), "sample_data",
                         "grace_hopper.jpg")
        if os.path.exists(p):
            out.append(("hopper", Image.open(p).convert("RGB")))
    except Exception:
        pass
    if not out:
        raise SystemExit("no bundled source photos found")
    return out


def write_crops(dest: str, n: int, size: int, seed: int,
                class_prefix: bool = False) -> int:
    """Random scale-jittered square crops, bicubic-resized to `size`.

    class_prefix=True names crops `<source>_<i>.png` so
    `--data_dir crops --class_cond true` derives labels from the prefix
    before '_' (the torch trainer's convention, reference
    train_unet.py:506-510) — used by the CFG training demo.  The default
    index-first naming keeps the sorted file order class-INTERLEAVED,
    which the unconditional `.bin` demo depends on (prepare_data packs
    files in sorted order; a class-grouped .bin would feed thousands of
    consecutive same-photo batches to a no-shuffle run)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    sources = [(name, img) for name, img in source_images()
               if min(img.size) >= size]
    if not sources:
        raise SystemExit(f"make_demo_dataset: no source photo has a "
                         f"short side >= {size}px")
    os.makedirs(dest, exist_ok=True)
    for i in range(n):
        name, img = sources[rng.integers(len(sources))]
        side_max = min(img.size)
        # scale jitter: crop between `size` and the full short side
        side = int(rng.integers(size, side_max + 1))
        x0 = int(rng.integers(0, img.width - side + 1))
        y0 = int(rng.integers(0, img.height - side + 1))
        crop = img.crop((x0, y0, x0 + side, y0 + side))
        if side != size:
            crop = crop.resize((size, size), Image.BICUBIC)
        stem = f"{name}_{i:06d}" if class_prefix else f"{i:06d}_{name}"
        crop.save(os.path.join(dest, stem + ".png"))
    return n


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--keep_crops", default="")
    args = p.parse_args(argv)

    from unet_tpu.cli import prepare_data

    crop_dir = args.keep_crops or tempfile.mkdtemp(prefix="demo_crops_")
    n = write_crops(crop_dir, args.n, args.size, args.seed)
    print(f"{n} crops in {crop_dir}")
    prepare_data.main(["--data_dir", crop_dir,
                       "--output_name", args.out,
                       "--size", str(args.size)])
    if not args.keep_crops:
        for f in os.listdir(crop_dir):
            os.remove(os.path.join(crop_dir, f))
        os.rmdir(crop_dir)


if __name__ == "__main__":
    main()
