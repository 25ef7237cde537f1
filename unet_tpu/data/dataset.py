"""Binary image dataset (.bin, magic 20240620) reader/writer + loader.

File contract (reference prepare_data.py:19-51, loader
train_unet.cu:3032-3099): 256-int32 header [magic, n_imgs, C, H, W]
followed by n_imgs fp32 images, CHW, values in [-1, 1].

The reader memory-maps the file and serves NHWC batches (TPU layout);
the CHW->HWC transpose happens on host at batch-assembly time.  The
reference loader streams sequentially with no shuffling
(train_unet.cu:3085-3096); that is the default here too, with optional
shuffling for real training runs.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

MAGIC = 20240620
HEADER_INTS = 256


def write_bin(path: str, images: np.ndarray) -> None:
    """images: (N, C, H, W) fp32 in [-1, 1]."""
    n, c, h, w = images.shape
    header = np.zeros(HEADER_INTS, dtype=np.int32)
    header[0], header[1], header[2], header[3], header[4] = MAGIC, n, c, h, w
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(np.ascontiguousarray(images, dtype=np.float32).tobytes())


def images_to_bin(image_dir: str, out_path: str, *, size: int = 64) -> int:
    """Directory of images -> .bin (reference prepare_data.py:19-38).
    Returns the number of images written.

    Unlike the reference (which assumes pre-sized inputs and writes raw
    bytes under a hardcoded 64x64 header — silently corrupting the file
    for any other input size), non-square/mis-sized images are
    center-cropped to square and bicubic-resized to `size`.
    """
    from PIL import Image  # lazy: PIL only needed for this entry point

    files = _list_images(image_dir)
    header = np.zeros(HEADER_INTS, dtype=np.int32)
    header[0], header[1] = MAGIC, len(files)
    header[2], header[3], header[4] = 3, size, size
    with open(out_path, "wb") as f:
        f.write(header.tobytes())
        for fname in files:
            img = Image.open(fname).convert("RGB")
            if img.size != (size, size):
                side = min(img.size)
                left = (img.width - side) // 2
                top = (img.height - side) // 2
                img = img.crop((left, top, left + side, top + side))
                img = img.resize((size, size), Image.BICUBIC)
            arr = np.asarray(img).astype(np.float32) / 127.5 - 1.0
            f.write(arr.transpose(2, 0, 1).astype(np.float32).tobytes())
    return len(files)


def _list_images(data_dir: str):
    exts = {"jpg", "jpeg", "png", "gif"}
    results = []
    for entry in sorted(os.listdir(data_dir)):
        full = os.path.join(data_dir, entry)
        if os.path.isdir(full):
            results.extend(_list_images(full))
        elif "." in entry and entry.rsplit(".", 1)[-1].lower() in exts:
            results.append(full)
    return results


class BinDataset:
    """Memory-mapped view over a .bin dataset; zero-copy until batch read."""

    def __init__(self, path: str):
        header = np.fromfile(path, dtype=np.int32, count=HEADER_INTS)
        if header[0] != MAGIC:
            raise ValueError(f"bad magic {header[0]} in {path}")
        self.n_images = int(header[1])
        self.channels = int(header[2])
        self.height = int(header[3])
        self.width = int(header[4])
        self._mmap = np.memmap(
            path, dtype=np.float32, mode="r", offset=HEADER_INTS * 4,
            shape=(self.n_images, self.channels, self.height, self.width))

    def __len__(self) -> int:
        return self.n_images

    def batch_nhwc(self, indices: np.ndarray) -> np.ndarray:
        """Gather a batch and transpose to NHWC fp32."""
        return np.ascontiguousarray(
            self._mmap[indices].transpose(0, 2, 3, 1), dtype=np.float32)


def image_dir_loader(data_dir: str, batch_size: int, *, size: int = 64,
                     class_cond: bool = False, randomize: bool = False,
                     seed: int = 0, skip_batches: int = 0) -> Iterator:
    """Infinite NHWC batch iterator directly over a directory of images —
    the torch trainer's data surface (reference train_unet.py:490-536):
    optional p=0.5 horizontal flip and shuffling when `randomize`, and
    class labels derived from the filename prefix before '_' when
    `class_cond` (yielding (batch, labels) tuples).

    skip_batches=N fast-forwards past the first N batches without decoding
    any image: cursor arithmetic plus replaying the rng draws (one
    permutation per epoch, one flip draw per image) so a resumed run sees
    the exact stream the original would have from step N on — the same
    trajectory-faithful-resume contract as data_loader.
    """
    from PIL import Image

    files = _list_images(data_dir)
    if not files:
        raise ValueError(f"no images under {data_dir}")
    labels = None
    if class_cond:
        names = [os.path.basename(p).split("_")[0] for p in files]
        class_of = {x: i for i, x in enumerate(sorted(set(names)))}
        labels = np.asarray([class_of[x] for x in names], np.int32)
    rng = np.random.default_rng(seed)

    def load(idx):
        img = Image.open(files[idx]).convert("RGB")
        if img.size != (size, size):
            side = min(img.size)
            left = (img.width - side) // 2
            top = (img.height - side) // 2
            img = img.crop((left, top, left + side, top + side))
            img = img.resize((size, size), Image.BICUBIC)
        arr = np.asarray(img).astype(np.float32) / 127.5 - 1.0
        if randomize and rng.random() < 0.5:
            arr = arr[:, ::-1]
        return arr  # HWC

    n = len(files)
    per_epoch = max(len(range(0, n - batch_size + 1, batch_size)), 1)
    if randomize:  # replay rng draws of the skipped prefix
        for _ in range(skip_batches // per_epoch):
            rng.permutation(n)
            rng.random(per_epoch * batch_size)
    start = skip_batches % per_epoch
    while True:
        order = rng.permutation(n) if randomize else np.arange(n)
        if randomize and start:
            rng.random(start * batch_size)
        for i in range(start * batch_size, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            batch = np.stack([load(j) for j in idx])
            if class_cond:
                yield batch, labels[idx]
            else:
                yield batch
        start = 0


def data_loader(path: str, batch_size: int, *, shuffle: bool = False,
                flip: bool = False,
                seed: int = 0, num_shards: int = 1, shard_index: int = 0,
                skip_batches: int = 0,
                ) -> Iterator[np.ndarray]:
    """Infinite NHWC batch iterator.

    Default (shuffle=False) matches the reference loader: sequential
    fixed-stride batches wrapping at EOF (train_unet.cu:3085-3096).
    flip=True applies the torch pipeline's p=0.5 horizontal flip
    (reference train_unet.py:527-528).  With num_shards > 1, each shard
    reads a disjoint interleaved slice for data-parallel training (no
    reference analog; parallelism is green-field per SURVEY.md
    section 2.8).

    skip_batches=N fast-forwards the stream past its first N batches
    WITHOUT reading pixel data — cursor arithmetic plus replaying the
    rng draws (flip masks, shuffle permutations) so a resumed run sees
    the exact batch sequence the original run would have from step N on.
    The stream position is checkpointed as header[14]
    (unet_tpu/io/checkpoint.py); the reference keeps it only in RAM and
    always restarts at 0 (train_unet.cu:3050-3062).
    """
    ds = BinDataset(path)
    n = len(ds)
    if n < batch_size * num_shards:
        # loud instead of silently clamping per_epoch to 1: a short shard
        # slice would yield ragged batches that retrace or crash a
        # compiled step downstream (round-4 ADVICE item 1)
        raise ValueError(
            f"dataset has {n} images < batch_size*num_shards = "
            f"{batch_size}*{num_shards}; every rank needs at least one "
            f"full batch per epoch")
    rng = np.random.default_rng(seed)

    def maybe_flip(batch):
        if not flip:
            return batch
        mask = rng.random(batch.shape[0]) < 0.5
        batch = batch.copy()
        batch[mask] = batch[mask, :, ::-1]  # flip width (NHWC axis 2)
        return batch

    def skip_flip_draws(k_batches):
        if flip and k_batches:
            rng.random((k_batches, batch_size))

    if shuffle:
        # per_epoch comes from the GLOBAL size, not the shard slice: all
        # ranks share one seeded stream, and shard-local lengths differ
        # when num_shards does not divide n — a per-rank per_epoch would
        # desynchronize the permutation cadence after the first epoch
        # and silently overlap the shards (round-3 ADVICE item 1).
        # Every rank's slice holds >= per_epoch*batch_size images:
        # floor(n/S) >= B*floor(n/(B*S)).
        per_epoch = max(n // (batch_size * num_shards), 1)
        # replay whole epochs (one permutation + its flip draws each) ...
        for _ in range(skip_batches // per_epoch):
            rng.permutation(n)
            skip_flip_draws(per_epoch)
        start = skip_batches % per_epoch
        while True:
            perm = rng.permutation(n)
            perm = perm[shard_index::num_shards]
            skip_flip_draws(start)  # ... then the partial epoch
            for i in range(start, per_epoch):
                yield maybe_flip(ds.batch_nhwc(
                    perm[i * batch_size:(i + 1) * batch_size]))
            start = 0
    else:
        idx = np.arange(n)[shard_index::num_shards]
        # same GLOBAL epoch length as the shuffle branch, so all ranks
        # wrap in lockstep and the native loader (one per_epoch for both
        # modes) stays bit-identical
        per_epoch = max(n // (batch_size * num_shards), 1)
        m = per_epoch * batch_size
        pos = (skip_batches % per_epoch) * batch_size
        skip_flip_draws(skip_batches)
        while True:
            if pos + batch_size > m:
                pos = 0
            yield maybe_flip(ds.batch_nhwc(idx[pos:pos + batch_size]))
            pos += batch_size
