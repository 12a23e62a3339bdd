"""Dataset sources: HF streaming ImageNet, local ImageFolder, COCO, synthetic.

Reference behavior (SURVEY.md §2.4): HF ``evanarlian/imagenet_1k_resized_256``
streaming with per-rank sharding (ref: train_2.py:184-188), torchvision
ImageFolder + DistributedSampler (ref: train.py:132-175), COCO via
instances_train2017.json (ref: train_working.py:46-96).

TPU-native shape: every source is a plain Python iterator of HWC float32 [0,1]
numpy arrays; sharding across hosts uses ``jax.process_index()`` (the pjit-world
analogue of rank sharding); batching/prefetch live in pipeline.py. All sources
are torch-free.
"""

from __future__ import annotations

import json
import os
import random
from typing import Iterator

import numpy as np

from .transforms import preprocess_file, preprocess_image

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def synthetic_dataset(resolution: int = 256, num_samples: int = 1024,
                      seed: int = 0) -> Iterator[np.ndarray]:
    """Deterministic random images — for tests, benches and smoke training."""
    rng = np.random.default_rng(seed)
    for _ in range(num_samples):
        yield rng.random((resolution, resolution, 3), np.float32)


def synthetic_shapes_dataset(resolution: int = 256, num_samples: int = 1024,
                             seed: int = 0) -> Iterator[np.ndarray]:
    """Structured synthetic images (gradient background + random rectangles/
    ellipses). Unlike uniform noise these are compressible, so reconstruction
    PSNR is meaningful — used for the quick-verify ladder
    (EXPERIMENTS.md:424-437 'PSNR > 25 dB') without a real dataset."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, resolution),
                         np.linspace(0, 1, resolution), indexing="ij")
    for _ in range(num_samples):
        c0 = rng.random(3)
        c1 = rng.random(3)
        angle = rng.random() * 2 * np.pi
        t = (np.cos(angle) * xx + np.sin(angle) * yy)
        t = (t - t.min()) / (np.ptp(t) + 1e-9)
        img = c0 + t[..., None] * (c1 - c0)
        for _ in range(rng.integers(2, 6)):
            color = rng.random(3)
            cy, cx = rng.random(2)
            h, w = 0.05 + 0.3 * rng.random(2)
            if rng.random() < 0.5:  # rectangle
                mask = ((np.abs(yy - cy) < h) & (np.abs(xx - cx) < w))
            else:  # ellipse
                mask = (((yy - cy) / h) ** 2 + ((xx - cx) / w) ** 2) < 1.0
            img = np.where(mask[..., None], color, img)
        yield img.astype(np.float32)


def _iter_decoded(files: list[str], resolution: int, num_workers: int,
                  label_of=None):
    """Decode an ordered path list, optionally in parallel.

    num_workers > 0 enables parallel decode (the reference's DataLoader
    worker analogue, ref: train.py:449-459): the native C++ decoder runs
    ``decode_batch`` chunks on its own threads (GIL-free) with one chunk
    prefetched ahead; the PIL fallback maps over a thread pool (PIL decode
    releases the GIL). Yields images or (image, label) when ``label_of`` is
    given; unreadable files are skipped like a DataLoader would.
    """
    from . import native_loader

    native = native_loader.native_available()
    if num_workers <= 0:  # serial path (tests, tiny runs)
        for path in files:
            if native:
                sample = native_loader.decode_file(path, resolution)
            else:
                try:
                    sample = preprocess_file(path, resolution)
                except Exception:
                    sample = None
            if sample is None:
                continue
            yield (sample, label_of(path)) if label_of else sample
        return

    if native:
        from concurrent.futures import ThreadPoolExecutor

        chunk_size = max(num_workers * 4, 16)
        chunks = [files[i:i + chunk_size]
                  for i in range(0, len(files), chunk_size)]
        with ThreadPoolExecutor(max_workers=1) as ex:  # double buffer
            pending = None
            for nxt in chunks + [None]:
                fut = (ex.submit(native_loader.decode_batch, nxt, resolution,
                                 num_workers) if nxt is not None else None)
                if pending is not None:
                    (batch, ok), paths = pending[0].result(), pending[1]
                    for img, good, path in zip(batch, ok, paths):
                        if good:
                            yield (img, label_of(path)) if label_of else img
                pending = (fut, nxt)
    else:
        from concurrent.futures import ThreadPoolExecutor

        def decode_one(path):
            try:
                return path, preprocess_file(path, resolution)
            except Exception:
                return path, None

        with ThreadPoolExecutor(max_workers=num_workers) as ex:
            for path, img in ex.map(decode_one, files, chunksize=4):
                if img is not None:
                    yield (img, label_of(path)) if label_of else img


def folder_class_index(root: str) -> dict[str, int]:
    """ImageFolder class mapping: sorted immediate subdirectories of root."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    return {c: i for i, c in enumerate(classes)}


def image_folder_dataset(root: str, resolution: int = 256,
                         shuffle: bool = True, seed: int = 42,
                         shard_index: int | None = None,
                         num_shards: int | None = None,
                         repeat: bool = False,
                         with_labels: bool = False,
                         num_workers: int = 0) -> Iterator:
    """Recursive folder-of-images loader (ImageFolder semantics; ref:
    train.py:132-175). With ``with_labels`` each item is ``(image, label)``
    where label is the index of the top-level class directory (-1 for images
    not under one) — the torchvision ImageFolder contract. ``num_workers``
    enables parallel decode (see _iter_decoded)."""
    files = []
    for dirpath, _, names in os.walk(root):
        for n in sorted(names):
            if n.lower().endswith(IMAGE_EXTENSIONS):
                files.append(os.path.join(dirpath, n))
    files.sort()
    if not files:
        raise FileNotFoundError(f"No images under {root}")
    class_to_idx = folder_class_index(root) if with_labels else {}

    def label_of(path: str) -> int:
        rel = os.path.relpath(path, root)
        head = rel.split(os.sep, 1)[0]
        return class_to_idx.get(head, -1)

    if num_shards and num_shards > 1:
        idx = shard_index or 0
        files = files[idx::num_shards]
    epoch = 0
    while True:
        order = list(files)
        if shuffle:
            random.Random(seed + epoch).shuffle(order)
        yield from _iter_decoded(order, resolution, num_workers,
                                 label_of if with_labels else None)
        epoch += 1
        if not repeat:
            return


def coco_dataset(root: str, resolution: int = 256,
                 split: str = "train2017", max_samples: int | None = None,
                 shard_index: int | None = None,
                 num_shards: int | None = None,
                 num_workers: int = 0,
                 repeat: bool = False) -> Iterator[np.ndarray]:
    """COCO images via the instances annotation file (ref:
    train_working.py:46-96; kagglehub auto-download is replaced by an explicit
    local ``root`` — this environment has no network egress)."""
    ann_path = os.path.join(root, "annotations", f"instances_{split}.json")
    img_dir = os.path.join(root, split)
    if os.path.exists(ann_path):
        with open(ann_path) as f:
            ann = json.load(f)
        names = [img["file_name"] for img in ann["images"]]
    else:
        names = sorted(n for n in os.listdir(img_dir)
                       if n.lower().endswith(IMAGE_EXTENSIONS))
    if max_samples:
        names = names[:max_samples]
    if num_shards and num_shards > 1:
        names = names[(shard_index or 0)::num_shards]
    files = [os.path.join(img_dir, name) for name in names]
    while True:
        yield from _iter_decoded(files, resolution, num_workers)
        if not repeat:
            return


def _pipelined_map(fn, iterable, num_workers: int) -> Iterator:
    """Order-preserving thread-pool map with a BOUNDED in-flight window —
    safe on unbounded streams (ThreadPoolExecutor.map would submit the whole
    iterable eagerly). PIL decode/resize releases the GIL, so threads give
    real parallelism here."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    depth = num_workers * 2
    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        window = deque()
        for item in iterable:
            window.append(ex.submit(fn, item))
            if len(window) >= depth:
                yield window.popleft().result()
        while window:
            yield window.popleft().result()


def hf_streaming_dataset(name: str = "evanarlian/imagenet_1k_resized_256",
                         split: str = "train", resolution: int = 256,
                         shuffle_buffer: int = 10_000, seed: int = 42,
                         shard_index: int | None = None,
                         num_shards: int | None = None,
                         with_labels: bool = False,
                         num_workers: int = 0) -> Iterator:
    """HF streaming ImageNet with rank sharding + buffered shuffle
    (ref: train_2.py:184-188). Requires network access to the HF hub; callers
    should fall back to another source when offline. ``num_workers`` decodes
    in a bounded thread-pool pipeline (the reference's DataLoader-worker
    analogue for the streaming path, ref: train_2.py:138-161)."""
    from datasets import load_dataset  # lazy: heavy import

    ds = load_dataset(name, split=split, streaming=True)
    if num_shards and num_shards > 1:
        ds = ds.shard(num_shards=num_shards, index=shard_index or 0)
    if shuffle_buffer:
        ds = ds.shuffle(seed=seed, buffer_size=shuffle_buffer)

    def decode(example):
        img = example.get("image") or example.get("img")
        if img is None:
            return None
        out = preprocess_image(img, resolution)
        return (out, int(example.get("label", -1))) if with_labels else out

    it = (_pipelined_map(decode, ds, num_workers) if num_workers > 0
          else map(decode, ds))
    return (s for s in it if s is not None)


def _with_dummy_labels(it: Iterator[np.ndarray]) -> Iterator:
    for sample in it:
        yield sample, -1


def make_dataset(source: str, resolution: int = 256,
                 with_labels: bool = False, **kw) -> Iterator:
    """Dispatch by source string: 'synthetic', 'hf:<name>', or a local path
    (COCO layout auto-detected).

    With ``with_labels`` every item is ``(image, label)``; sources without
    class structure (synthetic, COCO) yield label -1, which callers treat as
    'unlabeled' (e.g. DiT falls back to unconditional training)."""
    if source in ("synthetic", "shapes"):
        kw.pop("shard_index", None)
        kw.pop("num_shards", None)
        kw.pop("num_workers", None)
        fn = synthetic_dataset if source == "synthetic" else synthetic_shapes_dataset
        it = fn(resolution, **kw)
        return _with_dummy_labels(it) if with_labels else it
    if source.startswith("hf:"):
        kw.pop("repeat", None)
        return hf_streaming_dataset(source[3:], resolution=resolution,
                                    with_labels=with_labels, **kw)
    if os.path.isdir(os.path.join(source, "annotations")):
        it = coco_dataset(source, resolution=resolution, **kw)
        return _with_dummy_labels(it) if with_labels else it
    return image_folder_dataset(source, resolution=resolution,
                                with_labels=with_labels, **kw)
