"""Data pipeline + metrics/image-utils tests (host-side, fast)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepl_project_tpu.data import (batch_iterator, input_pipeline,
                                    make_dataset, prefetch_to_device,
                                    synthetic_dataset)
from deepl_project_tpu.utils import (make_grid, nchw_to_nhwc, nhwc_to_nchw,
                                     psnr, ssim, summarize, to_uint8)


def test_synthetic_dataset_deterministic():
    a = list(synthetic_dataset(8, 4, seed=1))
    b = list(synthetic_dataset(8, 4, seed=1))
    assert len(a) == 4
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
        assert x.shape == (8, 8, 3) and x.dtype == np.float32
        assert 0.0 <= x.min() and x.max() <= 1.0


def test_batch_iterator_shapes():
    batches = list(batch_iterator(synthetic_dataset(8, 10), 4, drop_last=True))
    assert len(batches) == 2
    assert batches[0].shape == (4, 8, 8, 3)
    batches = list(batch_iterator(synthetic_dataset(8, 10), 4, drop_last=False))
    assert len(batches) == 3
    assert batches[-1].shape == (2, 8, 8, 3)


def test_prefetch_to_device():
    batches = batch_iterator(synthetic_dataset(8, 8), 4)
    out = list(prefetch_to_device(batches, size=2))
    assert len(out) == 2
    assert out[0].shape == (4, 8, 8, 3)


def test_input_pipeline_end_to_end():
    out = list(input_pipeline(synthetic_dataset(8, 12), 4))
    assert len(out) == 3


def test_make_dataset_dispatch():
    it = make_dataset("synthetic", resolution=8, num_samples=2)
    assert next(it).shape == (8, 8, 3)


def test_image_folder(tmp_path):
    from PIL import Image

    for i in range(5):
        Image.fromarray(
            (np.random.rand(40, 30, 3) * 255).astype(np.uint8)).save(
                tmp_path / f"img{i}.png")
    it = make_dataset(str(tmp_path), resolution=16, shuffle=False)
    imgs = list(it)
    assert len(imgs) == 5
    assert imgs[0].shape == (16, 16, 3)


def test_transforms_resize_crop():
    from PIL import Image

    from deepl_project_tpu.data import preprocess_image

    img = Image.fromarray((np.random.rand(100, 60, 3) * 255).astype(np.uint8))
    out = preprocess_image(img, 32)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32


def test_psnr_identical_images():
    x = jnp.ones((2, 16, 16, 3)) * 0.5
    p = psnr(x, x)
    assert float(p[0]) > 100  # near-infinite for identical


def test_psnr_known_value():
    x = jnp.zeros((1, 8, 8, 3))
    y = jnp.full((1, 8, 8, 3), 0.1)
    np.testing.assert_allclose(float(psnr(x, y)[0]), 20.0, atol=1e-3)


def test_ssim_bounds():
    x = jnp.broadcast_to(
        jnp.linspace(0, 1, 32 * 32).reshape(1, 32, 32, 1), (2, 32, 32, 3))
    assert float(ssim(x, x)[0]) == pytest.approx(1.0, abs=1e-5)
    noisy = jnp.clip(x + 0.3 * np.random.RandomState(0).randn(2, 32, 32, 3), 0, 1)
    s = ssim(x, noisy)
    assert 0.0 < float(s[0]) < 0.95


def test_grid_and_layout_utils():
    imgs = np.random.rand(5, 8, 8, 3).astype(np.float32)
    grid = make_grid(imgs, nrow=3)
    assert grid.ndim == 3 and grid.shape[-1] == 3
    u8 = to_uint8(imgs)
    assert u8.dtype == np.uint8
    nchw = nhwc_to_nchw(imgs)
    assert nchw.shape == (5, 3, 8, 8)
    np.testing.assert_array_equal(nchw_to_nhwc(nchw), imgs)
    s = summarize(np.array([1.0, 2.0, 3.0]))
    assert s["mean"] == 2.0 and s["median"] == 2.0


def test_coco_dataset_layout(tmp_path):
    # COCO directory layout: annotations/instances_train2017.json + train2017/
    # (ref: train_working.py:46-96).
    import json

    from PIL import Image

    from deepl_project_tpu.data import coco_dataset

    img_dir = tmp_path / "train2017"
    ann_dir = tmp_path / "annotations"
    img_dir.mkdir()
    ann_dir.mkdir()
    names = []
    for i in range(4):
        name = f"{i:012d}.jpg"
        Image.fromarray((np.random.rand(50, 40, 3) * 255).astype(np.uint8)
                        ).save(img_dir / name)
        names.append(name)
    with open(ann_dir / "instances_train2017.json", "w") as f:
        json.dump({"images": [{"file_name": n} for n in names]}, f)

    imgs = list(coco_dataset(str(tmp_path), resolution=16, max_samples=3))
    assert len(imgs) == 3
    assert imgs[0].shape == (16, 16, 3)
    # Sharding across two hosts splits the list.
    sh0 = list(coco_dataset(str(tmp_path), resolution=16, shard_index=0,
                            num_shards=2))
    sh1 = list(coco_dataset(str(tmp_path), resolution=16, shard_index=1,
                            num_shards=2))
    assert len(sh0) + len(sh1) == 4


def test_prefetch_propagates_source_errors():
    # A dying data source must crash the consumer, not look like a clean
    # end-of-data (which would silently truncate a training run).
    from deepl_project_tpu.data.pipeline import prefetch_to_device

    def bad_source():
        yield np.zeros((1, 4, 4, 3), np.float32)
        raise RuntimeError("corrupt record")

    it = prefetch_to_device(bad_source())
    next(it)
    with pytest.raises(RuntimeError, match="corrupt record"):
        next(it)


def test_image_folder_labels(tmp_path):
    from PIL import Image

    for cls in ("cat", "dog"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            Image.new("RGB", (8, 8), (i * 40, 0, 0)).save(d / f"{i}.png")
    from deepl_project_tpu.data.datasets import (folder_class_index,
                                                 image_folder_dataset)

    assert folder_class_index(str(tmp_path)) == {"cat": 0, "dog": 1}
    items = list(image_folder_dataset(str(tmp_path), resolution=8,
                                      shuffle=False, with_labels=True))
    assert len(items) == 6
    labels = sorted(lab for _, lab in items)
    assert labels == [0, 0, 0, 1, 1, 1]
    img, lab = items[0]
    assert img.shape == (8, 8, 3) and img.dtype == np.float32


def test_batch_iterator_labeled_tuples():
    from deepl_project_tpu.data import make_dataset

    it = make_dataset("synthetic", resolution=8, num_samples=10,
                      with_labels=True)
    batches = list(batch_iterator(it, 4, drop_last=False))
    imgs, labels = batches[0]
    assert imgs.shape == (4, 8, 8, 3)
    assert labels.shape == (4,) and labels.dtype == np.int32
    assert (labels == -1).all()  # synthetic source is unlabeled
    assert batches[-1][0].shape[0] == 2  # ragged tail kept


def test_parallel_decode_matches_serial(tmp_path):
    from PIL import Image

    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(5):
            Image.fromarray(
                (np.random.RandomState(hash(cls) % 100 + i)
                 .rand(12, 12, 3) * 255).astype(np.uint8)
            ).save(d / f"{i}.png")
    from deepl_project_tpu.data.datasets import image_folder_dataset

    serial = list(image_folder_dataset(str(tmp_path), resolution=8,
                                       shuffle=False, with_labels=True,
                                       num_workers=0))
    parallel = list(image_folder_dataset(str(tmp_path), resolution=8,
                                         shuffle=False, with_labels=True,
                                         num_workers=4))
    assert len(serial) == len(parallel) == 10
    for (si, sl), (pi, pl) in zip(serial, parallel):
        np.testing.assert_array_equal(si, pi)  # order + pixels preserved
        assert sl == pl


def test_coco_parallel_and_repeat(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "train2017"
    img_dir.mkdir()
    for i in range(4):
        Image.fromarray((np.random.RandomState(i).rand(10, 10, 3) * 255)
                        .astype(np.uint8)).save(img_dir / f"{i}.jpg")
    from deepl_project_tpu.data.datasets import coco_dataset

    once = list(coco_dataset(str(tmp_path), resolution=8, num_workers=2))
    assert len(once) == 4
    it = coco_dataset(str(tmp_path), resolution=8, num_workers=2, repeat=True)
    twice = [next(it) for _ in range(8)]  # repeats past one epoch
    np.testing.assert_array_equal(twice[0], twice[4])


class _FakeStream:
    """Stand-in for a datasets streaming split: shard/shuffle/iterate."""

    def __init__(self, examples):
        self.examples = examples
        self.shard_args = None
        self.shuffle_args = None

    def shard(self, num_shards, index):
        self.shard_args = (num_shards, index)
        return _FakeStream(self.examples[index::num_shards])

    def shuffle(self, seed, buffer_size):
        self.shuffle_args = (seed, buffer_size)
        return self  # deterministic for the test

    def __iter__(self):
        return iter(self.examples)


def _install_fake_datasets(monkeypatch, stream):
    import sys
    import types

    mod = types.ModuleType("datasets")
    calls = {}

    def load_dataset(name, split, streaming):
        calls.update(name=name, split=split, streaming=streaming)
        return stream

    mod.load_dataset = load_dataset
    monkeypatch.setitem(sys.modules, "datasets", mod)
    return calls


def _hf_examples(n):
    from PIL import Image

    out = []
    for i in range(n):
        arr = (np.random.RandomState(i).rand(12, 12, 3) * 255).astype(np.uint8)
        out.append({"image": Image.fromarray(arr), "label": i % 3})
    return out


def test_hf_streaming_dataset_decodes_and_labels(monkeypatch):
    from deepl_project_tpu.data.datasets import hf_streaming_dataset

    stream = _FakeStream(_hf_examples(6) + [{"label": 9}])  # one imageless
    calls = _install_fake_datasets(monkeypatch, stream)
    items = list(hf_streaming_dataset("some/name", resolution=8,
                                      shuffle_buffer=4, with_labels=True))
    assert calls == {"name": "some/name", "split": "train", "streaming": True}
    assert stream.shuffle_args == (42, 4)
    assert len(items) == 6  # the imageless example is skipped
    for img, label in items:
        assert img.shape == (8, 8, 3) and img.dtype == np.float32
        assert 0 <= img.min() and img.max() <= 1.0
    assert [l for _, l in items] == [i % 3 for i in range(6)]


def test_hf_streaming_dataset_shards_and_parallel_decode(monkeypatch):
    from deepl_project_tpu.data.datasets import hf_streaming_dataset

    examples = _hf_examples(8)
    _install_fake_datasets(monkeypatch, _FakeStream(examples))
    serial = list(hf_streaming_dataset("d", resolution=8, shuffle_buffer=0,
                                       num_shards=2, shard_index=1))
    assert len(serial) == 4  # rank-sharded stream

    _install_fake_datasets(monkeypatch, _FakeStream(examples))
    parallel = list(hf_streaming_dataset("d", resolution=8, shuffle_buffer=0,
                                         num_shards=2, shard_index=1,
                                         num_workers=3))
    assert len(parallel) == len(serial)
    for a, b in zip(serial, parallel):
        np.testing.assert_array_equal(a, b)  # order preserved


def test_make_dataset_hf_passthrough(monkeypatch):
    from deepl_project_tpu.data.datasets import make_dataset

    _install_fake_datasets(monkeypatch, _FakeStream(_hf_examples(3)))
    items = list(make_dataset("hf:org/name", resolution=8, shuffle_buffer=0,
                              num_workers=2))
    assert len(items) == 3 and items[0].shape == (8, 8, 3)
