"""Native C++ image loader: build, correctness vs PIL, threaded batch decode."""

import numpy as np
import pytest

from deepl_project_tpu.data import preprocess_file
from deepl_project_tpu.data.native_loader import (decode_batch, decode_file,
                                                  native_available,
                                                  native_folder_batches)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native loader not buildable here")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = (rng.rand(90 + 7 * i, 70, 3) * 255).astype(np.uint8)
        img = Image.fromarray(arr)
        img.save(d / f"img{i}.jpg", quality=95)
    Image.fromarray((rng.rand(50, 80, 3) * 255).astype(np.uint8)).save(
        d / "img_png.png")
    return d


def test_decode_file_matches_pil(image_dir):
    path = str(image_dir / "img0.jpg")
    native = decode_file(path, 32)
    assert native is not None
    assert native.shape == (32, 32, 3)
    pil = preprocess_file(path, 32)
    # Pillow-exact antialiased resize: agreement within 2 grey levels.
    assert np.abs(native - pil).max() <= 2.5 / 255.0


def test_decode_png(image_dir):
    out = decode_file(str(image_dir / "img_png.png"), 16)
    assert out is not None
    assert out.shape == (16, 16, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_decode_missing_file():
    assert decode_file("/nonexistent/file.jpg", 16) is None


def test_decode_batch_threaded(image_dir):
    paths = [str(image_dir / f"img{i}.jpg") for i in range(6)]
    paths.append("/nonexistent.jpg")
    out, ok = decode_batch(paths, 24, num_threads=4)
    assert out.shape == (7, 24, 24, 3)
    assert ok[:6].all() and not ok[6]


def test_native_folder_batches(image_dir):
    batches = list(native_folder_batches(str(image_dir), resolution=16,
                                         batch_size=3, drop_last=True))
    assert len(batches) >= 2
    assert batches[0].shape == (3, 16, 16, 3)
