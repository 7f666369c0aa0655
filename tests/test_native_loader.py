"""Native C++ image-loading core vs. the PIL pipeline.

The native path (libjpeg decode + PIL-style triangle-filter resampling,
native/frido_native.cpp) must agree with PIL within uint8 rounding — PIL
quantizes to uint8 after each resize, the native path stays in float — and
the ImagePipeline.spec plan must draw the same crops/flips as __call__.
"""

import numpy as np
import pytest
from PIL import Image

from frido_tpu.data import native_loader as nl
from frido_tpu.data.transforms import ImagePipeline

pytestmark = [
    pytest.mark.skipif(not nl.available(),
                       reason="native loader unavailable (no g++/libjpeg)"),
    # <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
    pytest.mark.fast,
]

TOL = 2.5 / 127.5  # a little over one uint8 step in [-1, 1]


@pytest.fixture(scope="module")
def jpg(tmp_path_factory):
    rng = np.random.RandomState(0)
    # smooth image: JPEG is lossy, smoothness keeps decode differences nil
    base = rng.rand(30, 40, 3)
    img = np.kron(base, np.ones((16, 16, 1)))[:480, :640]
    img = (img * 255).astype("uint8")
    path = tmp_path_factory.mktemp("imgs") / "x.jpg"
    Image.fromarray(img).save(path, quality=95)
    return str(path)


def _pil_reference(path, pipeline_seed, method, size=128):
    pipe = ImagePipeline(size, method, random_flip=True, seed=pipeline_seed)
    img = Image.open(path).convert("RGB")
    return pipe(img)


def _native(path, pipeline_seed, method, size=128):
    pipe = ImagePipeline(size, method, random_flip=True, seed=pipeline_seed)
    w, h = nl.jpeg_dims(path)
    (rw, rh, cx, cy, cw, ch, flip), bbox, flipped = pipe.spec(w, h)
    arr = nl.load_one(path, size, resize_to=(rw, rh) if rw else None,
                      crop=(cx, cy, cw, ch) if cw else None, flip=bool(flip))
    return bbox, flipped, arr


@pytest.mark.parametrize("method", ["none", "center", "random-1d",
                                    "random-2d"])
def test_native_matches_pil(jpg, method):
    bbox_p, flip_p, img_p = _pil_reference(jpg, 7, method)
    bbox_n, flip_n, img_n = _native(jpg, 7, method)
    assert flip_p == flip_n
    if bbox_p is None:
        assert bbox_n is None
    else:
        np.testing.assert_allclose(bbox_n, bbox_p, atol=1e-9)
    assert img_n.shape == img_p.shape == (128, 128, 3)
    assert np.abs(img_n - img_p).mean() < TOL


def test_jpeg_dims(jpg):
    assert nl.jpeg_dims(jpg) == (640, 480)
    assert nl.jpeg_dims("/nonexistent.jpg") is None


def test_load_batch(jpg):
    specs = np.zeros((4, 7), np.int32)
    specs[1] = (0, 0, 10, 20, 200, 200, 0)   # crop in original space
    specs[2] = (128, 96, 0, 0, 96, 96, 1)    # pre-resize + crop + flip
    out = nl.load_batch([jpg] * 4, specs, 64)
    assert out.shape == (4, 64, 64, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    assert not np.allclose(out[0], out[1])


def test_load_batch_failure_raises(jpg):
    specs = np.zeros((2, 7), np.int32)
    with pytest.raises(IOError):
        nl.load_batch([jpg, "/nonexistent.jpg"], specs, 64)
