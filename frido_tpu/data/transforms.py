"""Image transforms returning crop coordinates (PIL + numpy).

Re-design of ``/root/reference/taming/data/image_transforms.py``: each crop
returns the relative crop bbox so annotations can be remapped; flip returns
its flag. Output is float32 HWC in [-1, 1].
"""

from __future__ import annotations

import random
from typing import Optional, Tuple

import numpy as np
from PIL import Image

from frido_tpu.data.helper_types import BoundingBox


def resize_shorter_side(img: Image.Image, size: int) -> Image.Image:
    """torchvision Resize(int): shorter side to ``size``, keep aspect."""
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(int(round(size * h / w)), size)
    else:
        new_h, new_w = size, max(int(round(size * w / h)), size)
    return img.resize((new_w, new_h), Image.BILINEAR)


def center_crop_coords(width: int, height: int) -> BoundingBox:
    """``image_transforms.py:86-98``."""
    if width > height:
        w = height / width
        h = 1.0
        x0 = 0.5 - w / 2
        y0 = 0.0
    else:
        w = 1.0
        h = width / height
        x0 = 0.0
        y0 = 0.5 - h / 2
    return x0, y0, w, h


def center_crop(img: Image.Image, size: int) -> Tuple[BoundingBox, Image.Image]:
    w, h = img.size
    bbox = center_crop_coords(w, h)
    left = int(round((w - size) / 2))
    top = int(round((h - size) / 2))
    return bbox, img.crop((left, top, left + size, top + size))


def random_crop_1d(img: Image.Image, size: int,
                   rng: random.Random) -> Tuple[BoundingBox, Image.Image]:
    """RandomCrop after shorter-side resize (``random-1d``)."""
    w, h = img.size
    left = rng.randint(0, max(w - size, 0))
    top = rng.randint(0, max(h - size, 0))
    bbox = (left / w, top / h, size / w, size / h)
    return bbox, img.crop((left, top, left + size, top + size))


def random_crop_2d(img: Image.Image, min_size: int,
                   rng: random.Random) -> Tuple[BoundingBox, Image.Image]:
    """Random square crop of random size >= min_size (``random-2d``)."""
    w, h = img.size
    max_size = min(w, h)
    size = max_size if max_size <= min_size else rng.randint(min_size, max_size)
    top = rng.randint(0, h - size)
    left = rng.randint(0, w - size)
    bbox = (left / w, top / h, size / w, size / h)
    return bbox, img.crop((left, top, left + size, top + size))


class ImagePipeline:
    """crop_method in {'none','center','random-1d','random-2d', None}
    (``annotated_objects_dataset.py:70-100``); returns
    (crop_bbox, flipped, float32 HWC image in [-1, 1])."""

    def __init__(self, target_image_size: int, crop_method: Optional[str],
                 random_flip: bool, seed: Optional[int] = None):
        assert crop_method in (None, "none", "center", "random-1d", "random-2d")
        self.size = target_image_size
        self.crop_method = crop_method
        self.random_flip = random_flip
        self.rng = random.Random(seed)

    def __call__(self, img: Image.Image):
        crop_bbox = None
        flipped = None
        m = self.crop_method
        if m == "none":
            img = img.resize((self.size, self.size), Image.BILINEAR)
        elif m == "center":
            img = resize_shorter_side(img, self.size)
            crop_bbox, img = center_crop(img, self.size)
        elif m == "random-1d":
            img = resize_shorter_side(img, self.size)
            crop_bbox, img = random_crop_1d(img, self.size, self.rng)
        elif m == "random-2d":
            crop_bbox, img = random_crop_2d(img, self.size, self.rng)
            img = img.resize((self.size, self.size), Image.BILINEAR)
        if self.random_flip:
            flipped = self.rng.random() < 0.5
            if flipped:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
        arr = np.asarray(img, dtype=np.float32) / 127.5 - 1.0
        return crop_bbox, flipped, arr

    def spec(self, width: int, height: int):
        """Native-loader plan: same crop/flip draws as ``__call__`` (same
        rng call order), but returned as a (rw, rh, cx, cy, cw, ch, flip)
        int spec for ``frido_tpu.data.native_loader`` instead of being
        applied via PIL.

        Returns (spec7, crop_bbox, flipped)."""
        size = self.size
        crop_bbox = None
        m = self.crop_method
        rw = rh = 0
        cx = cy = cw = ch = 0
        if m in ("center", "random-1d"):
            if width <= height:
                rw, rh = size, max(int(round(size * height / width)), size)
            else:
                rh, rw = size, max(int(round(size * width / height)), size)
            if m == "center":
                crop_bbox = center_crop_coords(rw, rh)
                cx = int(round((rw - size) / 2))
                cy = int(round((rh - size) / 2))
            else:
                cx = self.rng.randint(0, max(rw - size, 0))
                cy = self.rng.randint(0, max(rh - size, 0))
                crop_bbox = (cx / rw, cy / rh, size / rw, size / rh)
            cw = ch = size
        elif m == "random-2d":
            max_size = min(width, height)
            csize = (max_size if max_size <= size
                     else self.rng.randint(size, max_size))
            cy = self.rng.randint(0, height - csize)
            cx = self.rng.randint(0, width - csize)
            crop_bbox = (cx / width, cy / height,
                         csize / width, csize / height)
            cw = ch = csize
        flipped = None
        flip = 0
        if self.random_flip:
            flipped = self.rng.random() < 0.5
            flip = int(flipped)
        return (rw, rh, cx, cy, cw, ch, flip), crop_bbox, flipped
