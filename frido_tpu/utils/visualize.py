"""Visualization helpers: text-as-image, grids, bbox layout plots.

Re-design of the reference's logging utilities (``frido/util.py:10-33``
caption rendering, torchvision ``make_grid``, and the conditional-builder
``plot`` methods) on numpy + PIL.
"""

from __future__ import annotations

from itertools import cycle
from typing import Callable, List, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

# seaborn tab10 (conditional_builder/utils.py:7-8)
COLOR_PALETTE = [(30, 118, 179), (255, 126, 13), (43, 159, 43),
                 (213, 38, 39), (147, 102, 188), (139, 85, 74),
                 (226, 118, 193), (126, 126, 126), (187, 188, 33),
                 (22, 189, 206)]


def to_uint8(x: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8."""
    return np.clip((np.asarray(x, np.float32) + 1) * 127.5, 0, 255).astype(
        np.uint8)


def log_txt_as_img(wh: Tuple[int, int], texts: Sequence[str],
                   size: int = 10) -> np.ndarray:
    """Render captions onto white canvases -> [B, H, W, 3] in [-1, 1]."""
    out = []
    for txt in texts:
        img = Image.new("RGB", wh, color="white")
        draw = ImageDraw.Draw(img)
        if isinstance(txt, (list, tuple)):
            txt = "{}".format(txt)[1:-1]
        nc = int(40 * (wh[0] / 256))
        lines = "\n".join(
            str(txt)[i:i + nc] for i in range(0, len(str(txt)), nc))
        draw.text((0, 0), lines, fill="black")
        out.append(np.asarray(img, np.float32) / 127.5 - 1.0)
    return np.stack(out)


def make_grid(images: np.ndarray, nrow: int = 8,
              pad: int = 2) -> np.ndarray:
    """[N, H, W, C] -> single grid image [-1, 1]."""
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    grid = np.full(((h + pad) * nrows + pad, (w + pad) * ncol + pad, c),
                   1.0, np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0:y0 + h, x0:x0 + w] = images[i]
    return grid


def plot_bbox_conditioning(builder, conditional: np.ndarray,
                           label_for_category_no: Callable[[int], str],
                           figure_size: Tuple[int, int],
                           line_width: int = 3) -> np.ndarray:
    """Render an objects_bbox token sequence (``objects_bbox.py:42-60``)."""
    plot = Image.new("RGB", figure_size, (255, 255, 255))
    draw = ImageDraw.Draw(plot)
    width, height = plot.size
    objs, crop = builder.inverse_build(conditional)
    for (rep, bbox), color in zip(objs, cycle(COLOR_PALETTE)):
        ann = builder.representation_to_annotation(rep)
        label = label_for_category_no(ann.category_no)
        ab = (bbox[0] * width, bbox[1] * height,
              (bbox[0] + bbox[2]) * width, (bbox[1] + bbox[3]) * height)
        draw.rectangle(ab, outline=color, width=line_width)
        draw.text((ab[0] + line_width, ab[1] + line_width), label,
                  fill=(0, 0, 0))
    if crop is not None:
        draw.rectangle((crop[0] * width, crop[1] * height,
                        (crop[0] + crop[2]) * width,
                        (crop[1] + crop[3]) * height),
                       outline=(63, 63, 63), width=line_width)
    return np.asarray(plot, np.float32) / 127.5 - 1.0


def save_image(arr: np.ndarray, path: str) -> None:
    Image.fromarray(to_uint8(arr)).save(path)
