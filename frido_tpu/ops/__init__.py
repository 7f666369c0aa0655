"""Functional TPU-native primitives (NHWC) with torch-matching semantics."""

from frido_tpu.ops.image import (  # noqa: F401
    avg_pool_2x,
    interpolate_nearest,
    interpolate_nearest_2x,
    pad_nhwc,
)
from frido_tpu.ops.norm import group_norm  # noqa: F401
from frido_tpu.ops.vq import vq_lookup  # noqa: F401
