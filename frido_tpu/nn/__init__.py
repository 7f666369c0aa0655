"""Flax (linen) network modules, NHWC layout.

Naming convention: a torch child ``parent.xs[i]`` is a flax module named
``xs__{i}`` (double underscore separates list indices), so a flax param path
maps 1:1 onto the reference's torch ``state_dict`` key
(see ``frido_tpu.io.torch_import``).
"""
