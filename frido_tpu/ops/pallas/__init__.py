"""Pallas TPU kernels for the hot ops.

Two ops dominate Frido's device time (SURVEY.md §7): attention inside the
PyUNet sampler loop (2 CFG forwards x 200 steps x stages,
``/root/reference/frido/modules/attention.py:152-193``) and the VQ
codebook nearest-neighbor lookup in MS-VQGAN decode
(``/root/reference/taming/modules/vqvae/quantize.py:267-308``). Both are
implemented here as fused VMEM-resident kernels; the jnp formulations in
``frido_tpu.ops.vq`` / ``frido_tpu.nn.transformer`` remain the reference
semantics and the CPU/grad fallback.
"""

from frido_tpu.ops.pallas.attention import (flash_attention,  # noqa: F401
                                            smalls_attention,
                                            smalls_vmem_ok)
from frido_tpu.ops.pallas.dispatch import use_pallas  # noqa: F401
from frido_tpu.ops.pallas.vq_pallas import vq_argmin  # noqa: F401
