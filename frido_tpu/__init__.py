"""frido_tpu — a TPU-native feature-pyramid latent-diffusion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of davidhalladay/Frido
(AAAI'23 "Feature Pyramid Diffusion for Complex Scene Image Synthesis"):

* MS-VQGAN multi-scale first stage (``frido_tpu.models.msvqgan``)
* coarse-to-fine pyramid diffusion with a split-head UNet
  (``frido_tpu.models.frido``, ``frido_tpu.nn.pyunet``)
* scanned DDIM / PLMS samplers compiled to a single XLA program
  (``frido_tpu.diffusion``)
* conditioning encoders for t2i / layout2i / sg2i / label2i
  (``frido_tpu.nn.encoders``)
* data-parallel training + sharded batched sampling over a
  ``jax.sharding.Mesh`` (``frido_tpu.parallel``)
* a one-way PyTorch checkpoint importer so reference checkpoints load
  (``frido_tpu.io.torch_import``)

All tensors are NHWC (TPU-native layout); the torch importer handles the
NCHW/OIHW conversions at the boundary.
"""

__version__ = "0.1.0"

# Platform override: environments whose sitecustomize imports jax at
# interpreter start (e.g. the axon TPU plugin) lock in JAX_PLATFORMS before
# user code runs; honor an explicit FRIDO_TPU_PLATFORM by updating the
# already-imported config (must happen before first backend use).
import os as _os

if _os.environ.get("FRIDO_TPU_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["FRIDO_TPU_PLATFORM"])
