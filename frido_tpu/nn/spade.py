"""SPADE: spatially-adaptive normalization (NHWC flax).

Re-design of ``/root/reference/frido/modules/diffusionmodules/spade_norm.py:
26-59``: a parameter-free norm followed by gamma/beta predicted from the
previous-pyramid-stage feature map by 3x3 convs. This is how the fine stages
of Frido are conditioned on the already-denoised coarse stages.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from frido_tpu.nn.layers import Conv2d, GroupNorm
from frido_tpu.ops.image import interpolate_nearest


class SPADE(nn.Module):
    norm_nc: int
    norm_eps: float = 1e-5  # wraps guided-diffusion GroupNorm32
    kernel_size: int = 3
    nhidden: int = 128

    def setup(self):
        pw = self.kernel_size // 2
        self.param_free_norm = GroupNorm(eps=self.norm_eps, name="param_free_norm")
        # torch: mlp_shared = Sequential(Conv2d, ReLU) -> key mlp_shared.0
        self.mlp_shared_conv = Conv2d(self.nhidden, self.kernel_size,
                                      padding=pw, name="mlp_shared__0")
        self.mlp_gamma = Conv2d(self.norm_nc, self.kernel_size, padding=pw,
                                name="mlp_gamma")
        self.mlp_beta = Conv2d(self.norm_nc, self.kernel_size, padding=pw,
                               name="mlp_beta")

    def gamma_beta(self, cond: jnp.ndarray,
                   hw: tuple[int, int]) -> tuple[jnp.ndarray, jnp.ndarray]:
        """The modulation tables at resolution ``hw``. During sampling these
        depend only on the frozen previous-stage channels, so callers
        precompute them once per stage and reuse across every timestep and
        CFG branch (samplers.py module docstring)."""
        cond = interpolate_nearest(cond, hw)
        actv = jax.nn.relu(self.mlp_shared_conv(cond))
        return self.mlp_gamma(actv), self.mlp_beta(actv)

    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray | None,
                 pre: tuple[jnp.ndarray, jnp.ndarray] | None = None
                 ) -> jnp.ndarray:
        normalized = self.param_free_norm(x)
        if pre is None and cond is None:
            return normalized
        gamma, beta = pre if pre is not None else self.gamma_beta(
            cond, (x.shape[1], x.shape[2]))
        return normalized * (1 + gamma) + beta
