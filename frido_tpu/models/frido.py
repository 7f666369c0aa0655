"""FridoDiffusion: coarse-to-fine feature-pyramid latent diffusion.

TPU-first re-design of ``/root/reference/frido/models/diffusion/frido.py``
(DDPM base + FridoDiffusion). Differences from the torch original that are
deliberate design, not omissions:

* All state lives in pytrees: one flax module tree (``model.diffusion_model``
  / ``first_stage_model`` / ``cond_stage_model`` — the same key tree as the
  Lightning checkpoint) plus a separate scale-factor vector and schedule
  constants baked into the jitted programs.
* The per-stage channel windows (``q_sample`` ch_start/ch_end, the sampler
  masks) are **static slices** resolved at trace time — ``embed_dim_list``
  is config — instead of runtime tensor surgery (``frido.py:230-256,
  302-318``).
* Sampling runs as a ``lax.scan`` over timesteps inside one XLA program per
  stage (see ``frido_tpu.diffusion.samplers``); classifier-free guidance is
  one 2B-batched UNet call, not two sequential calls.
* The training loss evaluates the per-stage losses in one jitted step
  (``frido.py:1035-1050`` stage loop, unrolled).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from frido_tpu.config import instantiate_from_config
from frido_tpu.models.msvqgan import MSVQGAN, msvqgan_from_config
from frido_tpu.nn.pyunet import PyUNetModel, pyunet_from_config
from frido_tpu.schedules import DiffusionSchedule

CONDITIONING_KEYS = (None, "concat", "crossattn", "hybrid", "adm")


class DiffusionWrapper(nn.Module):
    """Routes conditioning into the UNet (``frido.py:1628-1654``).

    Named ``model`` in the tree so torch keys ``model.diffusion_model.*``
    line up.
    """

    unet_config: Dict[str, Any]
    conditioning_key: Optional[str]

    def setup(self):
        assert self.conditioning_key in CONDITIONING_KEYS
        self.diffusion_model = pyunet_from_config(
            self.unet_config["params"], name="diffusion_model")

    def __call__(self, x, t, c_concat=None, c_crossattn=None, stage=0,
                 deterministic=True, spade_pre=None):
        ck = self.conditioning_key
        if ck is None:
            return self.diffusion_model(x, t, stage=stage,
                                        deterministic=deterministic,
                                        spade_pre=spade_pre)
        if ck == "concat":
            xc = jnp.concatenate([x] + list(c_concat), axis=-1)
            return self.diffusion_model(xc, t, stage=stage,
                                        deterministic=deterministic,
                                        spade_pre=spade_pre)
        if ck == "crossattn":
            cc = jnp.concatenate(list(c_crossattn), axis=1)
            return self.diffusion_model(x, t, context=cc, stage=stage,
                                        deterministic=deterministic,
                                        spade_pre=spade_pre)
        if ck == "hybrid":
            xc = jnp.concatenate([x] + list(c_concat), axis=-1)
            cc = jnp.concatenate(list(c_crossattn), axis=1)
            return self.diffusion_model(xc, t, context=cc, stage=stage,
                                        deterministic=deterministic,
                                        spade_pre=spade_pre)
        if ck == "adm":
            return self.diffusion_model(x, t, y=c_crossattn[0], stage=stage,
                                        deterministic=deterministic,
                                        spade_pre=spade_pre)
        raise NotImplementedError(ck)

    def spade_tables(self, x_cond, stage):
        return self.diffusion_model.spade_tables(x_cond, stage)

    def init_all(self, x, t, c_concat=None, c_crossattn=None):
        num_stage = self.unet_config["params"].get("num_stage", 1)
        out = None
        for s in range(max(num_stage, 1)):
            out = self(x, t, c_concat, c_crossattn, stage=s)
        return out


class FridoModule(nn.Module):
    """The full model tree: denoiser + frozen first stage + cond stage."""

    unet_config: Dict[str, Any]
    first_stage_params: Dict[str, Any]
    conditioning_key: Optional[str]
    cond_module_builder: Any = None  # callable(name) -> nn.Module, or None

    def setup(self):
        self.model = DiffusionWrapper(self.unet_config, self.conditioning_key,
                                      name="model")
        # None = pixel-space DDPM: encode/decode are identity
        self.first_stage_model = None if self.first_stage_params is None \
            else msvqgan_from_config(self.first_stage_params,
                                     name="first_stage_model")
        if self.cond_module_builder is not None:
            self.cond_stage_model = self.cond_module_builder("cond_stage_model")
        else:
            self.cond_stage_model = None

    # --- sub-apply entry points (used via module.apply(..., method=...)) ---
    def apply_model(self, x, t, context=None, stage=0, deterministic=True,
                    spade_pre=None):
        if self.conditioning_key is None:
            return self.model(x, t, stage=stage, deterministic=deterministic,
                              spade_pre=spade_pre)
        if self.conditioning_key in ("crossattn", "adm"):
            return self.model(x, t, c_crossattn=[context], stage=stage,
                              deterministic=deterministic,
                              spade_pre=spade_pre)
        return self.model(x, t, c_concat=[context], stage=stage,
                          deterministic=deterministic, spade_pre=spade_pre)

    def spade_tables(self, x_cond, stage):
        """Stage-invariant SPADE modulation tables (PyUNetModel method)."""
        return self.model.spade_tables(x_cond, stage)

    def encode_first_stage(self, x):
        if self.first_stage_model is None:
            return x
        return self.first_stage_model.encode_interface(x)

    def decode_first_stage(self, z):
        if self.first_stage_model is None:
            return z
        return self.first_stage_model.decode_interface(z)

    def decode_first_stage_codes(self, z):
        """decode + per-scale codebook indices (the reference's
        ``--get_codebook`` analysis dump, ``main.py:540-548``)."""
        return self.first_stage_model.decode_interface(z, return_code=True)

    def quantize_latent(self, z):
        return self.first_stage_model.quantize_latent(z)

    def encode_cond(self, tokens):
        assert self.cond_stage_model is not None
        return self.cond_stage_model(tokens)

    def init_all(self, x_img, z, t, tokens):
        """Touch every parametrized path once for init."""
        outs = []
        ctx = None
        if self.cond_stage_model is not None and tokens is not None:
            ctx = self.encode_cond(tokens)
        num_stage = self.unet_config["params"].get("num_stage", 1)
        for s in range(max(num_stage, 1)):
            outs.append(self.apply_model(z, t, ctx, stage=s))
        outs.append(self.encode_first_stage(x_img))
        outs.append(self.decode_first_stage(z))
        return outs


_FRIDO_DEFAULTS: Dict[str, Any] = dict(
    timesteps=1000,
    beta_schedule="linear",
    loss_type="l2",
    monitor="val/loss",
    first_stage_key="image",
    cond_stage_key="caption",
    image_size=32,
    channels=8,
    log_every_t=100,
    linear_start=1e-4,
    linear_end=2e-2,
    cosine_s=8e-3,
    given_betas=None,
    original_elbo_weight=0.0,
    v_posterior=0.0,
    l_simple_weight=1.0,
    conditioning_key=None,
    parameterization="eps",
    scale_factor=1.0,
    scale_by_std=False,
    adopted_scale_factor=False,
    adopted_scale_factor_value=None,
    noise_mix_ratio=0.0,
    stage_loss_ratio=(0.5, 0.5),
    cond_stage_trainable=False,
    num_timesteps_cond=1,
    use_ema=True,
    learn_logvar=False,
    logvar_init=0.0,
    specify_channels=(),
    clip_denoised=False,
    ckpt_path=None,
    ignore_keys=(),
)


class FridoDiffusion:
    """Orchestrator built from a reference-format config tree.

    Mirrors the public surface of the torch FridoDiffusion that the
    inference/training drivers use: ``encode_first_stage`` /
    ``decode_first_stage`` (with per-stage scale factors), conditioning,
    ``apply_model``, training loss, and samplers (via
    ``frido_tpu.diffusion.samplers``). Unknown config keys (``plot_*``,
    ``disable_log_image``, ...) are accepted and recorded in ``self.extra``.
    """

    def __init__(self, first_stage_config: Optional[Dict[str, Any]] = None,
                 cond_stage_config: Any = "__is_unconditional__",
                 unet_config: Dict[str, Any] = None,
                 **kwargs: Any):
        assert unet_config is not None, "unet_config is required"
        self.first_stage_config = first_stage_config
        self.cond_stage_config = cond_stage_config
        self.unet_config = unet_config
        for k, v in _FRIDO_DEFAULTS.items():
            setattr(self, k, kwargs.pop(k, v))
        self.extra = kwargs
        self.__post_init__()

    def __post_init__(self):
        if self.conditioning_key is None and self.cond_stage_config not in (
                "__is_unconditional__",):
            self.conditioning_key = "crossattn"
        if self.cond_stage_config == "__is_unconditional__":
            self.conditioning_key = None

        self.schedule = DiffusionSchedule.create(
            given_betas=self.given_betas, beta_schedule=self.beta_schedule,
            timesteps=self.timesteps, linear_start=self.linear_start,
            linear_end=self.linear_end, cosine_s=self.cosine_s,
            v_posterior=self.v_posterior,
            parameterization=self.parameterization)

        if self.first_stage_config is None:
            # pixel-space DDPM (frido.py:45-476): no first stage at all —
            # encode/decode are identity and the "pyramid" is one stage wide
            fs_params = None
            self.first_stage_ckpt = None
            self.embed_dim_list: List[int] = [self.channels]
        else:
            fs_params = dict(self.first_stage_config["params"])
            self.first_stage_ckpt = fs_params.get("ckpt_path")
            self.embed_dim_list = list(fs_params["embed_dim"])
        self.num_stage: int = len(self.embed_dim_list)
        if len(self.stage_loss_ratio) != self.num_stage \
                and self.num_stage == 1:
            # the two-stage default ratio doesn't apply to single-stage DDPM
            self.stage_loss_ratio = (1.0,)

        self.use_split_head = bool(
            self.unet_config["params"].get("use_split_head", False))
        self.split_embed_dim_list = list(
            self.unet_config["params"].get("split_embed_dim_list", ()))

        # conditioning wrapper (host tokenizer + module builder)
        self.cond_wrapper = None
        cond_builder = None
        if self.cond_stage_config == "__is_first_stage__":
            raise NotImplementedError("first-stage-as-cond not used by any "
                                      "shipped Frido config")
        if isinstance(self.cond_stage_config, dict):
            self.cond_wrapper = instantiate_from_config(self.cond_stage_config)
            cond_builder = self.cond_wrapper.build_module

        self.module = FridoModule(
            unet_config=self.unet_config,
            first_stage_params=fs_params,
            conditioning_key=self.conditioning_key,
            cond_module_builder=cond_builder,
        )

        if self.adopted_scale_factor_value is not None:
            self.scale_factors = np.asarray(self.adopted_scale_factor_value,
                                            dtype=np.float32)
        elif self.adopted_scale_factor:
            self.scale_factors = np.full((self.num_stage,), self.scale_factor,
                                         dtype=np.float32)
        else:
            self.scale_factors = np.asarray(self.scale_factor, np.float32)

        self.logvar = np.full((self.timesteps,), self.logvar_init, np.float32)

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------
    def init_params(self, rng, context_len: int = 77) -> Dict[str, Any]:
        # Conv/attention params are shape-independent of the spatial dims;
        # init on the smallest grid that survives every stride (fast init).
        ds_unet = max(self.unet_config["params"].get(
            "attention_resolutions") or [8])
        lat = max(ds_unet * 2, 8)
        side = 4 * 2 ** self._num_downs()
        img = jnp.zeros((1, side, side, 3))
        z = jnp.zeros((1, lat, lat, self.channels))
        t = jnp.zeros((1,), jnp.int32)
        tokens = None
        if self.cond_wrapper is not None:
            tokens = jnp.zeros((1, context_len), jnp.int32)
        params = self.module.init(rng, img, z, t, tokens, method="init_all")
        if self.learn_logvar:
            # trainable per-timestep logvar (frido.py:121-124,473-474):
            # lives in the params tree so the optimizer sees it; flax
            # ignores the extra entry during module.apply
            params = dict(params)
            params["params"] = dict(
                params["params"],
                logvar=jnp.full((self.timesteps,), self.logvar_init,
                                jnp.float32))
        return params

    def _num_downs(self) -> int:
        if self.first_stage_config is None:
            return 0  # pixel space: image IS the latent
        ed = self.first_stage_config["params"]["edconfig"]
        return len(ed["ch_mult"]) - 1

    def init_scale_by_std(self, params, images) -> np.ndarray:
        """Set per-stage scale factors to 1/std of the first training
        batch's latents (``frido.py:562-593``: rank-zero
        ``on_train_batch_start`` at step 0, no resume). Returns the new
        scale vector; called by the training driver before the first step.
        """
        assert self.scale_by_std
        z = self.module.apply(params, jnp.asarray(images),
                              method="encode_first_stage")
        factors = []
        start = 0
        for d in self.embed_dim_list:
            blk = z[..., start:start + d]
            factors.append(1.0 / float(jnp.std(blk)))
            start += d
        self.scale_factors = np.asarray(factors, np.float32)
        return self.scale_factors

    def load_torch_checkpoint(self, path: str, params: Dict[str, Any],
                              strict: bool = False) -> Dict[str, Any]:
        """Load a reference Lightning .ckpt into the params tree; returns
        (new_params). Also updates ``self.scale_factors`` from the ckpt."""
        from frido_tpu.io.torch_import import (
            import_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(path)
        for ik in self.ignore_keys:
            sd = {k: v for k, v in sd.items() if not k.startswith(ik)}
        if "scale_factor" in sd:
            sf = np.asarray(sd["scale_factor"], np.float32)
            if sf.ndim == 0 and self.adopted_scale_factor:
                sf = sf[None]  # scalar->vector fixup (frido.py:206-208)
            self.scale_factors = sf
        new = import_state_dict(params["params"], sd, strict=strict)
        return {"params": new}

    # ------------------------------------------------------------------
    # latent scaling (frido.py:647-662, 832-838)
    # ------------------------------------------------------------------
    def _scale_latent(self, z: jnp.ndarray, invert: bool) -> jnp.ndarray:
        sf = jnp.asarray(self.scale_factors)
        if sf.ndim == 0:
            return z / sf if invert else z * sf
        parts = []
        start = 0
        for i, d in enumerate(self.embed_dim_list):
            if start + d <= z.shape[-1]:
                f = 1.0 / sf[i] if invert else sf[i]
                parts.append(z[..., start:start + d] * f)
                start += d
        if start < z.shape[-1]:
            parts.append(z[..., start:])
        return jnp.concatenate(parts, axis=-1)

    # ------------------------------------------------------------------
    # model application
    # ------------------------------------------------------------------
    def encode_first_stage(self, params, x: jnp.ndarray) -> jnp.ndarray:
        z = self.module.apply(params, x, method="encode_first_stage")
        return self._scale_latent(z, invert=False)

    def decode_first_stage(self, params, z: jnp.ndarray,
                           chunk: Optional[int] = None) -> jnp.ndarray:
        """``chunk``: decode ``chunk`` samples at a time under ``lax.map``.
        The 256x256 decoder's activations dominate peak HBM at large batch
        (the 200-step UNet chain touches only the 32x32 latent); chunking
        bounds that peak at negligible cost since decode is a tiny fraction
        of sampling time. No reference analogue — the torch decoder just
        OOMs (the reference caps its eval batch instead)."""
        z = self._scale_latent(z, invert=True)
        sip = self.extra.get("split_input_params")
        if sip and z.shape[1] > sip["ks"][0]:
            # patched decode (frido.py:840-877): per latent tile, each
            # decoding to ks*vqf pixels, blended by overlap count. Checked
            # before the chunk fast-path so a tiled-decode model still tiles
            # when chunking is requested (chunk wraps the tiled decode).
            from frido_tpu.ops.tiling import tiled_apply

            dd = self.first_stage_config["params"]["ddconfig"]
            vqf = int(sip.get("vqf", 2 ** (len(dd["ch_mult"]) - 1)))
            decode_one = lambda tile: tiled_apply(
                lambda t_: self.module.apply(
                    params, t_, method="decode_first_stage"),
                tile, ks=tuple(sip["ks"]), stride=tuple(sip["stride"]),
                out_ch=dd["out_ch"], scale=vqf)
        else:
            decode_one = lambda tile: self.module.apply(
                params, tile, method="decode_first_stage")
        if chunk and z.shape[0] > chunk and z.shape[0] % chunk == 0:
            zc = z.reshape((z.shape[0] // chunk, chunk) + z.shape[1:])
            imgs = jax.lax.map(decode_one, zc)
            return imgs.reshape((-1,) + imgs.shape[2:])
        return decode_one(z)

    def decode_first_stage_with_codes(self, params, z: jnp.ndarray):
        """(images, [per-scale int32 code grids]) for codebook analysis."""
        z = self._scale_latent(z, invert=True)
        return self.module.apply(params, z,
                                 method="decode_first_stage_codes")

    def get_learned_conditioning(self, params, tokens) -> jnp.ndarray:
        return self.module.apply(params, jnp.asarray(tokens),
                                 method="encode_cond")

    def tokenize(self, cond):
        assert self.cond_wrapper is not None
        return self.cond_wrapper.tokenize(cond)

    def apply_model(self, params, x, t, context, stage: int,
                    deterministic: bool = True, spade_pre=None):
        sip = self.extra.get("split_input_params")
        if sip and x.shape[1] > sip["ks"][0]:
            # fold/unfold patched inference (frido.py:1076-1160): run the
            # UNet per overlapping latent tile, blend by overlap count.
            # Tile positions are static -> fixed-shape calls under jit.
            # (precomputed SPADE tables are full-grid, so the tiled path
            # recomputes SPADE per tile — sample() never precomputes here)
            from frido_tpu.ops.tiling import tiled_apply

            return tiled_apply(
                lambda tile: self.module.apply(
                    params, tile, t, context, stage, deterministic,
                    method="apply_model"),
                x, ks=tuple(sip["ks"]), stride=tuple(sip["stride"]))
        return self.module.apply(params, x, t, context, stage, deterministic,
                                 spade_pre, method="apply_model")

    def spade_tables(self, params, x_cond, stage: int):
        """Precompute the stage-invariant SPADE (gamma, beta) tables from the
        frozen previous-stage channels (see PyUNetModel.spade_tables)."""
        return self.module.apply(params, x_cond, stage, method="spade_tables")

    # ------------------------------------------------------------------
    # training loss (frido.py:1025-1050, 1180-1224)
    # ------------------------------------------------------------------
    def q_sample_stage(self, x_start, t, stage: int, noise):
        """Channel-windowed forward noising (``frido.py:302-318``):
        [0, start) clean (with noise_mix_ratio leak), [start, end) noised at
        t, [end, C) pure noise."""
        s = self.schedule
        start = sum(self.embed_dim_list[:stage])
        end = sum(self.embed_dim_list[:stage + 1])
        sqrt_ac = jnp.asarray(s.sqrt_alphas_cumprod)[t][:, None, None, None]
        sqrt_1mac = jnp.asarray(
            s.sqrt_one_minus_alphas_cumprod)[t][:, None, None, None]
        noised = sqrt_ac * x_start + sqrt_1mac * noise

        parts = []
        if start > 0:
            clean = x_start[..., :start]
            if self.noise_mix_ratio != 0.0:
                tau = self.noise_mix_ratio
                clean = (1 - tau) * clean + tau * noise[..., :start]
            parts.append(clean)
        parts.append(noised[..., start:end])
        if end < x_start.shape[-1]:
            parts.append(noise[..., end:])
        return jnp.concatenate(parts, axis=-1)

    def p_losses(self, params, z, context, t, stage: int, noise,
                 deterministic: bool = False, compute_dtype=None):
        """Single-stage eps loss (``frido.py:1180-1224``).

        compute_dtype: run the UNet forward (and its backward) in this dtype
        (bf16 on TPU) with fp32 master params and fp32 loss math. The
        reference's fp16 flag is a no-op (``pyunet.py:26-30``); this is the
        real mixed-precision path the MXU wants."""
        start = sum(self.embed_dim_list[:stage])
        end = sum(self.embed_dim_list[:stage + 1])
        x_noisy = self.q_sample_stage(z, t, stage, noise)
        if compute_dtype is not None:
            x_noisy = x_noisy.astype(compute_dtype)
            if context is not None:
                context = context.astype(compute_dtype)
        model_out = self.apply_model(params, x_noisy, t, context, stage,
                                     deterministic)
        if compute_dtype is not None:
            model_out = model_out.astype(jnp.float32)
        if self.parameterization == "eps":
            target = noise
        else:
            target = z
        target_w = target[..., start:end]
        if not self.use_split_head:
            model_out = model_out[..., start:end]
        if self.loss_type == "l1":
            per = jnp.abs(model_out - target_w)
        else:
            per = (model_out - target_w) ** 2
        loss_simple = per.mean(axis=(1, 2, 3))
        if self.learn_logvar and "logvar" in params.get("params", {}):
            logvar_t = params["params"]["logvar"][t]
        else:
            logvar_t = jnp.asarray(self.logvar)[t]
        loss = loss_simple / jnp.exp(logvar_t) + logvar_t
        loss = self.l_simple_weight * loss.mean()
        lvlb = (jnp.asarray(self.schedule.lvlb_weights)[t] * loss_simple).mean()
        loss = loss + self.original_elbo_weight * lvlb
        return loss, {f"loss_simple_stage{stage}": loss_simple.mean(),
                      f"loss_vlb_stage{stage}": lvlb}

    def training_loss(self, params, z, context, t, noise,
                      compute_dtype=None):
        """Sum of per-stage losses weighted by stage_loss_ratio
        (``frido.py:1035-1050``)."""
        assert len(self.stage_loss_ratio) == self.num_stage
        total = 0.0
        logs = {}
        for s in range(self.num_stage):
            loss, d = self.p_losses(params, z, context, t, s, noise,
                                    compute_dtype=compute_dtype)
            total = total + loss * self.stage_loss_ratio[s]
            for k, v in d.items():
                logs[k] = v * self.stage_loss_ratio[s]
        logs["loss"] = total
        return total, logs

    # ------------------------------------------------------------------
    # sampling (delegates to frido_tpu.diffusion.samplers)
    # ------------------------------------------------------------------
    def sample(self, params, rng, batch_size: int, context=None,
               uncond_context=None, steps: int = 200, eta: float = 1.0,
               guidance_scale: float = 1.0, sampler: str = "plms",
               x_T=None, x_init=None, compute_dtype=None,
               cfg_mode: str = "batched"):
        from frido_tpu.diffusion import samplers

        shape = (batch_size, self.image_size, self.image_size, self.channels)
        cfg = samplers.SamplerConfig(
            schedule=self.schedule, num_steps=steps, eta=eta,
            guidance_scale=guidance_scale,
            embed_dim_list=tuple(self.embed_dim_list),
            use_split_head=self.use_split_head,
            specify_channels=tuple(self.specify_channels),
            num_stage=self.num_stage, kind=sampler, cfg_mode=cfg_mode)

        if compute_dtype is not None:
            # bf16 UNet compute: the update math and schedule stay fp32
            if context is not None:
                context = context.astype(compute_dtype)
            if uncond_context is not None:
                uncond_context = uncond_context.astype(compute_dtype)

            def eps_model(x, t, ctx, stage, spade_pre=None):
                out = self.apply_model(
                    params, x.astype(compute_dtype), t, ctx, stage,
                    spade_pre=spade_pre)
                return out.astype(jnp.float32)
        else:
            eps_model = lambda x, t, ctx, stage, spade_pre=None: \
                self.apply_model(params, x, t, ctx, stage,
                                 spade_pre=spade_pre)

        # Stage-invariant SPADE precompute: during stage s > 0 the previous
        # stages' channels are frozen, so the SPADE modulation tables are
        # computed once per stage (outside the step scan) instead of per
        # step x CFG branch. Skipped under tiled inference (tables are
        # full-grid).
        stage_invariants = None
        if (self.use_split_head and self.num_stage > 1
                and not self.extra.get("split_input_params")
                and self.unet_config["params"].get("use_SPADE_norm")):
            def stage_invariants(stage, x_cond):
                if stage == 0:
                    return None
                if compute_dtype is not None:
                    x_cond = x_cond.astype(compute_dtype)
                return self.spade_tables(params, x_cond, stage)

        return samplers.sample(cfg, eps_model, rng, shape, context,
                               uncond_context, x_T=x_T, x_init=x_init,
                               stage_invariants=stage_invariants)


    # ------------------------------------------------------------------
    # visualization (frido.py:1454-1590)
    # ------------------------------------------------------------------
    def log_images(self, params, batch, rng=None, n: int = 8,
                   ddim_steps: int = 200, ddim_eta: float = 1.0,
                   sample_flag: bool = True, dataset=None):
        """inputs / reconstruction / conditioning render / samples."""
        import jax

        from frido_tpu.utils import visualize as vz

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        log = {}
        image = np.asarray(batch["image"], np.float32)[:n]
        x = jnp.asarray(image)
        log["inputs"] = image
        if "file_name" in batch:
            log["file_name"] = batch["file_name"][:n]
        z = self.encode_first_stage(params, x)
        log["reconstruction"] = np.asarray(
            self.decode_first_stage(params, z))

        ctx = None
        key = self.cond_stage_key
        if self.cond_wrapper is not None:
            cond = batch[key] if key in batch else batch
            if isinstance(cond, list):
                cond = cond[:n]
            tokens = np.asarray(self.tokenize(cond))[:n]
            ctx = self.get_learned_conditioning(params, jnp.asarray(tokens))
            wh = (image.shape[2], image.shape[1])
            if key == "caption":
                log["conditioning"] = vz.log_txt_as_img(wh, batch["caption"][:n])
            elif key == "objects" and dataset is not None:
                labels = [[dataset.get_textual_label_for_category_no(int(t))
                           for t in row if t != dataset.conditional_builders[
                               "objects"].none]
                          for row in tokens]
                log["conditioning"] = vz.log_txt_as_img(wh, labels)
            elif key == "objects_bbox" and dataset is not None:
                builder = dataset.conditional_builders["objects_bbox"]
                log["conditioning"] = np.stack([
                    vz.plot_bbox_conditioning(
                        builder, row,
                        dataset.get_textual_label_for_category_no, wh)
                    for row in tokens])

        # plot_* config gates (frido.py:1454-1590; e.g. the clip config
        # sets plot_sample: False, plot_quantize_denoised: True)
        if sample_flag and self.extra.get("plot_sample", True):
            samples = self.sample(
                params, rng, x.shape[0], context=ctx,
                steps=ddim_steps, eta=ddim_eta,
                sampler="ddim" if ddim_eta > 0 else "plms")
            log["samples"] = np.asarray(
                self.decode_first_stage(params, samples))
            if self.extra.get("plot_quantize_denoised", False):
                z_raw = self._scale_latent(samples, invert=True)
                zq = self.module.apply(params, z_raw,
                                       method="quantize_latent")
                log["samples_x0_quantized"] = np.asarray(self.module.apply(
                    params, zq, method="decode_first_stage"))
        if sample_flag and (self.extra.get("plot_diffusion_rows", False)
                            or self.extra.get("plot_denoise_rows", False)):
            rows = self.log_rows(params, batch, rng=rng,
                                 ddim_steps=min(ddim_steps, 50))
            if self.extra.get("plot_diffusion_rows", False):
                log["diffusion_row"] = rows["diffusion_row"]
            if self.extra.get("plot_denoise_rows", False):
                log["denoise_row"] = rows["denoise_row"]
        if sample_flag and self.extra.get("plot_progressive_rows", False):
            log["progressive_row"] = self.log_progressive_rows(
                params, ctx, rng, n_row=min(2, x.shape[0]))
        return log

    def _decode_intermediates_row(self, params, inters, final, stride):
        """Decode sampler intermediates at ``stride`` into per-sample grids.

        Shared tail of both galleries. Strided slicing happens ON DEVICE
        (only the kept frames feed the decoder), and all kept frames decode
        in one batched call instead of one dispatch per frame."""
        from frido_tpu.utils import visualize as vz

        frames = [si[::stride] for si in inters]  # [K_s, B, H, W, C] each
        frames.append(final[None])
        stacked = jnp.concatenate(frames, axis=0)
        k, b = stacked.shape[:2]
        imgs = np.asarray(self.decode_first_stage(
            params, stacked.reshape((k * b,) + stacked.shape[2:])))
        imgs = imgs.reshape((k, b) + imgs.shape[1:])
        row = np.swapaxes(imgs, 0, 1)  # [B, K, H, W, C]
        return np.stack([vz.make_grid(r, nrow=k) for r in row])

    def log_progressive_rows(self, params, ctx, rng, n_row: int = 2):
        """Progressive-generation gallery (``frido.py:1576-1582``): the
        full-T ancestral chain's x0 composites, decoded at a stride."""
        from frido_tpu.diffusion import samplers

        cfg = samplers.SamplerConfig(
            schedule=self.schedule, num_steps=self.timesteps, eta=1.0,
            guidance_scale=1.0, embed_dim_list=tuple(self.embed_dim_list),
            use_split_head=self.use_split_head,
            specify_channels=tuple(self.specify_channels),
            num_stage=self.num_stage,
            kind="vanilla", keep_intermediates=True)
        if ctx is not None:
            ctx = ctx[:n_row]
        eps_model = lambda xx, tt, cc, ss: self.apply_model(
            params, xx, tt, cc, ss)
        final, inters = samplers.sample(
            cfg, eps_model, rng,
            (n_row, self.image_size, self.image_size, self.channels), ctx)
        return self._decode_intermediates_row(
            params, inters, final, max(self.timesteps // 5, 1))

    def log_rows(self, params, batch, rng=None, n_row: int = 2,
                 ddim_steps: int = 50, log_every_t: int = 10):
        """Diffusion / denoise galleries (``frido.py:1526-1583``):
        ``diffusion_row`` = decoded q_sample snapshots per stage;
        ``denoise_row`` = decoded sampler intermediates."""
        import jax

        from frido_tpu.diffusion import samplers
        from frido_tpu.utils import visualize as vz

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        image = jnp.asarray(np.asarray(batch["image"], np.float32)[:n_row])
        z = self.encode_first_stage(params, image)
        log = {}

        # diffusion row: forward noising snapshots, coarse stage last
        snaps = []
        noise_key, rng = jax.random.split(rng)
        noise = jax.random.normal(noise_key, z.shape)
        for s in range(self.num_stage - 1, -1, -1):
            for t_val in range(0, self.timesteps, max(log_every_t, 1)):
                t = jnp.full((z.shape[0],), t_val, jnp.int32)
                zn = self.q_sample_stage(z, t, s, noise)
                snaps.append(np.asarray(
                    self.decode_first_stage(params, zn)))
        row = np.stack(snaps, axis=1)  # [B, S, H, W, C]
        log["diffusion_row"] = np.stack(
            [vz.make_grid(r, nrow=len(snaps)) for r in row])

        # denoise row: sampler intermediates decoded
        ctx = None
        if self.cond_wrapper is not None:
            key = self.cond_stage_key
            cond = batch[key] if key in batch else batch
            if isinstance(cond, list):
                cond = cond[:n_row]
            tokens = np.asarray(self.tokenize(cond))[:n_row]
            ctx = self.get_learned_conditioning(params, jnp.asarray(tokens))
        cfg = samplers.SamplerConfig(
            schedule=self.schedule, num_steps=ddim_steps, eta=0.0,
            guidance_scale=1.0, embed_dim_list=tuple(self.embed_dim_list),
            use_split_head=self.use_split_head,
            specify_channels=tuple(self.specify_channels),
            num_stage=self.num_stage,
            kind="plms", keep_intermediates=True)
        eps_model = lambda xx, tt, cc, ss: self.apply_model(
            params, xx, tt, cc, ss)
        final, inters = samplers.sample(
            cfg, eps_model, rng,
            (n_row, self.image_size, self.image_size, self.channels), ctx)
        log["denoise_row"] = self._decode_intermediates_row(
            params, inters, final, max(ddim_steps // 5, 1))
        return log


class DDPM(FridoDiffusion):
    """Single-stage classic DDPM entry point (``frido.py:45-476``);
    kept for config compatibility."""
