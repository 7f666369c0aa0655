"""MS-VQGAN GAN training step (generator + discriminator phases).

Replaces the Lightning two-optimizer alternation
(``/root/reference/taming/models/msvqgan.py:199-261``) with one jitted step
that runs both phases. The adaptive generator weight
``|grad_nll| / |grad_g|`` w.r.t. the decoder's final conv kernel
(``vqperceptual.py:67-78``) comes from two cheap last-layer-only backward
passes (the torch ``autograd.grad(loss, last_layer)`` graph), then ONE full
backward of ``nll + cb*qloss + d_weight * disc_factor * g_loss`` with
d_weight stop-gradiented — identical update by linearity.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class VQGANTrainState:
    params_g: Any          # MSVQGAN params {'params': ...}
    vars_d: Any            # loss module variables {'params', 'batch_stats'}
    opt_g: Any
    opt_d: Any
    step: jnp.ndarray


def _last_layer_leaf(params_g: Dict) -> jnp.ndarray:
    """decoder.conv_out.weight — the reference's ``get_last_layer``
    (``msvqgan.py:263-264``)."""
    return params_g["params"]["decoder"]["conv_out"]["kernel"]


def create_vqgan_train_state(module, loss_wrapper, rng, tx_g, tx_d,
                             image_shape=(1, 64, 64, 3),
                             sample_images=None) -> VQGANTrainState:
    """``sample_images``: real images for init. Required for faithful
    ActNorm data-dependent init (use_actnorm — torch computes loc/scale
    from the first training batch); with None the init batch is zeros and
    ActNorm starts at identity (discriminator.py docstring)."""
    rng_g, rng_d = jax.random.split(rng)
    x0 = (jnp.asarray(sample_images) if sample_images is not None
          else jnp.zeros(image_shape))
    params_g = module.init(rng_g, x0)
    vars_d = loss_wrapper.init_params(rng_d, image_shape, sample_images)
    return VQGANTrainState(
        params_g=params_g,
        vars_d=vars_d,
        opt_g=tx_g.init(params_g),
        opt_d=tx_d.init({"params": vars_d["params"]}),
        step=jnp.zeros((), jnp.int32),
    )


def make_vqgan_train_step(module, loss_wrapper, tx_g, tx_d,
                          use_aux_loss: bool = False,
                          compute_dtype=None) -> Callable:
    """step(state, images) -> (state, logs); images NHWC in [-1, 1].

    compute_dtype: run the VQGAN encoder/decoder fwd/bwd in this dtype
    (bf16) with fp32 master params; the recon/GAN losses, discriminator
    and the adaptive d_weight (grad-norm ratio) stay fp32."""
    cb_w = loss_wrapper.codebook_weight
    disc_factor0 = loss_wrapper.disc_factor
    disc_start = loss_wrapper.disc_start
    d_weight_max = loss_wrapper.discriminator_weight

    def gen_losses(params_g, vars_d, x):
        xin = x.astype(compute_dtype) if compute_dtype is not None else x
        if use_aux_loss:
            dec, dec_aux, qloss, _ = module.apply(
                params_g, xin, False, method="forward_with_aux")
        else:
            dec, qloss, _ = module.apply(params_g, xin, False)
            dec_aux = None
        if compute_dtype is not None:
            dec = dec.astype(jnp.float32)
            qloss = qloss.astype(jnp.float32)
            if dec_aux is not None:
                dec_aux = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float32), dec_aux)
        nll, nll_logs = loss_wrapper.nll_loss(vars_d, x, dec, dec_aux)
        logits_fake, _ = loss_wrapper.logits(vars_d, dec, train=True)
        g_loss = -jnp.mean(logits_fake)
        return nll, qloss, g_loss, dec, nll_logs

    def step(state: VQGANTrainState, x: jnp.ndarray):
        disc_factor = jnp.where(state.step < disc_start, 0.0, disc_factor0)

        # ---- generator phase -----------------------------------------
        # d_weight = |grad_last(nll)| / |grad_last(g)| needs gradients
        # w.r.t. the FINAL decoder kernel only — exactly the reference's
        # torch.autograd.grad(loss, last_layer) (vqperceptual.py:67-78).
        # Differentiating a closure over just that kernel backprops only
        # through dec -> losses, not the whole encoder/decoder, so this
        # costs two cheap tail backwards + ONE full backward of the
        # combined loss (the old form ran two full backwards).
        def set_last(params_g, kernel):
            p = dict(params_g)
            p["params"] = dict(p["params"])
            p["params"]["decoder"] = dict(p["params"]["decoder"])
            p["params"]["decoder"]["conv_out"] = dict(
                p["params"]["decoder"]["conv_out"])
            p["params"]["decoder"]["conv_out"]["kernel"] = kernel
            return p

        def f_last(kernel):
            pg = set_last(state.params_g, kernel)
            nll, qloss, g_loss, _, _ = gen_losses(pg, state.vars_d, x)
            return jnp.stack([nll + cb_w * qloss, g_loss])

        jac = jax.jacrev(f_last)(_last_layer_leaf(state.params_g))
        gn = jnp.linalg.norm(jac[0])
        gg = jnp.linalg.norm(jac[1])
        d_weight = jnp.clip(gn / (gg + 1e-4), 0.0, 1e4) * d_weight_max
        d_weight = jax.lax.stop_gradient(d_weight)

        def f_total(params_g):
            nll, qloss, g_loss, dec, logs = gen_losses(params_g,
                                                       state.vars_d, x)
            total = (nll + cb_w * qloss
                     + d_weight * disc_factor * g_loss)
            return total, (nll, qloss, g_loss, dec, logs)

        ((_, (nll, qloss, g_loss, dec, nll_logs)), total_grad) = (
            jax.value_and_grad(f_total, has_aux=True)(state.params_g))
        nll_cb = nll + cb_w * qloss

        upd_g, opt_g = tx_g.update(total_grad, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, upd_g)

        # ---- discriminator phase -------------------------------------
        dec_sg = jax.lax.stop_gradient(dec)

        def f_d(d_params):
            vars_d = {**state.vars_d, "params": d_params["params"]}
            logits_real, upd1 = loss_wrapper.logits(vars_d, x, train=True)
            vars_d2 = {**vars_d, **upd1}
            logits_fake, upd2 = loss_wrapper.logits(vars_d2, dec_sg,
                                                    train=True)
            d_loss = disc_factor * loss_wrapper.disc_loss(logits_real,
                                                          logits_fake)
            return d_loss, (upd2, logits_real.mean(), logits_fake.mean())

        (d_loss, (bs_updates, lr_mean, lf_mean)), grad_d = (
            jax.value_and_grad(f_d, has_aux=True)(
                {"params": state.vars_d["params"]}))
        upd_d, opt_d = tx_d.update(grad_d, state.opt_d,
                                   {"params": state.vars_d["params"]})
        new_d_params = optax.apply_updates(
            {"params": state.vars_d["params"]}, upd_d)
        vars_d = {**state.vars_d, "params": new_d_params["params"],
                  **bs_updates}

        logs = {
            "aeloss": nll_cb + d_weight * disc_factor * g_loss,
            "nll_loss": nll, "quant_loss": qloss, "g_loss": g_loss,
            "d_weight": d_weight, "discloss": d_loss,
            "logits_real": lr_mean, "logits_fake": lf_mean,
        }
        logs.update(nll_logs)
        return VQGANTrainState(params_g=params_g, vars_d=vars_d,
                               opt_g=opt_g, opt_d=opt_d,
                               step=state.step + 1), logs

    return step
