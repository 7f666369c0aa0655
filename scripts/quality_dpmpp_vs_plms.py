#!/usr/bin/env python
"""Flagship-scale DPM-Solver++(2M)-25 vs PLMS-200 agreement (VERDICT r4 #7).

The 22.55 img/s DPM++ serving row was backed only by toy-scale convergence
tests (tests/test_dpmpp_sampler.py). This runs BOTH samplers on the
flagship t2i f16f8 model (random init — no pretrained assets exist on this
box) from the SAME x_T / context / guidance and reports how close the
25-step DPM++ solution lands to the 200-step PLMS solution of the same
probability-flow ODE, in latent and pixel space:

- latent PSNR (z range measured per-run) and Pearson correlation
- pixel PSNR (decoded [-1,1] images) and correlation
- a PLMS-200 vs PLMS-100 control: discretization noise WITHIN one sampler
  family, the scale against which the DPM++ gap should be judged

Prints ONE JSON line. Run on the chip:
``python scripts/quality_dpmpp_vs_plms.py [--batch 16]``.

Reference quality bar this stands in for until FID assets exist:
/root/reference/frido/models/diffusion/plms.py:116-194 (PLMS-200 is the
reference's published-FID sampler).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range ** 2 / mse)


def pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64).ravel()
    b = b.astype(np.float64).ravel()
    a -= a.mean()
    b -= b.mean()
    return float((a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke test on the tiny graft model")
    args = ap.parse_args()

    import __graft_entry__ as g
    from frido_tpu.config import instantiate_from_config, load_yaml
    from frido_tpu.models.frido import FridoDiffusion
    from frido_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    if args.tiny:
        model = FridoDiffusion(
            first_stage_config=g._TINY_FIRST, cond_stage_config=g._TINY_COND,
            unet_config=g._TINY_UNET, **g._TINY_MODEL)
        ctx_len, vocab = 12, g._TINY_COND["params"]["vocab_size"]
    else:
        # same construction path as main.py (target-alias resolution)
        model = instantiate_from_config(load_yaml(g.FLAGSHIP_CONFIG)["model"])
        ctx_len, vocab = 77, 30522  # BERT WordPiece vocab
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init_params(jax.random.PRNGKey(0),
                                   context_len=ctx_len)

    # Liven the zero-init projections (round-5 discovery): the reference
    # zero-inits every SpatialTransformer proj_out and ResBlock out-conv
    # (attention.py:277 / pyunet zero_module), so at RANDOM INIT the
    # whole attention branch — and with it the cond/uncond eps difference,
    # i.e. CFG itself — is exactly zero: the first version of this
    # artifact was bit-identical with and without guidance. Replacing the
    # zero kernels with small noise makes the context path (and the
    # guided ODE stiffening this evidence must exercise) live.
    import zlib

    def liven(tree, path=()):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                out[k] = liven(v, p)
            elif (hasattr(v, "shape") and v.ndim >= 2
                    and float(jnp.abs(v).max()) == 0.0):
                # crc32 of the path, NOT hash(): hash is PYTHONHASHSEED-
                # salted per process and PLMS on a random ODE field is
                # seed-sensitive — the artifact must be reproducible
                key = jax.random.PRNGKey(zlib.crc32("/".join(p).encode()))
                out[k] = 0.02 * jax.random.normal(key, v.shape, v.dtype)
            else:
                out[k] = v
        return out

    with jax.default_device(jax.devices("cpu")[0]):
        params = {"params": liven(params["params"])}
    params = jax.device_put(params, jax.devices()[0])

    B = args.batch
    lat = model.image_size
    # DISTINCT cond/uncond contexts: random nonzero tokens vs the all-zero
    # "empty caption" — with identical contexts guidance_scale is a
    # mathematical no-op (e_u + s*(e_c - e_u) = e_c), and CFG > 1 is
    # exactly the stiffened-ODE regime where low-step solvers degrade
    # most, i.e. the regime the 25.6 img/s serving row actually runs
    # (caught in round-5 review; the first artifact measured unguided)
    tokens = jnp.asarray(np.random.RandomState(7).randint(
        1, min(1000, vocab), (B, ctx_len)), jnp.int32)
    utokens = jnp.zeros((B, ctx_len), jnp.int32)
    # the SAME initial noise for every sampler run — the agreement being
    # measured is between deterministic (eta=0) solvers of one ODE
    x_T = jax.random.normal(jax.random.PRNGKey(42),
                            (B, lat, lat, model.channels), jnp.float32)

    def run(sampler: str, steps: int):
        def pipeline(params, tokens, utokens, x_T):
            ctx = model.get_learned_conditioning(params, tokens)
            uctx = model.get_learned_conditioning(params, utokens)
            z = model.sample(params, jax.random.PRNGKey(0), B, context=ctx,
                             uncond_context=uctx, steps=steps, eta=0.0,
                             guidance_scale=1.5, sampler=sampler,
                             x_T=x_T, compute_dtype=jnp.bfloat16,
                             cfg_mode="sequential")
            img = model.decode_first_stage(
                params, z, chunk=min(32, B) if B > 32 else None)
            return z, img

        z, img = jax.jit(pipeline)(params, tokens, utokens, x_T)
        return np.asarray(jax.device_get(z)), np.asarray(jax.device_get(img))

    # tiny graft model has timesteps=100, so the flagship 200/100/25 step
    # counts don't divide; scale them down for the smoke test
    s_plms, s_dpm, s_ctrl = (50, 10, 25) if args.tiny else (200, 25, 100)
    z_plms, img_plms = run("plms", s_plms)
    z_dpm, img_dpm = run("dpmpp", s_dpm)
    z_ctrl, img_ctrl = run("plms", s_ctrl)

    z_range = float(z_plms.max() - z_plms.min())
    out = {
        "metric": "DPM++(2M)-25 vs PLMS-200 flagship agreement",
        "cfg": "guided (1.5, distinct uncond context, zero-init "
               "projections livened so the context path is nonzero)",
        "batch": B,
        "model": "tiny" if args.tiny else "flagship t2i f16f8 (random init)",
        "latent_psnr_db": round(psnr(z_dpm, z_plms, z_range), 2),
        "latent_pearson": round(pearson(z_dpm, z_plms), 5),
        "pixel_psnr_db": round(psnr(img_dpm, img_plms, 2.0), 2),
        "pixel_pearson": round(pearson(img_dpm, img_plms), 5),
        "control_plms100_latent_psnr_db":
            round(psnr(z_ctrl, z_plms, z_range), 2),
        "control_plms100_pixel_psnr_db":
            round(psnr(img_ctrl, img_plms, 2.0), 2),
        "control_plms100_latent_pearson": round(pearson(z_ctrl, z_plms), 5),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
