"""Batch-sharded sampling over the virtual 8-device mesh.

The reference shards inference by launching N processes on dataset chunks
(eval_t2i_multiGPU.sh); the TPU-native path is ONE pjit program with the
batch over the mesh's data axis (SURVEY.md §2.7). Sharded and replicated
runs must produce identical samples."""

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import (_TINY_COND, _TINY_FIRST, _TINY_MODEL,
                             _TINY_UNET)
from frido_tpu.models.frido import FridoDiffusion
from frido_tpu.parallel import mesh as pmesh


def test_sharded_sampling_matches_single_device():
    model = FridoDiffusion(first_stage_config=_TINY_FIRST,
                           cond_stage_config=_TINY_COND,
                           unet_config=_TINY_UNET, **_TINY_MODEL)
    params = model.init_params(jax.random.PRNGKey(0), context_len=12)
    b = 8
    tokens = np.random.RandomState(0).randint(0, 64, (b, 12)).astype("int32")
    x_init = jax.random.normal(jax.random.PRNGKey(3), (b, 16, 16, 8))

    def pipeline(params, tokens, x_init):
        ctx = model.get_learned_conditioning(params, tokens)
        z = model.sample(params, jax.random.PRNGKey(0), b, context=ctx,
                         steps=4, eta=0.0, sampler="plms", x_init=x_init)
        return model.decode_first_stage(params, z)

    single = jax.jit(pipeline)(params, jnp.asarray(tokens), x_init)

    m = pmesh.make_mesh(n_data=8)
    sharded_fn = jax.jit(
        pipeline,
        in_shardings=(pmesh.replicated(m), pmesh.batch_sharding(m),
                      pmesh.batch_sharding(m)),
        out_shardings=pmesh.batch_sharding(m))
    sharded = sharded_fn(
        pmesh.replicate(m, params),
        pmesh.shard_batch(m, jnp.asarray(tokens)),
        pmesh.shard_batch(m, x_init))
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=1e-4, rtol=1e-4)


def test_per_device_rng_folding():
    m = pmesh.make_mesh(n_data=8)
    keys = pmesh.fold_rng_per_device(jax.random.PRNGKey(0), m)
    assert keys.shape[0] == 8
    assert len({tuple(np.asarray(k)) for k in keys}) == 8  # all distinct
