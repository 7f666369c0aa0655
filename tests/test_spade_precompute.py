"""SPADE-table precompute == inline computation, across model variants.

``PyUNetModel.spade_tables`` replays the trunk's static resolution schedule
to precompute every SPADE site's (gamma, beta) from the frozen
previous-stage channels (the per-stage loop invariant the samplers hoist
out of the step scan). The torch goldens in test_frido_parity.py already
pin the default path end-to-end; these tests pin the walker itself —
name keying and hw replay — on the variants whose trunk layout differs
(stage experts, resblock up/down resampling, mscond, the plain
AttentionBlock trunk), where a silently dropped or mis-sized table would
change numerics without crashing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frido_tpu.nn.pyunet import PyUNetModel

# <10-min tier: tools/pytest_cpu.sh -m fast (VERDICT r2 #7)
pytestmark = pytest.mark.fast

BASE = dict(
    use_split_head=True, split_embed_dim_list=[4, 4], use_SPADE_norm=True,
    image_size=8, in_channels=8, out_channels=8, model_channels=32,
    attention_resolutions=[4, 2], num_res_blocks=1, channel_mult=[1, 2],
    num_head_channels=16, use_spatial_transformer=True, transformer_depth=1,
    context_dim=64, num_stage=2,
)

VARIANTS = {
    "base": {},
    "stage_expert": {"use_stage_expert": True},
    "resblock_updown": {"resblock_updown": True},
    "mscond": {"use_mscond": True},
    # plain AttentionBlock trunk (covers AttentionBlock.spade_tables)
    "attn_block": {"use_spatial_transformer": False, "context_dim": None},
}


def _build(overrides):
    cfg = dict(BASE, **overrides)
    mod = PyUNetModel(**cfg)
    x0 = jnp.zeros((1, 8, 8, 8))
    t0 = jnp.zeros((1,), jnp.int32)
    c0 = (jnp.zeros((1, 5, 64))
          if cfg.get("use_spatial_transformer") else None)
    params = mod.init(jax.random.PRNGKey(0), x0, t0, c0, None,
                      method="init_all")
    # Freshly-initialized blocks end in zero_module convs, making every
    # block (and its SPADE sites) a no-op — perturb all params so the
    # comparison actually flows through the SPADE path.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])
    return mod, params, cfg


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_precomputed_tables_match_inline(variant):
    mod, params, cfg = _build(VARIANTS[variant])
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32)
    t = jnp.asarray([13, 401], jnp.int32)
    ctx = (jnp.asarray(rng.standard_normal((2, 5, 64)), jnp.float32)
           if cfg.get("use_spatial_transformer") else None)

    stage = 1  # the only stage with previous-stage cond channels
    inline = mod.apply(params, x, t, ctx, stage=stage)

    cond_dim = sum(cfg["split_embed_dim_list"][:stage])
    tables = mod.apply(params, x[..., :cond_dim], stage,
                       method="spade_tables")
    # every SPADE site must contribute a real table — an empty dict (or
    # all-None values) would make the "pre" path trivially equal inline
    assert tables and any(v is not None for v in tables.values())
    pre = mod.apply(params, x, t, ctx, stage=stage, spade_pre=tables)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(inline),
                               atol=1e-6, rtol=1e-6)


def test_tables_actually_consumed():
    """Corrupting a precomputed table must change the output — guards
    against a name-keying drift where ``_run_layer`` silently misses every
    lookup and falls back to the inline path."""
    mod, params, cfg = _build({})
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32)
    t = jnp.asarray([50, 222], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 5, 64)), jnp.float32)

    cond_dim = sum(cfg["split_embed_dim_list"][:1])
    tables = mod.apply(params, x[..., :cond_dim], 1, method="spade_tables")
    poisoned = jax.tree_util.tree_map(lambda a: a + 10.0, tables)
    clean = mod.apply(params, x, t, ctx, stage=1, spade_pre=tables)
    dirty = mod.apply(params, x, t, ctx, stage=1, spade_pre=poisoned)
    assert float(jnp.abs(clean - dirty).max()) > 1e-3
