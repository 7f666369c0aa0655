"""Native CLIP text tower vs. HuggingFace torch CLIPTextModel.

Weight-for-weight parity (SURVEY.md §7 "pixel-faithful checkpoint
porting"): a randomly-initialized torch CLIPTextModel's state_dict is
imported through frido_tpu.io.torch_import into CLIPTextModule and the
last_hidden_state must match. This is the load path for the published
clip-t2i checkpoint (cond_stage_model.transformer.text_model.* keys).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frido_tpu.io.torch_import import import_state_dict
from frido_tpu.nn.clip import CLIPTextModule, CLIPTextPooledModule

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_clip():
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16)
    torch.manual_seed(0)
    model = CLIPTextModel(cfg).eval()
    return cfg, model


def test_clip_text_last_hidden_state_parity(tiny_clip):
    cfg, tmodel = tiny_clip
    module = CLIPTextModule(
        vocab_size=cfg.vocab_size, hidden=cfg.hidden_size,
        layers=cfg.num_hidden_layers, heads=cfg.num_attention_heads,
        intermediate=cfg.intermediate_size,
        max_positions=cfg.max_position_embeddings, name="cond_stage_model")

    tokens = np.array([[5, 9, 2, 0, 1, 7, 3, 4, 6, 8, 10, 11, 12, 13, 14, 127],
                       [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 127]],
                      np.int32)
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(tokens))

    sd = {f"transformer.{k}": v.numpy()
          for k, v in tmodel.state_dict().items()}
    params = {"params": import_state_dict(params["params"], sd)}

    got = np.asarray(module.apply(params, jnp.asarray(tokens)))
    with torch.no_grad():
        want = tmodel(input_ids=torch.tensor(tokens.astype(np.int64))
                      ).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_clip_pooled_shape_and_norm():
    module = CLIPTextPooledModule(
        vocab_size=64, hidden=16, layers=1, heads=2, intermediate=32,
        max_positions=8, projection_dim=24, n_repeat=3)
    tokens = jnp.array([[1, 5, 63, 0, 0, 0, 0, 0]], jnp.int32)
    params = module.init(jax.random.PRNGKey(0), tokens)
    z = module.apply(params, tokens)
    assert z.shape == (1, 3, 24)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(z), axis=-1), 1.0, atol=1e-5)
    # repeats identical
    np.testing.assert_array_equal(np.asarray(z[:, 0]), np.asarray(z[:, 1]))


def test_clip_vision_tower_shapes():
    from frido_tpu.nn.clip import CLIPVisionTower, clip_preprocess

    tower = CLIPVisionTower(hidden=32, layers=1, heads=4, intermediate=64,
                            patch=14, image_size=28, projection_dim=24)
    x = jnp.zeros((2, 28, 28, 3))
    params = tower.init(jax.random.PRNGKey(0), x)
    out = tower.apply(params, x)
    assert out.shape == (2, 24)
    pre = clip_preprocess(jnp.zeros((2, 64, 48, 3)), image_size=28)
    assert pre.shape == (2, 28, 28, 3)


def test_clip_vision_tower_value_parity():
    """Weight-for-weight parity vs a randomly-initialized HF
    CLIPVisionModelWithProjection (image_embeds path) — the load surface of
    FrozenClipImageEmbedder (``modules.py:221-254``)."""
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from frido_tpu.nn.clip import CLIPVisionTower

    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=24)
    torch.manual_seed(0)
    tmodel = CLIPVisionModelWithProjection(cfg).eval()

    tower = CLIPVisionTower(hidden=32, layers=2, heads=4, intermediate=64,
                            patch=14, image_size=28, projection_dim=24)
    x = np.random.RandomState(0).randn(2, 28, 28, 3).astype(np.float32)
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # HF nests the tower under vision_model.* but keeps visual_projection
    # at the top level
    sd = {}
    for k, v in tmodel.state_dict().items():
        key = k[len("vision_model."):] if k.startswith("vision_model.") else k
        sd[key] = v.numpy()
    params = {"params": import_state_dict(params["params"], sd)}

    got = np.asarray(tower.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        want = tmodel(pixel_values=torch.from_numpy(
            x.transpose(0, 3, 1, 2))).image_embeds.numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
