"""Golden parity: x-transformer BERTEmbedder trunk vs the torch reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.reference_stub import install_reference, state_dict_numpy

torch = pytest.importorskip("torch")

from frido_tpu.io.torch_import import import_state_dict  # noqa: E402
from frido_tpu.nn.xtransformer import TransformerWrapper  # noqa: E402


@requires_reference
def test_transformer_wrapper_parity(reference_path):
    install_reference()
    from frido.modules.x_transformer import (
        Encoder as RefEncoder,
        TransformerWrapper as RefWrapper,
    )

    torch.manual_seed(0)
    ref = RefWrapper(
        num_tokens=100, max_seq_len=16,
        attn_layers=RefEncoder(dim=32, depth=2),
    ).eval()

    mod = TransformerWrapper(num_tokens=100, max_seq_len=16, dim=32, depth=2,
                             heads=8, dim_head=64)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 100, (2, 16)))
    params = mod.init(jax.random.PRNGKey(0), tokens)
    ported = import_state_dict(params["params"], state_dict_numpy(ref))

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.asarray(tokens)),
                      return_embeddings=True)
    ours = mod.apply({"params": ported}, tokens)
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), atol=3e-5)


@requires_reference
def test_class_embedder_parity(reference_path):
    install_reference()

    from frido_tpu.nn.encoders import ClassEmbedderModule

    torch.manual_seed(1)
    ref_emb = torch.nn.Embedding(50, 8)
    ids = np.random.RandomState(1).randint(0, 50, (3, 4))
    with torch.no_grad():
        # multilabel path: embed then max over token dim (modules.py:32-35)
        ref_out = ref_emb(torch.from_numpy(ids)).max(-2)[0].numpy()

    mod = ClassEmbedderModule(embed_dim=8, n_classes=50, multilabel=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    ported = import_state_dict(
        params["params"], {"embedding.weight": ref_emb.weight})
    ours = mod.apply({"params": ported}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-6)
