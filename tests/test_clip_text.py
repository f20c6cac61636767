"""CLIP text encoder parity vs HF transformers CLIPTextModel (torch)."""

import numpy as np
import torch

import jax.numpy as jnp

from gligen_tpu.convert.torch_to_jax import convert_clip_text
from gligen_tpu.models.clip_text import CLIPTextModel


def _small_pair():
    from transformers import CLIPTextConfig, CLIPTextModel as HFModel

    cfg = CLIPTextConfig(
        vocab_size=100,
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=16,
        hidden_act="quick_gelu",
        # The released openai/clip-vit-large-patch14 config ships
        # eos_token_id=2, which selects HF's argmax (eot = max id) pooling
        # path — the semantics our model implements.
        eos_token_id=2,
    )
    torch.manual_seed(21)
    ref = HFModel(cfg).eval()
    model = CLIPTextModel(
        vocab_size=100, hidden_size=64, layers=3, heads=4, max_positions=16
    )
    params = {"params": convert_clip_text(ref.state_dict())}
    return ref, model, params


def test_clip_text_last_hidden_parity():
    ref, model, params = _small_pair()
    rng = np.random.default_rng(13)
    ids = rng.integers(1, 99, size=(2, 16))
    ids[:, 0] = 0
    ids[0, 10:] = 99  # high id acts as EOT for argmax pooling
    ids[1, 14:] = 99
    ids = ids.astype(np.int32)

    with torch.no_grad():
        out = ref(torch.from_numpy(ids.astype(np.int64)))
    want_last = out.last_hidden_state.numpy()
    want_pooled = out.pooler_output.numpy()

    last, penult, pooled = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(last), want_last, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), want_pooled, atol=2e-5)


def test_clip_text_penultimate_parity():
    ref, model, params = _small_pair()
    ids = np.arange(32, dtype=np.int32).reshape(2, 16) % 90

    with torch.no_grad():
        out = ref(torch.from_numpy(ids.astype(np.int64)), output_hidden_states=True)
    # hidden_states[-2] is the input to the last layer ("before" layer select,
    # tsv_dataset.py:210-216 via CLIPModel hidden states).
    want = out.hidden_states[-2].numpy()
    _, penult, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(penult), want, atol=2e-5)


def test_clip_vitl14_shapes():
    import jax

    model = CLIPTextModel()
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 122_000_000 < n < 124_500_000, n  # CLIP ViT-L/14 text tower ~123M
