"""Activation parity: transformer blocks vs randomly-initialized reference
torch modules, with weights carried over by the checkpoint converter."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gligen_tpu.convert.torch_to_jax import convert_state_dict
from gligen_tpu.models.layers import (
    BasicTransformerBlock,
    CrossAttention,
    FeedForward,
    GatedSelfAttentionDense,
    GatedSelfAttentionDense2,
    GatedCrossAttentionDense,
    SelfAttention,
    SpatialTransformer,
)

RNG = np.random.default_rng(42)
HEADS, DIM_HEAD = 4, 16
DIM = HEADS * DIM_HEAD  # 64
CTX_DIM = 48


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def _randomize(mod: torch.nn.Module, seed: int = 0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
    return mod


def _params(mod: torch.nn.Module):
    return {"params": convert_state_dict(mod.state_dict())}


def test_self_attention_parity(reference_path):
    from ldm.modules.attention import SelfAttention as RefSA

    ref = _randomize(RefSA(query_dim=DIM, heads=HEADS, dim_head=DIM_HEAD))
    x = _rand(2, 10, DIM)
    want = ref(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(
        SelfAttention(HEADS, DIM_HEAD).apply(_params(ref), jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_cross_attention_parity(reference_path):
    from ldm.modules.attention import CrossAttention as RefCA

    ref = _randomize(
        RefCA(query_dim=DIM, key_dim=CTX_DIM, value_dim=CTX_DIM, heads=HEADS, dim_head=DIM_HEAD)
    )
    x, ctx = _rand(2, 10, DIM), _rand(2, 7, CTX_DIM)
    want = ref(torch.from_numpy(x), torch.from_numpy(ctx), torch.from_numpy(ctx)).detach().numpy()
    got = np.asarray(
        CrossAttention(HEADS, DIM_HEAD).apply(
            _params(ref), jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(ctx)
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_cross_attention_mask_parity(reference_path):
    from ldm.modules.attention import CrossAttention as RefCA

    ref = _randomize(
        RefCA(query_dim=DIM, key_dim=CTX_DIM, value_dim=CTX_DIM, heads=HEADS, dim_head=DIM_HEAD)
    )
    x, ctx = _rand(2, 10, DIM), _rand(2, 7, CTX_DIM)
    mask = np.array([[1, 1, 1, 0, 0, 0, 0], [1, 1, 1, 1, 1, 1, 0]], dtype=bool)
    want = (
        ref(torch.from_numpy(x), torch.from_numpy(ctx), torch.from_numpy(ctx), torch.from_numpy(mask))
        .detach()
        .numpy()
    )
    got = np.asarray(
        CrossAttention(HEADS, DIM_HEAD).apply(
            _params(ref), jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(ctx), key_mask=jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_feedforward_geglu_parity(reference_path):
    from ldm.modules.attention import FeedForward as RefFF

    ref = _randomize(RefFF(DIM, glu=True))
    x = _rand(2, 5, DIM)
    want = ref(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(FeedForward().apply(_params(ref), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("scale", [1.0, 0.37, 0.0])
def test_gated_self_attention_parity(reference_path, scale):
    from ldm.modules.attention import GatedSelfAttentionDense as RefG

    ref = _randomize(RefG(query_dim=DIM, context_dim=CTX_DIM, n_heads=HEADS, d_head=DIM_HEAD))
    ref.scale = scale
    with torch.no_grad():
        ref.alpha_attn.fill_(0.5)
        ref.alpha_dense.fill_(-0.3)
    x, objs = _rand(2, 16, DIM), _rand(2, 6, CTX_DIM)
    want = ref(torch.from_numpy(x), torch.from_numpy(objs)).detach().numpy()
    got = np.asarray(
        GatedSelfAttentionDense(HEADS, DIM_HEAD).apply(
            _params(ref), jnp.asarray(x), jnp.asarray(objs), gate_scale=scale
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_gated_self_attention2_parity(reference_path):
    from ldm.modules.attention import GatedSelfAttentionDense2 as RefG

    ref = _randomize(RefG(query_dim=DIM, context_dim=CTX_DIM, n_heads=HEADS, d_head=DIM_HEAD))
    with torch.no_grad():
        ref.alpha_attn.fill_(0.4)
        ref.alpha_dense.fill_(0.2)
    x, objs = _rand(2, 64, DIM), _rand(2, 16, CTX_DIM)  # 8x8 visual, 4x4 grounding
    want = ref(torch.from_numpy(x), torch.from_numpy(objs)).detach().numpy()
    got = np.asarray(
        GatedSelfAttentionDense2(HEADS, DIM_HEAD).apply(
            _params(ref), jnp.asarray(x), jnp.asarray(objs), gate_scale=1.0
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_gated_cross_attention_parity(reference_path):
    from ldm.modules.attention import GatedCrossAttentionDense as RefG

    ref = _randomize(
        RefG(query_dim=DIM, key_dim=CTX_DIM, value_dim=CTX_DIM, n_heads=HEADS, d_head=DIM_HEAD)
    )
    with torch.no_grad():
        ref.alpha_attn.fill_(0.9)
        ref.alpha_dense.fill_(-0.8)
    x, objs = _rand(2, 12, DIM), _rand(2, 6, CTX_DIM)
    want = ref(torch.from_numpy(x), torch.from_numpy(objs)).detach().numpy()
    got = np.asarray(
        GatedCrossAttentionDense(HEADS, DIM_HEAD).apply(
            _params(ref), jnp.asarray(x), jnp.asarray(objs), gate_scale=1.0
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_basic_transformer_block_parity(reference_path):
    from ldm.modules.attention import BasicTransformerBlock as RefB

    ref = _randomize(
        RefB(DIM, CTX_DIM, CTX_DIM, HEADS, DIM_HEAD, fuser_type="gatedSA", use_checkpoint=False)
    )
    with torch.no_grad():
        ref.fuser.alpha_attn.fill_(0.3)
        ref.fuser.alpha_dense.fill_(0.1)
    x, ctx, objs = _rand(2, 16, DIM), _rand(2, 7, CTX_DIM), _rand(2, 5, CTX_DIM)
    want = ref(torch.from_numpy(x), torch.from_numpy(ctx), torch.from_numpy(objs)).detach().numpy()
    got = np.asarray(
        BasicTransformerBlock(HEADS, DIM_HEAD, "gatedSA").apply(
            _params(ref), jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(objs), 1.0
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_spatial_transformer_parity(reference_path):
    from ldm.modules.attention import SpatialTransformer as RefST

    ref = _randomize(
        RefST(DIM, key_dim=CTX_DIM, value_dim=CTX_DIM, n_heads=HEADS, d_head=DIM_HEAD,
              depth=1, fuser_type="gatedSA", use_checkpoint=False)
    )
    with torch.no_grad():
        ref.transformer_blocks[0].fuser.alpha_attn.fill_(0.3)
        ref.transformer_blocks[0].fuser.alpha_dense.fill_(0.1)
    x = _rand(2, 8, 8, DIM)  # NHWC for us, NCHW for torch
    ctx, objs = _rand(2, 7, CTX_DIM), _rand(2, 5, CTX_DIM)
    want = (
        ref(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(ctx), torch.from_numpy(objs))
        .permute(0, 2, 3, 1)
        .detach()
        .numpy()
    )
    got = np.asarray(
        SpatialTransformer(HEADS, DIM_HEAD, depth=1, fuser_type="gatedSA", use_checkpoint=False).apply(
            _params(ref), jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(objs), 1.0
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_text_position_net_parity(reference_path):
    from ldm.modules.diffusionmodules.text_grounding_net import PositionNet as RefPN

    from gligen_tpu.models.grounding.text import TextPositionNet

    ref = _randomize(RefPN(in_dim=CTX_DIM, out_dim=DIM))
    boxes = np.clip(_rand(2, 6, 4) * 0.2 + 0.5, 0, 1).astype(np.float32)
    masks = np.array([[1, 1, 1, 0, 0, 0], [1, 0, 0, 0, 0, 0]], dtype=np.float32)
    embs = _rand(2, 6, CTX_DIM)
    want = ref(torch.from_numpy(boxes), torch.from_numpy(masks), torch.from_numpy(embs)).detach().numpy()
    got = np.asarray(
        TextPositionNet(in_dim=CTX_DIM, out_dim=DIM).apply(
            _params(ref), jnp.asarray(boxes), jnp.asarray(masks), jnp.asarray(embs)
        )
    )
    # Fourier high-frequency sin/cos ulp differences propagate through the MLP.
    np.testing.assert_allclose(got, want, atol=1e-4)
