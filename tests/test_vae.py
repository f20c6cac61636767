"""AutoencoderKL parity vs the reference (small config + SD-shape checks)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from gligen_tpu.convert.torch_to_jax import convert_vae
from gligen_tpu.models.vae import AutoencoderKL

SMALL = dict(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
    resolution=16, z_channels=4, embed_dim=4, scale_factor=0.18215,
)


def _ref_vae(reference_path):
    from ldm.models.autoencoder import AutoencoderKL as RefVAE

    torch.manual_seed(11)
    ref = RefVAE(
        ddconfig=dict(
            double_z=True, z_channels=4, resolution=16, in_channels=3, out_ch=3,
            ch=32, ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[8], dropout=0.0,
        ),
        embed_dim=4,
        scale_factor=0.18215,
    )
    ref.eval()
    with torch.no_grad():
        for name, p in ref.named_parameters():
            g = torch.Generator().manual_seed(abs(hash(name)) % (2**31))
            p.copy_(torch.randn(p.shape, generator=g) * 0.15)
    return ref


def test_vae_encode_moments_and_decode_parity(reference_path):
    ref = _ref_vae(reference_path)
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)

    with torch.no_grad():
        moments = ref.quant_conv(ref.encoder(torch.from_numpy(x)))
        want_mean, want_logvar = torch.chunk(moments, 2, dim=1)
        want_logvar = torch.clamp(want_logvar, -30.0, 20.0)

    model = AutoencoderKL(**SMALL)
    params = {"params": convert_vae(ref.state_dict())}
    mean, logvar = model.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), method=model.encode_moments
    )
    np.testing.assert_allclose(
        np.asarray(mean).transpose(0, 3, 1, 2), want_mean.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(logvar).transpose(0, 3, 1, 2), want_logvar.numpy(), atol=1e-4
    )

    # decode parity on a fixed latent
    z = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want_dec = ref.decode(torch.from_numpy(z)).numpy()
    got_dec = model.apply(
        params, jnp.asarray(z.transpose(0, 2, 3, 1)), method=model.decode
    )
    np.testing.assert_allclose(
        np.asarray(got_dec).transpose(0, 3, 1, 2), want_dec, atol=2e-4
    )


def test_vae_encode_sampling_statistics(reference_path):
    """encode() draws z = mean + std*eps; check it against the moments."""
    ref = _ref_vae(reference_path)
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)

    model = AutoencoderKL(**SMALL)
    params = {"params": convert_vae(ref.state_dict())}
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    mean, logvar = model.apply(params, xj, method=model.encode_moments)
    key = jax.random.PRNGKey(0)
    z = model.apply(params, xj, key, method=model.encode)
    eps = (np.asarray(z) / 0.18215 - np.asarray(mean)) / np.exp(0.5 * np.asarray(logvar))
    want_eps = np.asarray(jax.random.normal(key, mean.shape, mean.dtype))
    np.testing.assert_allclose(eps, want_eps, atol=1e-3)

    # deterministic mode path
    zm = model.apply(params, xj, method=model.encode_mode)
    np.testing.assert_allclose(np.asarray(zm), np.asarray(mean) * 0.18215, atol=1e-6)


def test_vae_sd_config_shapes():
    """SD-1.4 VAE config: 512x512x3 -> 64x64x4 latents and back."""
    model = AutoencoderKL(resolution=256)
    shapes = jax.eval_shape(
        model.init,
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 512, 512, 3)),
        jax.random.PRNGKey(1),
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 83_000_000 < n < 84_000_000, n  # SD VAE is 83.7M params

    enc = jax.eval_shape(
        lambda p, x: model.apply(p, x, method=model.encode_mode),
        shapes,
        jnp.zeros((1, 512, 512, 3)),
    )
    assert enc.shape == (1, 64, 64, 4)
