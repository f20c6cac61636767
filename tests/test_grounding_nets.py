"""Parity for all grounding tokenizers and downsamplers vs the reference."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gligen_tpu.convert.torch_to_jax import convert_state_dict
from gligen_tpu.models.grounding.convnext import convnext_tiny
from gligen_tpu.models.grounding.keypoint import KeypointPositionNet
from gligen_tpu.models.grounding.text_image import TextImagePositionNet
from gligen_tpu.models.grounding import downsamplers as ds
from gligen_tpu.models.grounding import spatial

RNG = np.random.default_rng(77)


def _shim_timm():
    """The reference convnext imports timm (absent here) only for
    DropPath (unused: drop_path_rate=0), trunc_normal_, register_model."""
    import sys
    import types

    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    layers.DropPath = torch.nn.Identity
    registry.register_model = lambda fn: fn
    models.layers, models.registry = layers, registry
    timm.models = models
    sys.modules.update(
        {"timm": timm, "timm.models": models,
         "timm.models.layers": layers, "timm.models.registry": registry}
    )
    # The reference spatial nets build convnext_tiny(pretrained=True);
    # zero-egress env -> stub the hub download (weights get overwritten by
    # _randomize anyway; load_state_dict uses strict=False).
    torch.hub.load_state_dict_from_url = lambda *a, **k: {"model": {}}


def _randomize(mod, seed=0, scale=0.1):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    return mod.eval()


def _params(mod):
    return {"params": convert_state_dict(mod.state_dict())}


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def test_text_image_position_net_parity(reference_path):
    from ldm.modules.diffusionmodules.text_image_grounding_net import PositionNet as Ref

    ref = _randomize(Ref(in_dim=48, out_dim=32))
    b, n = 2, 6
    boxes = RNG.random((b, n, 4)).astype(np.float32)
    masks = (RNG.random((b, n)) > 0.3).astype(np.float32)
    tmask = (RNG.random((b, n)) > 0.3).astype(np.float32)
    imask = (RNG.random((b, n)) > 0.3).astype(np.float32)
    temb = RNG.standard_normal((b, n, 48)).astype(np.float32)
    iemb = RNG.standard_normal((b, n, 48)).astype(np.float32)
    with torch.no_grad():
        want = ref(*(torch.from_numpy(a) for a in (boxes, masks, tmask, imask, temb, iemb))).numpy()
    got = TextImagePositionNet(in_dim=48, out_dim=32).apply(
        _params(ref), *(jnp.asarray(a) for a in (boxes, masks, tmask, imask, temb, iemb))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_keypoint_position_net_parity(reference_path):
    from ldm.modules.diffusionmodules.keypoint_grounding_net import PositionNet as Ref

    ref = _randomize(Ref(max_persons_per_image=3, out_dim=32))
    b = 2
    pts = RNG.random((b, 3 * 17, 2)).astype(np.float32)
    masks = (RNG.random((b, 3 * 17)) > 0.4).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(pts), torch.from_numpy(masks)).numpy()
    got = KeypointPositionNet(max_persons_per_image=3, out_dim=32).apply(
        _params(ref), jnp.asarray(pts), jnp.asarray(masks)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_convnext_tiny_parity(reference_path):
    _shim_timm()
    from ldm.modules.diffusionmodules.convnext import convnext_tiny as ref_tiny

    ref = _randomize(ref_tiny(pretrained=False), scale=0.05)
    x = RNG.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # (1, 768, 2, 2)
    got = convnext_tiny().apply(_params(ref), _nhwc(x))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4
    )


@pytest.mark.parametrize("mod", ["hed", "sem"])
def test_spatial_position_net_parity(reference_path, mod):
    _shim_timm()
    if mod == "hed":
        from ldm.modules.diffusionmodules.hed_grounding_net import PositionNet as Ref

        ref = _randomize(Ref(resize_input=64, out_dim=32), scale=0.05)
        mine = spatial.HedPositionNet(resize_input=64, out_dim=32)
        x = RNG.standard_normal((2, 3, 48, 48)).astype(np.float32)
    else:
        from ldm.modules.diffusionmodules.sem_grounding_net import PositionNet as Ref

        ref = _randomize(Ref(resize_input=64, in_dim=12, out_dim=32), scale=0.05)
        mine = spatial.SemPositionNet(resize_input=64, in_dim=12, out_dim=32)
        x = RNG.standard_normal((2, 12, 48, 48)).astype(np.float32)

    mask = np.array([1.0, 0.0], dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(mask)).numpy()
    got = mine.apply(_params(ref), _nhwc(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


@pytest.mark.parametrize("mod", ["hed", "canny", "normal", "sem"])
def test_downsampler_parity(reference_path, mod):
    if mod == "hed":
        from ldm.modules.diffusionmodules.hed_grounding_downsampler import GroundingDownsampler as Ref

        ref, mine = Ref(), ds.HedDownsampler()
        x = RNG.standard_normal((2, 3, 128, 128)).astype(np.float32)
    elif mod == "canny":
        from ldm.modules.diffusionmodules.canny_grounding_downsampler import GroundingDownsampler as Ref

        ref, mine = _randomize(Ref(resize_input=64)), ds.CannyDownsampler(resize_input=64)
        x = RNG.standard_normal((2, 3, 128, 128)).astype(np.float32)
    elif mod == "normal":
        from ldm.modules.diffusionmodules.normal_grounding_downsampler import GroundingDownsampler as Ref

        ref, mine = _randomize(Ref(resize_input=64)), ds.NormalDownsampler(resize_input=64)
        x = RNG.standard_normal((2, 3, 128, 128)).astype(np.float32)
    else:
        from ldm.modules.diffusionmodules.sem_grounding_downsampler import GroundingDownsampler as Ref

        ref, mine = _randomize(Ref(resize_input=64, in_dim=12)), ds.SemDownsampler(resize_input=64, in_dim=12)
        x = RNG.standard_normal((2, 12, 128, 128)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    params = _params(ref) if list(ref.state_dict()) else {"params": {}}
    got = mine.apply(params, _nhwc(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-4)


# ---- compact host encodings (uint8 pixels / uint8 class labels) ----
# Serving/CLI ship RAW uint8 maps and the nets expand on device
# (spatial.prepare_spatial_map): these pin that the compact path equals
# the reference-parity float path bit-for-bit (sem: label-resize commutes
# with one-hot; pixels: /255*2-1 commutes with the affine resize).


def _onehot(lab, n):
    out = np.zeros(lab.shape + (n,), np.float32)
    np.put_along_axis(out, lab[..., None].astype(np.int64), 1.0, axis=-1)
    return out


def test_spatial_net_uint8_pixels_equal_float_path():
    mine = spatial.HedPositionNet(resize_input=64, out_dim=32)
    pix = RNG.integers(0, 256, (2, 48, 48, 3)).astype(np.uint8)
    mask = np.array([1.0, 1.0], dtype=np.float32)
    import jax

    params = mine.init(jax.random.PRNGKey(0), jnp.asarray(pix), jnp.asarray(mask))
    want = mine.apply(params, jnp.asarray(pix.astype(np.float32) / 255.0 * 2.0 - 1.0),
                      jnp.asarray(mask))
    got = mine.apply(params, jnp.asarray(pix), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sem_net_uint8_labels_equal_onehot_path():
    mine = spatial.SemPositionNet(resize_input=64, in_dim=12, out_dim=32)
    lab = RNG.integers(0, 12, (2, 48, 48)).astype(np.uint8)
    mask = np.array([1.0, 0.0], dtype=np.float32)
    import jax

    params = mine.init(jax.random.PRNGKey(1), jnp.asarray(lab), jnp.asarray(mask))
    want = mine.apply(params, jnp.asarray(_onehot(lab, 12)), jnp.asarray(mask))
    got = mine.apply(params, jnp.asarray(lab), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_downsamplers_uint8_equal_float_path():
    import jax

    # hed: parameterless bicubic — affine commute, fp32-exact to ~1e-6
    pix = RNG.integers(0, 256, (2, 128, 128, 3)).astype(np.uint8)
    hed = ds.HedDownsampler()
    want = hed.apply({"params": {}}, jnp.asarray(pix.astype(np.float32) / 255.0 * 2.0 - 1.0))
    got = hed.apply({"params": {}}, jnp.asarray(pix))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # sem: label nearest-resize commutes exactly with one-hot
    lab = RNG.integers(0, 12, (2, 128, 128)).astype(np.uint8)
    sem = ds.SemDownsampler(resize_input=64, in_dim=12)
    params = sem.init(jax.random.PRNGKey(2), jnp.asarray(lab))
    want = sem.apply(params, jnp.asarray(_onehot(lab, 12)))
    got = sem.apply(params, jnp.asarray(lab))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
