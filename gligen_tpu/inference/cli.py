"""Inference CLI (reference gligen_inference.py).

``python -m gligen_tpu.inference.cli --ckpt ... [--meta meta.json]`` runs
grounded generation scenarios: per-modality batch preparation
(gligen_inference.py:144-338), CLIP phrase/image feature extraction with
projection-matrix reprojection and x28.7 renorm (:91-128), alpha-stage
scheduling, inpainting (box->mask + VAE-encoded image), PLMS-50/DDIM-250
select, and PNG saving (:430-446).

Without a checkpoint (``--ckpt random``) it runs the full path on
randomly initialized weights — a smoke/perf mode, not image quality.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

MAX_OBJS = 30


def crop_and_resize(pil_image, size: int = 512):
    """Center-crop to square then resize (gligen_inference.py:190-195)."""
    w, h = pil_image.size
    crop = min(w, h)
    left, top = (w - crop) // 2, (h - crop) // 2
    return pil_image.crop((left, top, left + crop, top + crop)).resize((size, size))


def complete_mask(has_mask, max_objs: int = MAX_OBJS) -> np.ndarray:
    """gligen_inference.py:131-141."""
    mask = np.ones((1, max_objs), np.float32)
    if has_mask is None:
        return mask
    if isinstance(has_mask, (int, float)):
        return mask * has_mask
    for idx, value in enumerate(has_mask):
        mask[0, idx] = value
    return mask


def load_image_pm1(path: str, size: int = 512, mode: str = "RGB") -> np.ndarray:
    from PIL import Image

    img = crop_and_resize(Image.open(path).convert(mode), size)
    arr = np.asarray(img, dtype=np.float32) / 255.0 * 2.0 - 1.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


class FeatureExtractor:
    """CLIP phrase/image features (gligen_inference.py:100-127).

    ``allow_random`` (smoke mode, random weights): image features fall back
    to a deterministic pseudo-feature when CLIP-vision weights / the
    projection matrix are absent, so every scenario shape stays runnable."""

    def __init__(self, pipe, vision_params=None, projection_matrix=None,
                 allow_random: bool = False):
        self.pipe = pipe
        self.vision_params = vision_params
        self.projection_matrix = projection_matrix
        self.allow_random = allow_random
        self._vision = None

    def text_feature(self, phrase: str) -> np.ndarray:
        import jax.numpy as jnp

        ids = self.pipe.tokenizer([phrase]) if hasattr(self.pipe, "tokenizer") else None
        te = self.pipe.c.text_encoder
        _, _, pooled = te.apply(
            {"params": self.pipe.params["text_encoder"]}, jnp.asarray(ids)
        )
        return np.asarray(pooled[0])

    def image_feature(self, path: str) -> np.ndarray:
        from PIL import Image

        return self.image_feature_from_pil(Image.open(path).convert("RGB"))

    def image_feature_from_pil(self, pil_image) -> np.ndarray:
        import jax.numpy as jnp

        from gligen_tpu.models.clip_vision import CLIPVisionModel, clip_preprocess

        if (self.vision_params is None or self.projection_matrix is None) and self.allow_random:
            seed = int(np.asarray(pil_image, np.uint8).sum()) % (2**31)
            feat = np.random.default_rng(seed).standard_normal(768).astype(np.float32)
            return feat / np.linalg.norm(feat) * 28.7
        assert self.vision_params is not None, "image grounding needs CLIP vision weights"
        assert self.projection_matrix is not None, "image grounding needs projection_matrix"
        if self._vision is None:
            self._vision = CLIPVisionModel()
        img = np.asarray(pil_image, np.float32)
        pixels = clip_preprocess(jnp.asarray(img)[None])
        embeds, _ = self._vision.apply({"params": self.vision_params}, pixels)
        # reproject into text-penultimate space, renorm to 28.7
        # (gligen_inference.py:113-116: project(feature, P.T) == feature @ P)
        feat = np.asarray(embeds[0]) @ self.projection_matrix
        return feat / np.linalg.norm(feat) * 28.7


# -------------------------------------------------- per-modality batch prep

def prepare_batch_box(meta, batch: int, features: FeatureExtractor, max_objs=MAX_OBJS):
    """Box+text(+image) grounding (gligen_inference.py:144-187)."""
    phrases = meta.get("phrases")
    images = meta.get("images")
    images = [None] * len(phrases) if images is None else images
    phrases = [None] * len(images) if phrases is None else phrases

    boxes = np.zeros((max_objs, 4), np.float32)
    masks = np.zeros(max_objs, np.float32)
    text_masks = np.zeros(max_objs, np.float32)
    image_masks = np.zeros(max_objs, np.float32)
    text_embeddings = np.zeros((max_objs, 768), np.float32)
    image_embeddings = np.zeros((max_objs, 768), np.float32)

    for idx, (box, phrase, image) in enumerate(zip(meta["locations"], phrases, images)):
        boxes[idx] = box
        masks[idx] = 1
        if phrase is not None:
            text_embeddings[idx] = features.text_feature(phrase)
            text_masks[idx] = 1
        if image is not None:
            image_embeddings[idx] = features.image_feature(image)
            image_masks[idx] = 1

    rep = lambda a: np.repeat(a[None], batch, axis=0)
    return {
        "boxes": rep(boxes),
        "masks": rep(masks),
        "text_masks": rep(text_masks) * complete_mask(meta.get("text_mask"), max_objs),
        "image_masks": rep(image_masks) * complete_mask(meta.get("image_mask"), max_objs),
        "text_embeddings": rep(text_embeddings),
        "image_embeddings": rep(image_embeddings),
    }


def prepare_batch_kp(meta, batch: int, max_persons: int = 8):
    """gligen_inference.py:199-218."""
    points = np.zeros((max_persons * 17, 2), np.float32)
    idx = 0
    for person in meta["locations"]:
        for kp in person:
            points[idx] = kp
            idx += 1
    masks = (points.mean(axis=1) != 0).astype(np.float32)
    return {
        "points": np.repeat(points[None], batch, 0),
        "masks": np.repeat(masks[None], batch, 0),
    }


def _meta_image(meta, *keys: str) -> str:
    """The reference metas name map keys inconsistently (hed_image/canny_image
    vs normal/depth/sem, gligen_inference.py:532-578); accept both forms."""
    for k in keys:
        if k in meta:
            return meta[k]
    raise KeyError(f"meta missing any of {keys}: {sorted(meta)}")


def prepare_batch_spatial(meta, batch: int, key: str, image_key: str):
    """hed/canny/depth/normal maps (gligen_inference.py:222-297).

    Ships RAW uint8 pixels; the grounding net applies the exact /255·2−1
    normalization on device (prepare_spatial_map) — 4× less host→device
    traffic and the bytes stay compressible on the axon link."""
    from PIL import Image

    img = crop_and_resize(
        Image.open(_meta_image(meta, image_key, image_key.replace("_image", ""))).convert("RGB"),
        512)
    arr = np.asarray(img, np.uint8)
    return {
        key: np.repeat(arr[None], batch, 0),
        "mask": np.ones(batch, np.float32),
    }


def prepare_batch_sem(meta, batch: int, num_classes: int = 152):
    """gligen_inference.py:317-338: label png -> class-label map.

    The reference one-hots host-side; here the uint8 LABELS ship to the
    device and one-hot happens inside the jit (prepare_spatial_map) —
    152×4 bytes/px → 1 byte/px on the axon link, which was the entire
    sem operating point (docs/perf.md r5)."""
    from PIL import Image

    sem = Image.open(_meta_image(meta, "sem_image", "sem")).convert("L")
    w, h = sem.size
    crop = min(w, h)
    sem = sem.crop(((w - crop) // 2, (h - crop) // 2, (w + crop) // 2, (h + crop) // 2))
    sem = np.asarray(sem.resize((512, 512), Image.NEAREST), np.uint8)
    assert int(sem.max()) < num_classes, (sem.max(), num_classes)
    return {
        "sem": np.repeat(sem[None], batch, 0),
        "mask": np.ones(batch, np.float32),
    }


def prepare_batch_for(meta, batch: int, features: FeatureExtractor):
    """Modality dispatch on ckpt name substring (gligen_inference.py:361-376).
    Returns the RAW batch dict; the modality input adapter maps it to the
    grounding tokenizer's kwargs (grounding_input/*)."""
    ckpt = meta["ckpt"]
    if "keypoint" in ckpt:
        return prepare_batch_kp(meta, batch)
    for mod, key, img_key in (
        ("hed", "hed_edge", "hed_image"),
        ("canny", "canny_edge", "canny_image"),
        ("depth", "depth", "depth_image"),
        ("normal", "normal", "normal_image"),
    ):
        if mod in ckpt:
            return prepare_batch_spatial(meta, batch, key, img_key)
    if "sem" in ckpt:
        return prepare_batch_sem(meta, batch)
    return prepare_batch_box(meta, batch, features)


# -------------------------------------------------------------------- run

def dezero_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """De-zero a fresh-init UNet so random-weight runs are non-vacuous
    (the tests/test_full_scale_parity.py `_dezero` recipe): fuser
    alpha_attn/alpha_dense gates -> 0.5, zero-init kernels (zero_module
    output convs, null grounding features) -> seeded randn / sqrt(fan_in).
    Deterministic in the param PATH, so two processes building the same
    init always de-zero to identical values (the fidelity gate's
    same-weights-two-precisions contract)."""
    import flax.traverse_util as traverse
    import jax
    import jax.numpy as jnp

    flat = traverse.flatten_dict(params)
    out = {}
    for path, v in flat.items():
        name = "/".join(path)
        if path[-1] in ("alpha_attn", "alpha_dense"):
            v = jnp.full_like(v, 0.5)
        elif float(jnp.abs(v).sum()) == 0.0 and v.ndim >= 1:
            import zlib

            # crc32, not hash(): str hash is randomized per process and the
            # fidelity gate needs identical de-zeroing across processes
            key = jax.random.PRNGKey(zlib.crc32(name.encode()) % (2**31))
            fan_in = int(np.prod(v.shape[:-1])) if v.ndim >= 2 else v.size
            v = jax.random.normal(key, v.shape, v.dtype) / max(fan_in, 1) ** 0.5
        out[path] = v
    return traverse.unflatten_dict(out)


def _vae_config_from_reference(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Reference AutoencoderKL config section -> our AutoencoderKL kwargs.

    Checkpoints are self-describing (config rides inside,
    gligen_inference.py:72-75): the first-stage hyperparameters live under
    ``params.ddconfig`` (ch, ch_mult, ...) with embed_dim/scale_factor at
    the params level.  Missing keys keep the SD-1.4 defaults."""
    p = dict(cfg.get("params", {}) or {})
    dd = dict(p.get("ddconfig", {}) or {})
    out: Dict[str, Any] = {}
    for k in ("embed_dim", "scale_factor"):
        if k in p:
            out[k] = p[k]
    for k in ("ch", "num_res_blocks", "resolution", "z_channels", "out_ch"):
        if k in dd:
            out[k] = dd[k]
    for k in ("ch_mult", "attn_resolutions"):
        if k in dd:
            out[k] = tuple(dd[k])
    return out


def build_pipeline(ckpt: str, args) -> "Any":
    import jax
    import jax.numpy as jnp

    from gligen_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from gligen_tpu.data.tokenizer import load_tokenizer
    from gligen_tpu.inference.pipeline import GenerationPipeline, GligenComponents
    from gligen_tpu.training import checkpoints as ckpt_io

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    is_random = ckpt == "random" or ckpt.startswith("random:")
    if is_random:
        unet_config: Dict[str, Any] = {}
        if "inpaint" in ckpt:
            unet_config["inpaint_mode"] = True
        if "text_image" in ckpt:
            unet_config["grounding_tokenizer"] = {"target": "text_image", "params": {}}
        for tag in ("keypoint", "hed", "canny", "depth", "normal", "sem"):
            if tag in ckpt:
                params = {"in_dim": 152} if tag == "sem" else {}
                unet_config["grounding_tokenizer"] = {"target": tag, "params": params}
                if tag != "keypoint":
                    unet_config["grounding_downsampler"] = {"target": tag, "params": params}
        comps = GligenComponents.create(
            unet_config=unet_config, dtype=dtype, rng=jax.random.PRNGKey(args.seed)
        )
        if getattr(args, "dezero", False):
            comps.params["model"] = dezero_params(comps.params["model"])
    else:
        params, config = ckpt_io.load_gligen_torch_checkpoint(
            ckpt, sd_first_conv_path=args.sd_input_conv,
            use_ema=getattr(args, "use_ema", False),
        )
        model_params = dict(config.get("model", {}).get("params", {}))
        model_params.pop("image_size", None)
        model_params.pop("use_checkpoint", None)
        # map reference dotted grounding targets through the registry aliases
        comps = GligenComponents.create(
            unet_config=model_params,
            vae_config=_vae_config_from_reference(config.get("autoencoder", {})),
            schedule_config={
                k: v
                for k, v in config.get("diffusion", {}).get("params", {}).items()
                if k in ("timesteps", "linear_start", "linear_end")
            },
            dtype=dtype,
        )
        comps.params.update(params)
    train_ckpt = getattr(args, "train_ckpt", None)
    if train_ckpt:
        # Overlay a NATIVE training run's trainable subset (fusers,
        # position net, downsampler, widened first conv) — optionally the
        # EMA shadow — onto the base params: train on TPU, serve the result.
        import flax.traverse_util as traverse

        flat = traverse.flatten_dict(comps.params["model"])
        loaded = ckpt_io.load_training_params(
            train_ckpt, use_ema=getattr(args, "use_ema", False)
        )
        for path, val in loaded.items():
            if path not in flat:
                raise ValueError(f"train_ckpt param {path} not in model tree")
            flat[path] = jnp.asarray(val)
        comps.params["model"] = traverse.unflatten_dict(flat)
    mesh = None
    if getattr(args, "data_parallel", False) and jax.device_count() > 1:
        from gligen_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()  # 1-D over every addressable chip; batch shards
    pipe = GenerationPipeline(comps, mesh=mesh)
    # A real checkpoint with the hash-fallback tokenizer would silently
    # produce garbage conditioning: demand real vocab files (or an explicit
    # opt-in) whenever real weights are loaded.
    allow_hash = is_random or getattr(args, "allow_hash_tokenizer", False)
    try:
        pipe.tokenizer = load_tokenizer(args.vocab_path, allow_fallback=allow_hash)
    except FileNotFoundError as e:
        raise SystemExit(
            f"{e}\nReal checkpoint loaded but no CLIP vocab available — "
            "tokenization would be garbage. Provide --vocab_path/$GLIGEN_TPU_ASSETS "
            "or pass --allow_hash_tokenizer to opt into the smoke fallback."
        ) from e
    return pipe


def run(meta: Dict[str, Any], args) -> List[str]:
    """One scenario end to end; returns saved file paths."""
    import jax
    import jax.numpy as jnp

    pipe = build_pipeline(meta["ckpt"], args)
    projection = None
    if args.projection_matrix and os.path.exists(args.projection_matrix):
        from gligen_tpu.data.box_dataset import _load_projection_matrix

        projection = _load_projection_matrix(args.projection_matrix)
    vision_params = None
    if args.clip_vision_ckpt and os.path.exists(args.clip_vision_ckpt):
        import torch

        from gligen_tpu.convert.torch_to_jax import convert_clip_vision

        state = torch.load(args.clip_vision_ckpt, map_location="cpu", weights_only=False)
        state = state.get("state_dict", state)
        vision_params = convert_clip_vision(state)
    features = FeatureExtractor(
        pipe, vision_params=vision_params, projection_matrix=projection,
        allow_random=meta["ckpt"].startswith("random"),
    )

    batch = args.batch_size
    raw = prepare_batch_for(meta, batch, features)
    from gligen_tpu.inference.adapters import get_adapter

    tok_target = (pipe.c.unet.grounding_tokenizer or {"target": "text"})["target"]
    modality = next(
        (m for m in ("text_image", "keypoint", "hed", "canny", "depth", "normal", "sem")
         if m in tok_target),
        "text",
    )
    adapter = get_adapter(modality)
    grounding = adapter.prepare(raw)
    grounding_extra = (
        adapter.prepare_extra(raw) if pipe.c.unet.grounding_downsampler else None
    )

    ids = pipe.tokenizer([meta["prompt"]] * batch)
    uc_ids = pipe.tokenizer([args.negative_prompt or ""] * batch)

    inpaint_image = inpaint_mask = None
    if "input_image" in meta:
        from gligen_tpu.data.inpaint_masks import draw_masks_from_boxes

        inpaint_mask = draw_masks_from_boxes(
            np.repeat(np.asarray(meta["locations"], np.float32)[None], batch, 0), 64
        )
        inpaint_image = np.repeat(load_image_pm1(meta["input_image"], 512)[None], batch, 0)

    default_steps = 250 if args.no_plms else 50
    images = pipe.generate(
        ids,
        uc_ids,
        grounding,
        steps=getattr(args, "steps", None) or default_steps,
        sampler="ddim" if args.no_plms else "plms",
        guidance_scale=args.guidance_scale,
        alpha_stages=meta.get("alpha_type"),
        grounding_extra=grounding_extra,
        inpaint_image=inpaint_image,
        inpaint_mask=inpaint_mask,
        rng=jax.random.PRNGKey(args.seed),
    )
    return save_images(np.asarray(images), os.path.join(args.folder, meta["save_folder_name"]))


def save_images(images: np.ndarray, folder: str) -> List[str]:
    """gligen_inference.py:434-446: sequential PNG numbering."""
    from PIL import Image

    os.makedirs(folder, exist_ok=True)
    start = len(os.listdir(folder))
    paths = []
    for i, img in enumerate(images):
        path = os.path.join(folder, f"{start + i}.png")
        Image.fromarray((img * 255).astype(np.uint8)).save(path)
        paths.append(path)
    return paths


# The reference's two full 17-keypoint skeletons (gligen_inference.py:588-631,
# "from id=18150 val set in coco2017k").
KEYPOINT_DEMO_SKELETONS = [
    [
        [0.7598, 0.2542], [0.7431, 0.2104], [0.8118, 0.2021], [0.0, 0.0],
        [0.9514, 0.1813], [0.7806, 0.2917], [0.0, 0.0], [0.6785, 0.5125],
        [0.0, 0.0], [0.5389, 0.6479], [0.6785, 0.6750], [0.7973, 0.7042],
        [0.0, 0.0], [0.6181, 0.7375], [0.9764, 0.8458], [0.0, 0.0], [0.0, 0.0],
    ],
    [
        [0.2681, 0.4313], [0.2514, 0.3979], [0.0, 0.0], [0.0785, 0.3854],
        [0.0, 0.0], [0.0910, 0.5583], [0.0, 0.0], [0.1243, 0.8479],
        [0.0, 0.0], [0.0, 0.0], [0.0, 0.0], [0.0, 0.0],
        [0.0, 0.0], [0.2410, 0.8146], [0.1202, 0.6146], [0.0, 0.0],
        [0.2743, 0.7188],
    ],
]


def default_meta_list(ckpt_root: str = "gligen_checkpoints") -> List[Dict[str, Any]]:
    """All 11 of the reference's demonstration scenarios
    (gligen_inference.py:467-637), in the reference's order."""
    j = lambda name: os.path.join(ckpt_root, name)
    return [
        dict(
            ckpt=j("checkpoint_generation_text.pth"),
            prompt="a teddy bear sitting next to a bird",
            phrases=["a teddy bear", "a bird"],
            locations=[[0.0, 0.09, 0.33, 0.76], [0.55, 0.11, 1.0, 0.8]],
            alpha_type=[0.3, 0.0, 0.7],
            save_folder_name="generation_box_text",
        ),
        dict(
            ckpt=j("checkpoint_inpainting_text.pth"),
            input_image="inference_images/dalle2_museum.jpg",
            prompt="a corgi and a cake",
            phrases=["corgi", "cake"],
            locations=[[0.25, 0.28, 0.42, 0.52], [0.14, 0.58, 0.58, 0.92]],
            save_folder_name="inpainting_box_text",
        ),
        dict(
            ckpt=j("checkpoint_generation_text_image.pth"),
            prompt="an alarm clock sitting on the beach",
            images=["inference_images/clock.png"],
            phrases=["alarm clock"],
            locations=[[0.0, 0.09, 0.53, 0.76]],
            alpha_type=[1.0, 0.0, 0.0],
            save_folder_name="generation_box_image",
        ),
        # Style grounding: a pseudo-phrase slot carrying a style image whose
        # text feature is masked out and image feature kept
        # (gligen_inference.py:505-516).
        dict(
            ckpt=j("checkpoint_generation_text_image.pth"),
            prompt="a brick house in the woods, anime, oil painting",
            phrases=["a brick house", "placehoder"],
            images=["inference_images/placeholder.png", "inference_images/style_golden.jpg"],
            locations=[[0.4, 0.2, 1.0, 0.8], [0.0, 1.0, 0.0, 1.0]],
            alpha_type=[1.0, 0.0, 0.0],
            text_mask=[1, 0],   # the second text feature is masked
            image_mask=[0, 1],  # the first image feature is masked
            save_folder_name="generation_box_text_style",
        ),
        # Inpainting grounded by a reference image (gligen_inference.py:519-527).
        dict(
            ckpt=j("checkpoint_inpainting_text_image.pth"),
            input_image="inference_images/beach.jpg",
            prompt="a bigben on the beach",
            images=["inference_images/bigben.jpg"],
            locations=[[0.18, 0.08, 0.62, 0.75]],
            save_folder_name="inpainting_box_image",
        ),
        dict(
            ckpt=j("checkpoint_generation_hed.pth"),
            prompt="a man is eating breakfast",
            hed_image="inference_images/hed.png",
            alpha_type=[0.9, 0.0, 0.1],
            save_folder_name="hed",
        ),
        dict(
            ckpt=j("checkpoint_generation_canny.pth"),
            prompt="A Humanoid Robot Designed for Companionship",
            canny_image="inference_images/canny.png",
            alpha_type=[0.9, 0.0, 0.1],
            save_folder_name="canny",
        ),
        dict(
            ckpt=j("checkpoint_generation_normal.pth"),
            prompt="a large tree with no leaves in front of a building",
            normal="inference_images/normal.png",
            alpha_type=[0.7, 0.0, 0.3],
            save_folder_name="normal",
        ),
        dict(
            ckpt=j("checkpoint_generation_depth.pth"),
            prompt="a Vibrant colorful Bird Sitting on Tree Branch",
            depth="inference_images/depth.png",
            alpha_type=[0.7, 0.0, 0.3],
            save_folder_name="depth",
        ),
        dict(
            ckpt=j("checkpoint_generation_sem.pth"),
            prompt="a living room filled with lots of furniture and plants",
            sem="inference_images/sem.png",
            alpha_type=[0.7, 0.0, 0.3],
            save_folder_name="sem",
        ),
        dict(
            ckpt=j("checkpoint_generation_keypoint.pth"),
            prompt="A young man and a small boy are talking",
            locations=KEYPOINT_DEMO_SKELETONS,
            alpha_type=[0.3, 0.0, 0.7],
            save_folder_name="keypoint",
        ),
    ]


def main(argv: Optional[List[str]] = None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--folder", type=str, default="generation_samples")
    parser.add_argument("--batch_size", type=int, default=5)
    parser.add_argument("--no_plms", action="store_true")
    parser.add_argument("--steps", type=int, default=None,
                        help="override sampler steps (default 50 PLMS / 250 DDIM)")
    parser.add_argument("--guidance_scale", type=float, default=7.5)
    parser.add_argument(
        "--negative_prompt", type=str,
        default="longbody, lowres, bad anatomy, bad hands, missing fingers, "
        "extra digit, fewer digits, cropped, worst quality, low quality",
    )
    parser.add_argument("--ckpt", type=str, default=None, help="single ckpt override; 'random' for smoke")
    parser.add_argument("--meta", type=str, default=None, help="json file with meta dict(s)")
    parser.add_argument("--ckpt_root", type=str, default="gligen_checkpoints")
    parser.add_argument("--sd_input_conv", type=str, default="SD_input_conv_weight_bias.pth")
    parser.add_argument("--projection_matrix", type=str, default="projection_matrix")
    parser.add_argument("--clip_vision_ckpt", type=str, default=None)
    parser.add_argument("--vocab_path", type=str, default=None)
    parser.add_argument(
        "--allow_hash_tokenizer", action="store_true",
        help="permit the hash-fallback tokenizer even with real weights (smoke only)",
    )
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--data_parallel", action="store_true",
        help="shard the batch over all addressable chips (1-D mesh; "
        "batch_size should be a multiple of the chip count)",
    )
    parser.add_argument(
        "--train_ckpt", type=str, default=None,
        help="native training checkpoint (tag dir or checkpoint_<step>) whose "
        "trainable subset overlays the base --ckpt params",
    )
    parser.add_argument(
        "--dezero", action="store_true",
        help="de-zero a random-init model's zero_module convs and fuser "
        "gates (deterministic in param path) so random-weight runs exercise "
        "every path — the fidelity gate's weight recipe",
    )
    parser.add_argument(
        "--use_ema", action="store_true",
        help="load the EMA shadow of the trainable params (torch ckpt 'ema' "
        "entry / native 'ema_params') instead of the live weights",
    )
    parser.add_argument(
        "--scenarios", type=str, default=None,
        help="comma-separated save_folder_name filter over the meta list "
        "(e.g. 'generation_box_text,hed'); default runs all",
    )
    args = parser.parse_args(argv)

    if args.meta:
        with open(args.meta) as f:
            metas = json.load(f)
        metas = metas if isinstance(metas, list) else [metas]
    else:
        metas = default_meta_list(args.ckpt_root)
    if args.ckpt:
        for m in metas:
            m["ckpt"] = args.ckpt if "random" not in args.ckpt else _tag_random(m, args.ckpt)
    if args.scenarios:
        keep = {s.strip() for s in args.scenarios.split(",") if s.strip()}
        metas = [m for m in metas if m.get("save_folder_name") in keep]

    for meta in metas:
        paths = run(meta, args)
        print(f"{meta['save_folder_name']}: wrote {len(paths)} images -> {paths[0]}")


def _tag_random(meta, base):
    # keep modality substring dispatch working in smoke mode; a meta can
    # carry several tags (e.g. inpainting_text_image -> inpaint + text_image)
    tags = [
        tag
        for tag in ("keypoint", "hed", "canny", "depth", "normal", "sem",
                    "inpaint", "text_image")
        if tag in meta.get("save_folder_name", "") or tag in meta["ckpt"]
    ]
    return ":".join([base] + tags) if tags else base


if __name__ == "__main__":
    main()
