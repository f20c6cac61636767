# Importing these modules populates the grounding registries.
from gligen_tpu.models.grounding.text import TextPositionNet  # noqa: F401
from gligen_tpu.models.grounding.text_image import TextImagePositionNet  # noqa: F401
from gligen_tpu.models.grounding.keypoint import KeypointPositionNet  # noqa: F401
from gligen_tpu.models.grounding.spatial import (  # noqa: F401
    CannyPositionNet,
    DepthPositionNet,
    HedPositionNet,
    NormalPositionNet,
    SemPositionNet,
)
from gligen_tpu.models.grounding import downsamplers  # noqa: F401
from gligen_tpu.models.grounding.convnext import ConvNeXt, convnext_tiny  # noqa: F401
