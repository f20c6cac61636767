# Importing these modules populates the component registries.
from gligen_tpu.models import grounding  # noqa: F401
from gligen_tpu.models.unet import UNetModel  # noqa: F401
