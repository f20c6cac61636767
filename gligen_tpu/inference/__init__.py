from gligen_tpu.inference.pipeline import GligenComponents, GenerationPipeline  # noqa: F401
from gligen_tpu.inference import adapters  # noqa: F401
