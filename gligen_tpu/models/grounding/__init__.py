from gligen_tpu.models.grounding.text import TextPositionNet  # noqa: F401
