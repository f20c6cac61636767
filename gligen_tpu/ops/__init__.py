from gligen_tpu.ops.basic import (  # noqa: F401
    fourier_embed,
    timestep_embedding,
    group_norm,
)
