"""gligen_tpu — TPU-native grounded text-to-image framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of GLIGEN
(Open-Set Grounded Text-to-Image Generation, CVPR 2023): a frozen
Stable-Diffusion-1.4 latent diffusion model extended with trainable gated
self-attention layers that inject grounding tokens (boxes+phrases,
keypoints, reference images, edge/depth/normal/semantic maps) into every
transformer block of the UNet.

Design tenets (TPU-first, not a port):
  * NHWC everywhere; convs/matmuls land on the MXU, bf16 compute /
    fp32 params and norms.
  * The whole denoise loop (PLMS/DDIM, CFG, alpha scheduling, inpaint
    blend, first-conv SD/GLIGEN switch) is a single jitted ``lax.scan``.
  * Parallelism via ``jax.sharding.Mesh`` + NamedSharding: batch-data
    parallel training & serving; collectives are XLA psum over ICI.
  * Grounding modalities are data, not control flow: one canonical padded
    input schema with presence masks.
"""

__version__ = "0.1.0"

from gligen_tpu.utils.registry import Registry, instantiate  # noqa: F401
from gligen_tpu import models  # noqa: F401  (populates registries)
