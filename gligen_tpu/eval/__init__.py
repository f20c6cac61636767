from gligen_tpu.eval.metrics import (  # noqa: F401
    frechet_distance,
    gaussian_stats,
    psnr,
    ssim,
)
