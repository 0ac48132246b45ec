from mudiff_tpu.metrics.image_metrics import (  # noqa: F401
    mae,
    psnr,
    ssim,
    evaluate_pair_dirs,
)
