from .metrics import (
    ssim,
    ssim_score_only,
    mse_score_only,
    psnr_score_only,
    hue_score_only,
    n_way_top_k_acc,
)
