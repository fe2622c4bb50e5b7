from .videodiffusion import (
    VideoDiffusionTrainConfig,
    encode_posteriors,
    make_video_train_step,
    make_video_train_epoch,
    init_video_train_state,
    unet_tp_rules,
)
