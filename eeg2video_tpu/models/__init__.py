from .encoders import (
    ShallowNet,
    DeepNet,
    EEGNet,
    TSConv,
    Conformer,
    GLFNet,
    MLPNet,
    GLFNetMLP,
    make_encoder,
)
