from .torch_params import (
    conv_kernel_from_torch,
    dense_from_torch,
    bn_from_torch,
    encoder_params_from_torch,
)
