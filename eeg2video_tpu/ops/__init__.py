from .attention import (fused_attention, fused_attention_dual,
                        fused_attention_packed, mha_reference)
from .conv2d import fused_conv3x3_t
from .geglu import fused_ff_ln, fused_geglu_out
from .ring import ring_attention_packed
