from .attention import fused_attention, mha_reference
