from .attention import fused_attention, fused_attention_packed, mha_reference
