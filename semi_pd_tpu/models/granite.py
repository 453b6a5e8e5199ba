"""IBM Granite causal LM.

Reference: srt/models/granite.py — llama with four scalar multipliers from
the HF config: embedding_multiplier (after embed), attention_multiplier
(replaces 1/sqrt(head_dim)), residual_multiplier (on both residual adds),
logits_scaling (divides final logits)."""

from __future__ import annotations

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.models.llama import LlamaForCausalLM


class GraniteForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        g = lambda k, d: getattr(hf, k, d) if hf is not None else d
        self.embed_scale = g("embedding_multiplier", 1.0)
        self.scale = g("attention_multiplier", self.head_dim ** -0.5)
        self.residual_mult = g("residual_multiplier", 1.0)
        self.logits_div = g("logits_scaling", 1.0)
