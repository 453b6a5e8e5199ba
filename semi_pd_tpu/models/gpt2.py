"""GPT-2 and GPT-BigCode (starcoder v1) causal LMs.

Reference: srt/models/gpt2.py and gpt_bigcode.py — pre-LN transformer with
learned absolute positions (no rope), fused c_attn, non-gated gelu MLP, tied
lm_head. GPT-2 checkpoints store linears as Conv1D ([din, dout] — already in
x@w layout, loaded with transform "none"); bigcode uses ordinary [dout, din]
Linear tensors ("t") and multi-query attention (1 KV head)."""

from __future__ import annotations

from typing import Any, Dict

import jax

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.models.layernorm_families import NonGatedMLPMixin
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.ops.elementwise import layer_norm


class GPT2LMHeadModel(NonGatedMLPMixin, LlamaForCausalLM):
    # save_pretrained dumps carry the "transformer." prefix; the original
    # gpt2 release used bare names — the plan accepts both
    PFX = "transformer."
    LINEAR_TF = "none"  # Conv1D storage

    def __init__(self, config: ModelConfig):
        config.attention_bias = True
        config.o_proj_bias = True
        config.tie_word_embeddings = True
        super().__init__(config)
        self.norm_bias = True
        self.norm_fn = layer_norm
        self.pos_embed = True
        self.no_rope = True
        self.mlp_act = lambda x: jax.nn.gelu(x, approximate=True)

    def hf_weight_plan(self) -> Dict[str, Any]:
        t = self.LINEAR_TF
        p = self.PFX
        plan = {
            f"{p}wte.weight": ("embed.w", None, "none"),
            f"{p}wpe.weight": ("pos_embed.w", None, "none"),
            f"{p}ln_f.weight": ("final_norm.w", None, "none"),
            f"{p}ln_f.bias": ("final_norm.b", None, "none"),
            f"{p}h.{{L}}.ln_1.weight": ("layers.input_norm.w", None, "none"),
            f"{p}h.{{L}}.ln_1.bias": ("layers.input_norm.b", None, "none"),
            f"{p}h.{{L}}.ln_2.weight": ("layers.post_norm.w", None, "none"),
            f"{p}h.{{L}}.ln_2.bias": ("layers.post_norm.b", None, "none"),
            f"{p}h.{{L}}.attn.c_attn.weight": ("layers.qkv_proj.w", None, t),
            f"{p}h.{{L}}.attn.c_attn.bias": ("layers.qkv_proj.b", None, "none"),
            f"{p}h.{{L}}.attn.c_proj.weight": ("layers.o_proj.w", None, t),
            f"{p}h.{{L}}.attn.c_proj.bias": ("layers.o_proj.b", None, "none"),
            f"{p}h.{{L}}.mlp.c_fc.weight": ("layers.fc1.w", None, t),
            f"{p}h.{{L}}.mlp.c_fc.bias": ("layers.fc1.b", None, "none"),
            f"{p}h.{{L}}.mlp.c_proj.weight": ("layers.fc2.w", None, t),
            f"{p}h.{{L}}.mlp.c_proj.bias": ("layers.fc2.b", None, "none"),
        }
        if p:  # also accept un-prefixed dumps
            plan.update({k[len(p):]: v for k, v in list(plan.items())})
        return plan


class GPTBigCodeForCausalLM(GPT2LMHeadModel):
    """Starcoder v1 (reference srt/models/gpt_bigcode.py): gpt2 block with
    multi-query attention and torch Linear weight layout."""

    PFX = "transformer."
    LINEAR_TF = "t"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        act = getattr(config.hf_config, "activation_function", "gelu_pytorch_tanh")
        if act not in ("gelu_new", "gelu_pytorch_tanh"):
            self.mlp_act = lambda x: jax.nn.gelu(x, approximate=False)
