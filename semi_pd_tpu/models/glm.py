"""GLM family: ChatGLM (2/3, GLM-4 ggml-era naming) and HF-format Glm/Glm4.

Reference: srt/models/chatglm.py (ChatGLMModel: fused query_key_value with
qkv bias, MQA via multi_query_group_num, swiglu dense_h_to_4h, interleaved
rope over HALF of head_dim — get_rope(is_neox_style=False, rotary_dim=
head_dim//2, base=10000*rope_ratio)). The HF-converted Glm/Glm4 checkpoints
(transformers modeling_glm) are the same computation under llama-style
naming with a fused gate_up_proj; Glm4 adds sandwich norms on the attention
and MLP branch outputs. Empirically verified: HF Glm's
interleaved-cos + rotate_half rope equals the GPT-J interleaved style of
ops/rope.py exactly (see tests/test_glm.py)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.ops.rope import RotaryEmbedding


class GlmForCausalLM(LlamaForCausalLM):
    """HF-format GLM (glm-4-9b-hf etc., transformers modeling_glm): llama
    layout with fused mlp.gate_up_proj and partial interleaved rope."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        rotary_dim = int(self.head_dim * config.partial_rotary_factor)
        self.rope = RotaryEmbedding(
            head_dim=self.head_dim,
            rotary_dim=rotary_dim,
            max_position=config.context_length,
            theta=config.rope_theta,
            rope_scaling=config.rope_scaling,
            dtype=self.dtype,
            is_neox_style=False,
        )

    def _mlp_weight_plan(self) -> Dict[str, Any]:
        return {
            "model.layers.{L}.mlp.gate_up_proj.weight": ("layers.gate_up.w", None, "t"),
            "model.layers.{L}.mlp.down_proj.weight": ("layers.down.w", None, "t"),
        }


class Glm4ForCausalLM(GlmForCausalLM):
    """Glm4 (transformers modeling_glm4): Glm plus sandwich norms applied to
    the attention/MLP branch OUTPUTS before each residual add."""

    def param_specs(self):
        specs = super().param_specs()
        L, H = self.config.num_hidden_layers, self.config.hidden_size
        specs["layers"]["post_attn_sandwich"] = self._norm_spec(L, H)
        specs["layers"]["post_mlp_sandwich"] = self._norm_spec(L, H)
        return specs

    def param_partition_specs(self):
        specs = super().param_partition_specs()
        specs["layers"]["post_attn_sandwich"] = self._norm_pspec()
        specs["layers"]["post_mlp_sandwich"] = self._norm_pspec()
        return specs

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        plan = super().hf_weight_plan()
        plan.update(self._norm_plan(
            "model.layers.{L}.post_self_attn_layernorm", "layers.post_attn_sandwich"))
        plan.update(self._norm_plan(
            "model.layers.{L}.post_mlp_layernorm", "layers.post_mlp_sandwich"))
        return plan

    def _layer(self, lp, layer_idx, h, kv_cache, fb):
        attn_in = self._norm(h, lp["input_norm"])
        attn_out, kv_cache = self._attn(lp, attn_in, layer_idx, fb, kv_cache)
        h = h + self._norm(attn_out, lp["post_attn_sandwich"])
        mlp = self._mlp_lora(lp, self._norm(h, lp["post_norm"]), fb)
        return h + self._norm(mlp, lp["post_mlp_sandwich"]), kv_cache


class ChatGLMForCausalLM(GlmForCausalLM):
    """ChatGLM 2/3 & glm-4 ggml-era checkpoints (reference chatglm.py):
    transformer.encoder naming, fused biased query_key_value, fused swiglu
    dense_h_to_4h (gate-first — same layout as our gate_up buffer)."""

    def __init__(self, config: ModelConfig):
        config.attention_bias = bool(
            getattr(config.hf_config, "add_qkv_bias", True)
            or getattr(config.hf_config, "add_bias_linear", False)
        ) if config.hf_config else True
        super().__init__(config)

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        base = "transformer.encoder.layers.{L}."
        plan = {
            "transformer.embedding.word_embeddings.weight": ("embed.w", None, "none"),
            "transformer.encoder.final_layernorm.weight": ("final_norm", None, "none"),
            base + "input_layernorm.weight": ("layers.input_norm", None, "none"),
            base + "self_attention.query_key_value.weight": ("layers.qkv_proj.w", None, "t"),
            base + "self_attention.dense.weight": ("layers.o_proj.w", None, "t"),
            base + "post_attention_layernorm.weight": ("layers.post_norm", None, "none"),
            base + "mlp.dense_h_to_4h.weight": ("layers.gate_up.w", None, "t"),
            base + "mlp.dense_4h_to_h.weight": ("layers.down.w", None, "t"),
        }
        if self.config.attention_bias:
            plan[base + "self_attention.query_key_value.bias"] = (
                "layers.qkv_proj.b", None, "none")
        if not self.config.tie_word_embeddings:
            plan["transformer.output_layer.weight"] = ("lm_head.w", None, "t")
        return plan
