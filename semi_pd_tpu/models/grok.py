"""Grok-1 (reference srt/models/grok.py): 314B MoE with sandwich norms,
tanh-softcapped attention AND router logits, gelu-gated experts, and scalar
multipliers on embeddings and output logits.

Structure per layer (reference Grok1DecoderLayer:342-371):
    h += post_attn_norm(attn(pre_attn_norm(h)))
    h += post_moe_norm(moe(pre_moe_norm(h)))
Checkpoint naming: model.layers.{L}.{pre_attn_norm,post_attn_norm,
pre_moe_norm,post_moe_norm}, self_attn.*_proj, block_sparse_moe.gate +
experts.{E}.{w1 gate, w3 up, w2 down}; top-2 routing WITHOUT renormalize
(reference :127) over tanh-capped router logits (:104-108)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.layers.linear import apply_linear
from semi_pd_tpu.models.qwen2_moe import MixtralForCausalLM
from semi_pd_tpu.ops.elementwise import gelu_and_mul
from semi_pd_tpu.ops.moe import moe_ffn, route_topk


class Grok1ForCausalLM(MixtralForCausalLM):
    HF_EXPERT_KEYS = (
        ("block_sparse_moe.experts.{E}.w1.weight", "gate_up", 0, "t"),
        ("block_sparse_moe.experts.{E}.w3.weight", "gate_up", 1, "t"),
        ("block_sparse_moe.experts.{E}.w2.weight", "down", None, "t"),
    )
    HF_ROUTER_KEY = "block_sparse_moe.gate.weight"
    NORM_TOPK_FROM_CONFIG = True  # grok does NOT renormalize top-k weights

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        g = lambda k, d: getattr(hf, k, d) if hf else d
        config.norm_topk_prob = False
        config.attn_logit_softcap = float(g("attn_logit_softcapping", 30.0))
        super().__init__(config)
        self.router_softcap = float(g("router_logit_softcapping", 30.0))
        self.embed_scale = float(g("embedding_multiplier_scale", 1.0))
        oms = float(g("output_multiplier_scale", 1.0))
        self.logits_div = 1.0 / oms if oms else None

    # ------------------------------------------------------ sandwich norms
    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        L, H = self.config.num_hidden_layers, self.config.hidden_size
        specs["layers"]["post_attn_sandwich"] = self._norm_spec(L, H)
        specs["layers"]["post_moe_sandwich"] = self._norm_spec(L, H)
        return specs

    def param_partition_specs(self) -> Dict[str, Any]:
        specs = super().param_partition_specs()
        specs["layers"]["post_attn_sandwich"] = self._norm_pspec()
        specs["layers"]["post_moe_sandwich"] = self._norm_pspec()
        return specs

    def hf_weight_plan(self) -> Dict[str, Any]:
        plan = super().hf_weight_plan()
        # llama's input/post norms carry grok's pre_attn/pre_moe norms
        plan.pop("model.layers.{L}.input_layernorm.weight", None)
        plan.pop("model.layers.{L}.post_attention_layernorm.weight", None)
        plan.update({
            "model.layers.{L}.pre_attn_norm.weight": ("layers.input_norm", None, "none"),
            "model.layers.{L}.post_attn_norm.weight": ("layers.post_attn_sandwich", None, "none"),
            "model.layers.{L}.pre_moe_norm.weight": ("layers.post_norm", None, "none"),
            "model.layers.{L}.post_moe_norm.weight": ("layers.post_moe_sandwich", None, "none"),
        })
        return plan

    def _layer(self, lp, layer_idx, h, kv_cache, fb):
        attn_in = self._norm(h, lp["input_norm"])
        attn_out, kv_cache = self._attn(lp, attn_in, layer_idx, fb, kv_cache)
        h = h + self._norm(attn_out, lp["post_attn_sandwich"])
        moe = self._mlp_lora(lp, self._norm(h, lp["post_norm"]), fb)
        return h + self._norm(moe, lp["post_moe_sandwich"]), kv_cache

    # --------------------------------------------------------------- MoE
    def _mlp(self, lp, x):
        c = self.config
        router_logits = apply_linear(lp["router"], x).astype(jnp.float32)
        cap = self.router_softcap
        if cap:
            router_logits = cap * jnp.tanh(router_logits / cap)
        weights, idx = route_topk(
            router_logits, c.num_experts_per_tok, norm_topk_prob=False
        )
        if getattr(self, "use_ep", False):
            from semi_pd_tpu.ops.moe import moe_ffn_ep

            return moe_ffn_ep(
                x, lp["experts"]["gate_up"], lp["experts"]["down"], weights,
                idx, self.mesh,
                capacity_factor=getattr(self, "ep_capacity_factor", 2.0),
                act=gelu_and_mul,
            )
        return moe_ffn(
            x, lp["experts"]["gate_up"], lp["experts"]["down"], weights, idx,
            act=gelu_and_mul,
        )
