"""OLMo-1, Falcon (7b-style), and DBRX causal LMs.

Reference: srt/models/{olmo.py, dbrx.py} (falcon served upstream via its
HF-compatible path). Three more llama-knob variants: olmo's non-parametric
LayerNorm, falcon's parallel block with fused MQA qkv, dbrx's fused flat
expert tensors with a clip-qkv fused attention."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.layers.linear import apply_linear
from semi_pd_tpu.models.layernorm_families import NonGatedMLPMixin
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.models.qwen2_moe import MixtralForCausalLM


def _plain_ln(x, p, eps):
    """LayerNorm with no learnable params (OLMo-1: elementwise_affine=False).
    ``p`` is an unused placeholder leaf."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class OlmoForCausalLM(LlamaForCausalLM):
    """OLMo-1 (reference srt/models/olmo.py): llama block with non-parametric
    LayerNorm and optional qkv clipping."""

    def __init__(self, config: ModelConfig):
        config.rms_norm_eps = 1e-5  # F.layer_norm default in HF olmo
        super().__init__(config)
        self.norm_fn = _plain_ln
        self.qkv_clip = getattr(config.hf_config, "clip_qkv", None)

    def hf_weight_plan(self) -> Dict[str, Any]:
        plan = super().hf_weight_plan()
        # norms carry no weights; drop their (never-matching) entries
        for k in list(plan):
            if "layernorm" in k or k.startswith("model.norm"):
                del plan[k]
        return plan


class FalconForCausalLM(NonGatedMLPMixin, LlamaForCausalLM):
    """Falcon 7b-style (HF FalconForCausalLM with multi_query=True,
    parallel_attn=True, new_decoder_architecture=False): single LN feeding
    parallel attention + MLP, fused MQA qkv, bias-free linears, gelu MLP."""

    MLP_FC1 = "mlp.dense_h_to_4h"
    MLP_FC2 = "mlp.dense_4h_to_h"
    MLP_BIAS = False
    mlp_act = staticmethod(lambda x: jax.nn.gelu(x, approximate=False))

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        if getattr(hf, "new_decoder_architecture", False):
            raise NotImplementedError(
                "falcon new_decoder_architecture (40b/180b) not supported yet"
            )
        if getattr(hf, "alibi", False):
            raise NotImplementedError("falcon alibi positions not supported")
        config.intermediate_size = 4 * config.hidden_size
        super().__init__(config)
        self.norm_bias = True
        from semi_pd_tpu.ops.elementwise import layer_norm

        self.norm_fn = layer_norm
        self.parallel_block = bool(getattr(hf, "parallel_attn", True))
        self.MLP_BIAS = bool(getattr(hf, "bias", False))

    def hf_weight_plan(self) -> Dict[str, Any]:
        qs, ks = self.q_size, self.kv_size
        plan = {
            "transformer.word_embeddings.weight": ("embed.w", None, "none"),
            "transformer.ln_f.weight": ("final_norm.w", None, "none"),
            "transformer.ln_f.bias": ("final_norm.b", None, "none"),
            "transformer.h.{L}.input_layernorm.weight": ("layers.input_norm.w", None, "none"),
            "transformer.h.{L}.input_layernorm.bias": ("layers.input_norm.b", None, "none"),
            "transformer.h.{L}.self_attention.query_key_value.weight": ("layers.qkv_proj.w", None, "t"),
            "transformer.h.{L}.self_attention.dense.weight": ("layers.o_proj.w", None, "t"),
            f"transformer.h.{{L}}.{self.MLP_FC1}.weight": ("layers.fc1.w", None, "t"),
            f"transformer.h.{{L}}.{self.MLP_FC2}.weight": ("layers.fc2.w", None, "t"),
        }
        if not self.config.tie_word_embeddings:
            plan["lm_head.weight"] = ("lm_head.w", None, "t")
        if not self.parallel_block:
            plan.update({
                "transformer.h.{L}.post_attention_layernorm.weight": ("layers.post_norm.w", None, "none"),
                "transformer.h.{L}.post_attention_layernorm.bias": ("layers.post_norm.b", None, "none"),
            })
        return plan


class DbrxForCausalLM(MixtralForCausalLM):
    """DbrxForCausalLM (reference srt/models/dbrx.py): bias-free LayerNorm,
    fused clip-qkv attention, MoE with flat fused expert tensors
    (experts.mlp.w1/v1/w2 of shape [E*f, d])."""

    NORM_TOPK_FROM_CONFIG = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        from semi_pd_tpu.ops.elementwise import layer_norm

        self.norm_fn = layer_norm  # weight-only LN (bias-free)
        self.qkv_clip = getattr(
            getattr(config.hf_config, "attn_config", None), "clip_qkv", None
        )

    def hf_weight_plan(self) -> Dict[str, Any]:
        F = self.config.moe_intermediate_size
        plan = {
            "transformer.wte.weight": ("embed.w", None, "none"),
            "transformer.norm_f.weight": ("final_norm", None, "none"),
            "lm_head.weight": ("lm_head.w", None, "t"),
            "transformer.blocks.{L}.norm_attn_norm.norm_1.weight": ("layers.input_norm", None, "none"),
            "transformer.blocks.{L}.norm_attn_norm.norm_2.weight": ("layers.post_norm", None, "none"),
            "transformer.blocks.{L}.norm_attn_norm.attn.Wqkv.weight": ("layers.qkv_proj.w", None, "t"),
            "transformer.blocks.{L}.norm_attn_norm.attn.out_proj.weight": ("layers.o_proj.w", None, "t"),
            "transformer.blocks.{L}.ffn.router.layer.weight": ("layers.router.w", None, "t"),
            "transformer.blocks.{L}.ffn.experts.mlp.w1": ("layers.experts", None, "dbrx_w1"),
            "transformer.blocks.{L}.ffn.experts.mlp.v1": ("layers.experts", None, "dbrx_v1"),
            "transformer.blocks.{L}.ffn.experts.mlp.w2": ("layers.experts", None, "dbrx_w2"),
        }
        return plan

    def postprocess_weight(self, tag: str, arr: np.ndarray):
        """Flat fused expert tensors [E*f, d] -> stacked slices of the
        [E, d, 2f] gate_up / [E, f, d] down buffers."""
        c = self.config
        E, F = c.num_experts, c.moe_intermediate_size
        a = arr.reshape(E, F, c.hidden_size)
        if tag == "dbrx_w1":  # gate: [E, f, d] -> [E, d, f] into gate half
            return {"gate_up": (np.ascontiguousarray(a.transpose(0, 2, 1)), 0, F)}
        if tag == "dbrx_v1":  # up half
            return {"gate_up": (np.ascontiguousarray(a.transpose(0, 2, 1)), F, F)}
        if tag == "dbrx_w2":  # down: stored [E, f, d] used directly
            return {"down": a}
        raise KeyError(tag)
