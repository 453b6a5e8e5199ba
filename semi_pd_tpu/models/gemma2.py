"""Gemma-2 (and Gemma-1) causal LMs.

Reference: srt/models/gemma2.py — differences from llama: embedding scaled by
sqrt(hidden), GeGLU MLP, sandwich norms (post-attention and post-feedforward
norms applied to the block *output* before the residual add), query
pre-attention scalar, attention + final logit softcaps, alternating
sliding-window/full attention layers, tied embeddings, rmsnorm with (1+w)
weight convention.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.layers.attention import paged_attention
from semi_pd_tpu.layers.linear import apply_linear
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.ops.elementwise import gelu_and_mul
from semi_pd_tpu.runtime.forward_batch import ForwardArrays


def _gemma_rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


class Gemma2ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        config.tie_word_embeddings = True
        super().__init__(config)
        hf = config.hf_config
        g = lambda k, d=None: getattr(hf, k, d) if hf is not None else d
        qpas = g("query_pre_attn_scalar") or self.head_dim
        self.scale = qpas ** -0.5
        config.attn_logit_softcap = g("attn_logit_softcapping", 50.0)
        config.logit_softcap = g("final_logit_softcapping", 30.0)
        self._sliding_window = g("sliding_window", 4096)
        # gemma2: even layers sliding, odd layers full (HF layer_types if set)
        lt = g("layer_types")
        if lt:
            self.layer_sliding = [t == "sliding_attention" for t in lt]
        else:
            self.layer_sliding = [
                i % 2 == 0 for i in range(config.num_hidden_layers)
            ]
        self.act = gelu_and_mul
        self.scan_layers = False  # per-layer sliding config is heterogeneous

    def _mlp_specs(self) -> Dict[str, Any]:
        specs = super()._mlp_specs()
        c, d = self.config, self.dtype
        L, H = c.num_hidden_layers, c.hidden_size
        specs["pre_ffw_norm"] = jax.ShapeDtypeStruct((L, H), d)
        specs["post_ffw_norm"] = jax.ShapeDtypeStruct((L, H), d)
        specs["post_attn_norm"] = jax.ShapeDtypeStruct((L, H), d)
        return specs

    def _mlp_pspecs(self) -> Dict[str, Any]:
        specs = super()._mlp_pspecs()
        specs["pre_ffw_norm"] = P()
        specs["post_ffw_norm"] = P()
        specs["post_attn_norm"] = P()
        return specs

    def _mlp_weight_plan(self) -> Dict[str, Any]:
        plan = super()._mlp_weight_plan()
        plan.update({
            "model.layers.{L}.pre_feedforward_layernorm.weight": ("layers.pre_ffw_norm", None, "none"),
            "model.layers.{L}.post_feedforward_layernorm.weight": ("layers.post_ffw_norm", None, "none"),
            "model.layers.{L}.post_attention_layernorm.weight": ("layers.post_attn_norm", None, "none"),
        })
        return plan

    def hf_weight_plan(self):
        plan = super().hf_weight_plan()
        # gemma2's "post_attention_layernorm" is the sandwich norm; the
        # llama-style post_norm slot is unused (we overwrite the mapping).
        plan.pop("model.layers.{L}.post_attention_layernorm.weight", None)
        plan.update(self._mlp_weight_plan())
        return plan

    def forward(self, params, fb: ForwardArrays, kv, return_hidden: bool = False,
                all_logits: bool = False):
        c = self.config
        (kv_cache,) = kv
        h = jnp.take(params["embed"]["w"], fb.input_ids, axis=0)
        h = h * jnp.asarray(math.sqrt(c.hidden_size), h.dtype)
        for l in range(c.num_hidden_layers):
            lp = jax.tree.map(lambda x: x[l], params["layers"])
            h, kv_cache = self._g2_layer(lp, l, h, kv_cache, fb)
        h = _gemma_rms(h, params["final_norm"], c.rms_norm_eps)
        last_h = h if all_logits else h[fb.logits_idx]
        from semi_pd_tpu.layers.linear import lm_head_logits

        logits = lm_head_logits(last_h, {"w": params["embed"]["w"].T}, c.logit_softcap)
        if return_hidden:
            return logits, (kv_cache,), last_h
        return logits, (kv_cache,)

    def _g2_layer(self, lp, l, h, kv_cache, fb: ForwardArrays):
        c = self.config
        T = h.shape[0]
        x = _gemma_rms(h, lp["input_norm"], c.rms_norm_eps)
        qkv = apply_linear(lp["qkv_proj"], x)
        q, k, v = jnp.split(qkv, [self.q_size, self.q_size + self.kv_size], axis=-1)
        q = q.reshape(T, self.num_heads, self.head_dim)
        k = k.reshape(T, self.num_kv_heads, self.head_dim)
        v = v.reshape(T, self.num_kv_heads, self.head_dim)
        q, k = self.rope(fb.q_pos, q, k)
        sliding = self._sliding_window if self.layer_sliding[l] else None
        attn, kv_cache = paged_attention(
            q, k, v, kv_cache, l, fb, page_size=self.page_size,
            scale=self.scale, logit_cap=c.attn_logit_softcap,
            sliding_window=sliding,
        )
        attn = apply_linear(lp["o_proj"], attn.reshape(T, self.q_size))
        h = h + _gemma_rms(attn, lp["post_attn_norm"], c.rms_norm_eps)

        y = _gemma_rms(h, lp["pre_ffw_norm"], c.rms_norm_eps)
        mlp = apply_linear(lp["down"], gelu_and_mul(apply_linear(lp["gate_up"], y)))
        return h + _gemma_rms(mlp, lp["post_ffw_norm"], c.rms_norm_eps), kv_cache


class GemmaForCausalLM(Gemma2ForCausalLM):
    """Gemma-1 (reference srt/models/gemma.py): llama block structure with the
    gemma conventions — (1+w) rmsnorm, sqrt(hidden) embedding scale, GeGLU,
    tied embeddings — but none of gemma-2's sandwich norms, softcaps, or
    alternating sliding windows."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        config.attn_logit_softcap = None
        config.logit_softcap = None
        self._sliding_window = None
        self.layer_sliding = [False] * config.num_hidden_layers
        self.norm_fn = _gemma_rms
        self.embed_scale = math.sqrt(config.hidden_size)
        self.scan_layers = True  # homogeneous layers again

    # gemma-1 uses the plain llama layer (with the hooks set above), not the
    # sandwich-norm gemma-2 block
    def _g2_layer(self, lp, l, h, kv_cache, fb):
        return LlamaForCausalLM._layer(self, lp, l, h, kv_cache, fb)

    def _mlp_specs(self):
        return LlamaForCausalLM._mlp_specs(self)

    def _mlp_pspecs(self):
        return LlamaForCausalLM._mlp_pspecs(self)

    def _mlp_weight_plan(self):
        return LlamaForCausalLM._mlp_weight_plan(self)

    def hf_weight_plan(self):
        # undo the gemma-2 remap: post_attention_layernorm is the ordinary
        # pre-MLP norm here
        plan = LlamaForCausalLM.hf_weight_plan(self)
        return plan
