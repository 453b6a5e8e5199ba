"""Sequence-classification / reward models.

Reference: srt/models/llama_classification.py, qwen2_rm.py, gemma2_reward.py
— a causal trunk with the lm_head replaced by a score head, served through
the pooling path (layers/pooler.py LAST): the engine's /encode and /classify
flows call forward_embedding, which here returns raw scores instead of a
normalized embedding."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.layers.linear import apply_linear
from semi_pd_tpu.models.gemma2 import Gemma2ForCausalLM
from semi_pd_tpu.models.llama import LlamaForCausalLM


class _ScoreHeadMixin:
    """Replaces lm_head with a linear score head [H, num_labels]."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.num_labels = getattr(config.hf_config, "num_labels", None) or 1

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs.pop("lm_head", None)
        H = self.config.hidden_size
        specs["score"] = {
            "w": jax.ShapeDtypeStruct((H, self.num_labels), self.dtype)
        }
        return specs

    def param_partition_specs(self) -> Dict[str, Any]:
        specs = super().param_partition_specs()
        specs.pop("lm_head", None)
        specs["score"] = {"w": P()}
        return specs

    def hf_weight_plan(self) -> Dict[str, Any]:
        plan = super().hf_weight_plan()
        plan.pop("lm_head.weight", None)
        plan["score.weight"] = ("score.w", None, "t")
        return plan

    def forward_embedding(self, params, fb, kv):
        """Last-token pooled classification scores [B, num_labels]."""
        c = self.config
        (kv_cache,) = kv
        h = jnp.take(params["embed"]["w"], fb.input_ids, axis=0)
        if self.embed_scale is not None:
            h = h * jnp.asarray(self.embed_scale, h.dtype)
        for l in range(c.num_hidden_layers):
            lp = jax.tree.map(lambda x: x[l], params["layers"])
            h, kv_cache = self._any_layer(lp, l, h, kv_cache, fb)
        h = self._final_norm(h, params)
        pooled = h[fb.logits_idx]
        return apply_linear(params["score"], pooled).astype(jnp.float32), (kv_cache,)

    # trunk hooks so the mixin works over both llama and gemma2 layers
    def _any_layer(self, lp, l, h, kv_cache, fb):
        return self._layer(lp, l, h, kv_cache, fb)

    def _final_norm(self, h, params):
        from semi_pd_tpu.ops.elementwise import rms_norm

        return self.norm_fn(h, params["final_norm"], self.config.rms_norm_eps)


class LlamaForSequenceClassification(_ScoreHeadMixin, LlamaForCausalLM):
    pass


class Gemma2ForSequenceClassification(_ScoreHeadMixin, Gemma2ForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.embed_scale_g2 = True

    def _any_layer(self, lp, l, h, kv_cache, fb):
        return self._g2_layer(lp, l, h, kv_cache, fb)

    def _final_norm(self, h, params):
        from semi_pd_tpu.models.gemma2 import _gemma_rms

        return _gemma_rms(h, params["final_norm"], self.config.rms_norm_eps)

    def forward_embedding(self, params, fb, kv):
        import math

        self.embed_scale = math.sqrt(self.config.hidden_size)
        return super().forward_embedding(params, fb, kv)


class Qwen2ForRewardModel(LlamaForCausalLM):
    """Qwen2 reward model (reference srt/models/qwen2_rm.py): a two-layer
    ReLU MLP value head ``score = Linear(H,H) -> ReLU -> Linear(H,1)`` on the
    last-token hidden state."""

    def __init__(self, config: ModelConfig):
        config.attention_bias = True
        config.tie_word_embeddings = True  # no lm_head in the checkpoint
        super().__init__(config)

    def param_specs(self) -> Dict[str, Any]:
        specs = super().param_specs()
        specs.pop("lm_head", None)
        H, d = self.config.hidden_size, self.dtype
        specs["score"] = {
            "fc1": {"w": jax.ShapeDtypeStruct((H, H), d),
                    "b": jax.ShapeDtypeStruct((H,), d)},
            "fc2": {"w": jax.ShapeDtypeStruct((H, 1), d),
                    "b": jax.ShapeDtypeStruct((1,), d)},
        }
        return specs

    def param_partition_specs(self) -> Dict[str, Any]:
        specs = super().param_partition_specs()
        specs.pop("lm_head", None)
        specs["score"] = {
            "fc1": {"w": P(), "b": P()},
            "fc2": {"w": P(), "b": P()},
        }
        return specs

    def hf_weight_plan(self) -> Dict[str, Any]:
        plan = super().hf_weight_plan()
        plan.pop("lm_head.weight", None)
        plan.update({
            "score.0.weight": ("score.fc1.w", None, "t"),
            "score.0.bias": ("score.fc1.b", None, "none"),
            "score.2.weight": ("score.fc2.w", None, "t"),
            "score.2.bias": ("score.fc2.b", None, "none"),
        })
        return plan

    def forward_embedding(self, params, fb, kv):
        c = self.config
        (kv_cache,) = kv
        h = jnp.take(params["embed"]["w"], fb.input_ids, axis=0)
        for l in range(c.num_hidden_layers):
            lp = jax.tree.map(lambda x: x[l], params["layers"])
            h, kv_cache = self._layer(lp, l, h, kv_cache, fb)
        from semi_pd_tpu.ops.elementwise import rms_norm

        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        pooled = h[fb.logits_idx]
        x = jax.nn.relu(apply_linear(params["score"]["fc1"], pooled))
        return apply_linear(params["score"]["fc2"], x).astype(jnp.float32), (kv_cache,)
