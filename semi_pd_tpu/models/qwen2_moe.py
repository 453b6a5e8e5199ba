"""Sparse-MoE causal LMs: Mixtral and Qwen2-MoE.

Reference: python/sglang/srt/models/mixtral.py and qwen2_moe.py (attention
identical to llama/qwen2; MLP replaced by a routed expert block; qwen2_moe
adds a dense shared expert gated by a sigmoid). Built as Llama subclasses
overriding only the MLP hooks; the expert GEMMs go through
``jax.lax.ragged_dot`` (ops/moe.py) instead of the reference's fused Triton
kernel (layers/moe/fused_moe_triton/fused_moe.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.layers.linear import apply_linear
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.ops.elementwise import silu_and_mul
from semi_pd_tpu.ops.moe import moe_ffn, route_topk


class MixtralForCausalLM(LlamaForCausalLM):
    """MixtralForCausalLM (reference srt/models/mixtral.py)."""

    HF_EXPERT_KEYS = (
        # (hf suffix template, dest leaf, slice into 2f / None, transform)
        ("block_sparse_moe.experts.{E}.w1.weight", "gate_up", 0, "t"),
        ("block_sparse_moe.experts.{E}.w3.weight", "gate_up", 1, "t"),
        ("block_sparse_moe.experts.{E}.w2.weight", "down", None, "t"),
    )
    HF_ROUTER_KEY = "block_sparse_moe.gate.weight"
    # HF Mixtral always renormalizes top-k routing weights (its config has no
    # norm_topk_prob flag); qwen2-moe reads it from config.
    NORM_TOPK_FROM_CONFIG = False

    def _mlp_specs(self) -> Dict[str, Any]:
        c, d = self.config, self.dtype
        L, H = c.num_hidden_layers, c.hidden_size
        E, F = c.num_experts, c.moe_intermediate_size
        specs = {
            "router": {"w": jax.ShapeDtypeStruct((L, H, E), d)},
            "experts": {
                "gate_up": jax.ShapeDtypeStruct((L, E, H, 2 * F), d),
                "down": jax.ShapeDtypeStruct((L, E, F, H), d),
            },
        }
        if c.num_shared_experts:
            FS = c.num_shared_experts * F
            specs["shared"] = {
                "gate_up": {"w": jax.ShapeDtypeStruct((L, H, 2 * FS), d)},
                "down": {"w": jax.ShapeDtypeStruct((L, FS, H), d)},
                "gate": {"w": jax.ShapeDtypeStruct((L, H, 1), d)},
            }
        return specs

    def _mlp_pspecs(self) -> Dict[str, Any]:
        c = self.config
        if getattr(self, "use_ep", False):
            # expert parallel: shard the expert axis (reference EPMoE)
            expert_specs = {
                "gate_up": P(None, "tp", None, None),
                "down": P(None, "tp", None, None),
            }
        else:
            # expert-TP: shard the expert FFN width over "tp"
            expert_specs = {
                "gate_up": P(None, None, None, "tp"),
                "down": P(None, None, "tp", None),
            }
        specs = {
            "router": {"w": P()},
            "experts": expert_specs,
        }
        if c.num_shared_experts:
            specs["shared"] = {
                "gate_up": {"w": P(None, None, "tp")},
                "down": {"w": P(None, "tp", None)},
                "gate": {"w": P()},
            }
        return specs

    def _mlp_weight_plan(self) -> Dict[str, Any]:
        # Expert tensors carry two indices ({L}, {E}); the loader resolves
        # both (model_loader/loader.py expert handling).
        c = self.config
        F = c.moe_intermediate_size
        plan = {
            f"model.layers.{{L}}.{self.HF_ROUTER_KEY}": ("layers.router.w", None, "t"),
        }
        for tmpl, leaf, half, tf in self.HF_EXPERT_KEYS:
            sl = (half * F, F) if half is not None else None
            plan[f"model.layers.{{L}}.{tmpl}"] = (f"layers.experts.{leaf}", sl, tf)
        return plan

    def _mlp(self, lp, x):
        c = self.config
        router_logits = apply_linear(lp["router"], x).astype(jnp.float32)
        weights, idx = route_topk(
            router_logits,
            c.num_experts_per_tok,
            norm_topk_prob=c.norm_topk_prob if self.NORM_TOPK_FROM_CONFIG else True,
        )
        if getattr(self, "use_ep", False):
            from semi_pd_tpu.ops.moe import moe_ffn_ep

            out = moe_ffn_ep(
                x, lp["experts"]["gate_up"], lp["experts"]["down"],
                weights, idx, self.mesh,
                capacity_factor=getattr(self, "ep_capacity_factor", 2.0),
            )
        else:
            out = moe_ffn(x, lp["experts"]["gate_up"], lp["experts"]["down"], weights, idx)
        if c.num_shared_experts and "shared" in lp:
            sh = apply_linear(
                lp["shared"]["down"],
                silu_and_mul(apply_linear(lp["shared"]["gate_up"], x)),
            )
            gate = jax.nn.sigmoid(
                apply_linear(lp["shared"]["gate"], x).astype(jnp.float32)
            ).astype(sh.dtype)
            out = out + gate * sh
        return out


class Qwen2MoeForCausalLM(MixtralForCausalLM):
    """Qwen2MoeForCausalLM (reference srt/models/qwen2_moe.py): qkv bias,
    shared expert with sigmoid gate, norm_topk_prob from config."""

    HF_EXPERT_KEYS = (
        ("mlp.experts.{E}.gate_proj.weight", "gate_up", 0, "t"),
        ("mlp.experts.{E}.up_proj.weight", "gate_up", 1, "t"),
        ("mlp.experts.{E}.down_proj.weight", "down", None, "t"),
    )
    HF_ROUTER_KEY = "mlp.gate.weight"
    NORM_TOPK_FROM_CONFIG = True

    def __init__(self, config: ModelConfig):
        config.attention_bias = True
        if not config.num_shared_experts:
            # qwen2-moe always has one shared expert of shared_expert_intermediate_size
            hf = config.hf_config
            ses = getattr(hf, "shared_expert_intermediate_size", None) if hf else None
            if ses:
                config.num_shared_experts = max(1, ses // config.moe_intermediate_size)
        super().__init__(config)

    def _mlp_weight_plan(self) -> Dict[str, Any]:
        plan = super()._mlp_weight_plan()
        c = self.config
        if c.num_shared_experts:
            FS = c.num_shared_experts * c.moe_intermediate_size
            plan.update({
                "model.layers.{L}.mlp.shared_expert.gate_proj.weight": ("layers.shared.gate_up.w", (0, FS), "t"),
                "model.layers.{L}.mlp.shared_expert.up_proj.weight": ("layers.shared.gate_up.w", (FS, FS), "t"),
                "model.layers.{L}.mlp.shared_expert.down_proj.weight": ("layers.shared.down.w", None, "t"),
                "model.layers.{L}.mlp.shared_expert_gate.weight": ("layers.shared.gate.w", None, "t"),
            })
        return plan


class Qwen3MoeForCausalLM(Qwen2MoeForCausalLM):
    """Qwen3MoeForCausalLM (reference srt/models/qwen3_moe.py): qwen2-moe
    routing/experts, but no qkv bias, no shared expert, and per-head q/k
    RMSNorm (use_qk_norm is keyed on the architecture in llama.py)."""

    def __init__(self, config: ModelConfig):
        # grandparent init: skip qwen2-moe's bias/shared-expert defaults
        MixtralForCausalLM.__init__(self, config)
        config.attention_bias = False


class OlmoeForCausalLM(MixtralForCausalLM):
    """OlmoeForCausalLM (reference srt/models/olmoe.py): qwen2-moe-style
    expert naming, norm_topk_prob from config, and q/k RMSNorm applied over
    the FULL projection width (OlmoeAttention norms num_heads*head_dim, not
    per-head like qwen3)."""

    HF_EXPERT_KEYS = (
        ("mlp.experts.{E}.gate_proj.weight", "gate_up", 0, "t"),
        ("mlp.experts.{E}.up_proj.weight", "gate_up", 1, "t"),
        ("mlp.experts.{E}.down_proj.weight", "down", None, "t"),
    )
    HF_ROUTER_KEY = "mlp.gate.weight"
    NORM_TOPK_FROM_CONFIG = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.use_qk_norm = True
        self.qk_norm_full = True
