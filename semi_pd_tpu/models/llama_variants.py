"""Llama-computation families with non-llama checkpoint layouts or scalar
tweaks: InternLM2, ExaOne, Baichuan, Qwen (v1), MiniCPM, XVerse(+MoE),
DeepSeek (v1).

Reference: srt/models/{internlm2,exaone,baichuan,qwen,minicpm,xverse,
xverse_moe,deepseek}.py — in the reference each is a full nn.Module tree
whose only real deltas are weight naming (fused wqkv / W_pack / c_attn),
gate/up ordering, or scalar multipliers. Here they are Llama/Mixtral
subclasses overriding hf_weight_plan() (and postprocess_weight for the
interleaved fusions), so the TPU forward path (stacked-leaf scan, paged
attention, ragged-dot MoE) is shared unchanged.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.models.qwen2_moe import MixtralForCausalLM


class InternLM2ForCausalLM(LlamaForCausalLM):
    """InternLM2 (reference srt/models/internlm2.py): llama computation;
    checkpoint uses tok_embeddings/attention_norm/ffn_norm naming, a FUSED
    INTERLEAVED wqkv ([kv_heads, kv_groups+2, head_dim, H] grouping, split
    per reference load_weights :view/:split), and w1/w3/w2 MLP naming."""

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        plan = {
            "model.tok_embeddings.weight": ("embed.w", None, "none"),
            "model.norm.weight": ("final_norm", None, "none"),
            "model.layers.{L}.attention_norm.weight": ("layers.input_norm", None, "none"),
            "model.layers.{L}.attention.wqkv.weight": ("layers", None, "internlm2_wqkv"),
            "model.layers.{L}.attention.wo.weight": ("layers.o_proj.w", None, "t"),
            "model.layers.{L}.ffn_norm.weight": ("layers.post_norm", None, "none"),
            "model.layers.{L}.feed_forward.w1.weight": ("layers.gate_up.w", (0, self.config.intermediate_size), "t"),
            "model.layers.{L}.feed_forward.w3.weight": ("layers.gate_up.w", (self.config.intermediate_size, self.config.intermediate_size), "t"),
            "model.layers.{L}.feed_forward.w2.weight": ("layers.down.w", None, "t"),
        }
        if not self.config.tie_word_embeddings:
            plan["output.weight"] = ("lm_head.w", None, "t")
        return plan

    def postprocess_weight(self, transform: str, tensor: np.ndarray):
        assert transform == "internlm2_wqkv"
        kv_groups = self.num_heads // self.num_kv_heads
        d = self.head_dim
        w = tensor.reshape(self.num_kv_heads, kv_groups + 2, d, -1)
        wq = w[:, :kv_groups].reshape(self.q_size, -1)
        wk = w[:, kv_groups].reshape(self.kv_size, -1)
        wv = w[:, kv_groups + 1].reshape(self.kv_size, -1)
        # dest leaf is layers.qkv_proj.w [H, q+2kv] (input-major): deliver
        # the de-interleaved fusion in one piece
        fused = np.concatenate([wq.T, wk.T, wv.T], axis=1)
        return {"qkv_proj.w": np.ascontiguousarray(fused)}


class InternLM2ForRewardModel(InternLM2ForCausalLM):
    """InternLM2 reward model (reference srt/models/internlm2_reward.py):
    trunk + v_head scalar score on the last token."""

    def __init__(self, config: ModelConfig):
        config.tie_word_embeddings = True  # no lm_head in the checkpoint
        super().__init__(config)
        self.config.is_embedding = True

    def param_specs(self):
        specs = super().param_specs()
        specs["v_head"] = {"w": jax.ShapeDtypeStruct((self.config.hidden_size, 1), self.dtype)}
        return specs

    def param_partition_specs(self):
        specs = super().param_partition_specs()
        specs["v_head"] = {"w": P()}
        return specs

    def hf_weight_plan(self):
        plan = super().hf_weight_plan()
        plan["v_head.weight"] = ("v_head.w", None, "t")
        return plan

    def forward_embedding(self, params, fb, kv):
        from semi_pd_tpu.layers.linear import apply_linear

        _, kv, last_h = LlamaForCausalLM.forward(
            self, params, fb, kv, return_hidden=True
        )
        scores = apply_linear(params["v_head"], last_h).astype(jnp.float32)
        return scores, kv


class ExaoneForCausalLM(LlamaForCausalLM):
    """ExaOne (reference srt/models/exaone.py): llama computation under
    transformer.h naming (ln_1/ln_2, attn.attention.*_proj/out_proj,
    mlp.c_fc_0 gate / c_fc_1 up / c_proj down)."""

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        I = self.config.intermediate_size
        plan = {
            "transformer.wte.weight": ("embed.w", None, "none"),
            "transformer.ln_f.weight": ("final_norm", None, "none"),
            "transformer.h.{L}.ln_1.weight": ("layers.input_norm", None, "none"),
            "transformer.h.{L}.attn.attention.q_proj.weight": ("layers.qkv_proj.w", (0, self.q_size), "t"),
            "transformer.h.{L}.attn.attention.k_proj.weight": ("layers.qkv_proj.w", (self.q_size, self.kv_size), "t"),
            "transformer.h.{L}.attn.attention.v_proj.weight": ("layers.qkv_proj.w", (self.q_size + self.kv_size, self.kv_size), "t"),
            "transformer.h.{L}.attn.attention.out_proj.weight": ("layers.o_proj.w", None, "t"),
            "transformer.h.{L}.ln_2.weight": ("layers.post_norm", None, "none"),
            "transformer.h.{L}.mlp.c_fc_0.weight": ("layers.gate_up.w", (0, I), "t"),
            "transformer.h.{L}.mlp.c_fc_1.weight": ("layers.gate_up.w", (I, I), "t"),
            "transformer.h.{L}.mlp.c_proj.weight": ("layers.down.w", None, "t"),
        }
        if not self.config.tie_word_embeddings:
            plan["lm_head.weight"] = ("lm_head.w", None, "t")
        return plan


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Standard ALiBi slope schedule (reference baichuan.py
    _get_alibi_slopes:52)."""
    cp2 = 2 ** int(math.floor(math.log2(n_heads)))
    base = 2.0 ** (-(2.0 ** -(math.log2(cp2) - 3)))
    slopes = base ** np.arange(1, 1 + cp2, dtype=np.float64)
    if cp2 != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * cp2) - 3)))
        n_rem = min(cp2, n_heads - cp2)
        extra = extra_base ** np.arange(1, 1 + 2 * n_rem, 2, dtype=np.float64)
        slopes = np.concatenate([slopes, extra])
    return slopes.astype(np.float32)


class BaichuanForCausalLM(LlamaForCausalLM):
    """Baichuan/Baichuan2 (reference srt/models/baichuan.py): llama with a
    fused W_pack qkv (plain [q;k;v] concat). 7B uses RoPE; 13B uses ALiBi
    (reference keys on hidden_size 4096 -> RoPE, else ALiBi) — routed
    through the jnp reference attention's alibi bias."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        pos_emb = getattr(hf, "position_embedding", None) if hf else None
        if pos_emb == "ALIBI" or (pos_emb is None and config.hidden_size == 5120):
            self.no_rope = True
            self.alibi_slopes = jnp.asarray(
                alibi_slopes(config.num_attention_heads)
            )

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        plan = super().hf_weight_plan()
        for k in list(plan):
            if "q_proj" in k or "k_proj" in k or "v_proj" in k:
                del plan[k]
        plan["model.layers.{L}.self_attn.W_pack.weight"] = (
            "layers.qkv_proj.w", None, "t"
        )
        return plan


class QWenLMHeadModel(LlamaForCausalLM):
    """Qwen v1 (reference srt/models/qwen.py): llama computation; fused
    c_attn with bias, mlp w2 (gate) / w1 (up) / c_proj (down), transformer.h
    naming, RMSNorm at ln_1/ln_2/ln_f."""

    def __init__(self, config: ModelConfig):
        config.attention_bias = True  # c_attn carries a fused qkv bias
        super().__init__(config)

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        I = self.config.intermediate_size
        plan = {
            "transformer.wte.weight": ("embed.w", None, "none"),
            "transformer.ln_f.weight": ("final_norm", None, "none"),
            "transformer.h.{L}.ln_1.weight": ("layers.input_norm", None, "none"),
            "transformer.h.{L}.attn.c_attn.weight": ("layers.qkv_proj.w", None, "t"),
            "transformer.h.{L}.attn.c_attn.bias": ("layers.qkv_proj.b", None, "none"),
            "transformer.h.{L}.attn.c_proj.weight": ("layers.o_proj.w", None, "t"),
            "transformer.h.{L}.ln_2.weight": ("layers.post_norm", None, "none"),
            "transformer.h.{L}.mlp.w2.weight": ("layers.gate_up.w", (0, I), "t"),
            "transformer.h.{L}.mlp.w1.weight": ("layers.gate_up.w", (I, I), "t"),
            "transformer.h.{L}.mlp.c_proj.weight": ("layers.down.w", None, "t"),
        }
        if not self.config.tie_word_embeddings:
            plan["lm_head.weight"] = ("lm_head.w", None, "t")
        return plan


class MiniCPMForCausalLM(LlamaForCausalLM):
    """MiniCPM (reference srt/models/minicpm.py): llama weights; three
    scalar knobs — embeddings x scale_emb, residual branches x
    scale_depth/sqrt(L), logits / (hidden_size/dim_model_base) — map onto the
    llama.py embed_scale/residual_mult/logits_div hooks."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        scale_emb = getattr(hf, "scale_emb", 1.0) if hf else 1.0
        scale_depth = getattr(hf, "scale_depth", 1.0) if hf else 1.0
        dim_model_base = getattr(hf, "dim_model_base", None) if hf else None
        self.embed_scale = float(scale_emb)
        self.residual_mult = float(scale_depth) / math.sqrt(config.num_hidden_layers)
        if dim_model_base:
            self.logits_div = config.hidden_size / float(dim_model_base)


class XverseMoeForCausalLM(MixtralForCausalLM):
    """XVerse-MoE (reference srt/models/xverse_moe.py): llama attention,
    deepseek-v1-style MoE with router + ungated shared experts; experts use
    gate_proj/up_proj/down_proj naming, router at mlp.router.gate (HF
    xverse-moe: mlp.gate), shared at mlp.shared_experts."""

    HF_EXPERT_KEYS = (
        ("mlp.experts.{E}.gate_proj.weight", "gate_up", 0, "t"),
        ("mlp.experts.{E}.up_proj.weight", "gate_up", 1, "t"),
        ("mlp.experts.{E}.down_proj.weight", "down", None, "t"),
    )
    HF_ROUTER_KEY = "mlp.gate.weight"
    NORM_TOPK_FROM_CONFIG = True
    UNGATED_SHARED = True  # shared expert output added without a sigmoid gate

    def _mlp_specs(self) -> Dict[str, Any]:
        specs = super()._mlp_specs()
        if self.config.num_shared_experts and self.UNGATED_SHARED:
            del specs["shared"]["gate"]
        return specs

    def _mlp_pspecs(self) -> Dict[str, Any]:
        specs = super()._mlp_pspecs()
        if self.config.num_shared_experts and self.UNGATED_SHARED:
            del specs["shared"]["gate"]
        return specs

    def _mlp_weight_plan(self) -> Dict[str, Any]:
        plan = super()._mlp_weight_plan()
        c = self.config
        if c.num_shared_experts:
            FS = c.num_shared_experts * c.moe_intermediate_size
            plan.update({
                "model.layers.{L}.mlp.shared_experts.gate_proj.weight": ("layers.shared.gate_up.w", (0, FS), "t"),
                "model.layers.{L}.mlp.shared_experts.up_proj.weight": ("layers.shared.gate_up.w", (FS, FS), "t"),
                "model.layers.{L}.mlp.shared_experts.down_proj.weight": ("layers.shared.down.w", None, "t"),
            })
        return plan

    def _mlp(self, lp, x):
        from semi_pd_tpu.layers.linear import apply_linear
        from semi_pd_tpu.ops.elementwise import silu_and_mul
        from semi_pd_tpu.ops.moe import moe_ffn, route_topk

        import jax.numpy as jnp

        c = self.config
        router_logits = apply_linear(lp["router"], x).astype(jnp.float32)
        weights, idx = route_topk(
            router_logits, c.num_experts_per_tok,
            norm_topk_prob=c.norm_topk_prob if self.NORM_TOPK_FROM_CONFIG else True,
        )
        if getattr(self, "use_ep", False):
            from semi_pd_tpu.ops.moe import moe_ffn_ep

            out = moe_ffn_ep(
                x, lp["experts"]["gate_up"], lp["experts"]["down"], weights,
                idx, self.mesh,
                capacity_factor=getattr(self, "ep_capacity_factor", 2.0),
            )
        else:
            out = moe_ffn(x, lp["experts"]["gate_up"], lp["experts"]["down"], weights, idx)
        if c.num_shared_experts and "shared" in lp:
            out = out + apply_linear(
                lp["shared"]["down"],
                silu_and_mul(apply_linear(lp["shared"]["gate_up"], x)),
            )
        return out


class DeepseekForCausalLM(XverseMoeForCausalLM):
    """DeepSeek v1 MoE (reference srt/models/deepseek.py): llama attention +
    softmax top-k routing, ungated shared experts, and the first
    first_k_dense_replace layers dense. Heterogeneous layers break the scan;
    this family unrolls (same approach as deepseek_v2.py)."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.scan_layers = False
        hf = config.hf_config
        self.first_k_dense = getattr(hf, "first_k_dense_replace", 0) if hf else 0
        self.moe_layer_freq = getattr(hf, "moe_layer_freq", 1) if hf else 1

    def _is_moe_layer(self, l: int) -> bool:
        return (
            self.config.num_experts is not None
            and l >= self.first_k_dense
            and l % self.moe_layer_freq == 0
        )

    # Heterogeneous per-layer params: keep every leaf stacked [L, ...] for
    # BOTH dense and MoE shapes (dense layers simply never read the expert
    # leaves and vice versa); wasted bytes are acceptable at v1 scales and
    # the loader plan stays uniform.
    def _mlp_specs(self) -> Dict[str, Any]:
        c, d = self.config, self.dtype
        L, H, I = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        specs = super()._mlp_specs()
        specs["dense_gate_up"] = {"w": jax.ShapeDtypeStruct((L, H, 2 * I), d)}
        specs["dense_down"] = {"w": jax.ShapeDtypeStruct((L, I, H), d)}
        return specs

    def _mlp_pspecs(self) -> Dict[str, Any]:
        specs = super()._mlp_pspecs()
        specs["dense_gate_up"] = {"w": P(None, None, "tp")}
        specs["dense_down"] = {"w": P(None, "tp", None)}
        return specs

    def _mlp_weight_plan(self) -> Dict[str, Any]:
        I = self.config.intermediate_size
        plan = super()._mlp_weight_plan()
        plan.update({
            "model.layers.{L}.mlp.gate_proj.weight": ("layers.dense_gate_up.w", (0, I), "t"),
            "model.layers.{L}.mlp.up_proj.weight": ("layers.dense_gate_up.w", (I, I), "t"),
            "model.layers.{L}.mlp.down_proj.weight": ("layers.dense_down.w", None, "t"),
        })
        return plan

    def _layer(self, lp, layer_idx, h, kv_cache, fb):
        self._current_layer = int(layer_idx)
        return super()._layer(lp, layer_idx, h, kv_cache, fb)

    def _mlp(self, lp, x):
        from semi_pd_tpu.layers.linear import apply_linear

        if not self._is_moe_layer(self._current_layer):
            return apply_linear(
                lp["dense_down"], self.act(apply_linear(lp["dense_gate_up"], x))
            )
        return super()._mlp(lp, x)


class MiniCPM3ForCausalLM:
    """MiniCPM3 (reference srt/models/minicpm3.py): deepseek-style MLA
    attention (identical q_a/q_b/kv_a/kv_b/kv_b_proj checkpoint layout,
    served absorb-form over the latent pool) + dense SiLU MLP + the MiniCPM
    scalar knobs (scale_emb, scale_depth/sqrt(L) residuals, logits /
    (hidden/dim_model_base)). Rope on the decoupled pe head is NEOX-style
    (reference get_rope default there, unlike deepseek's interleaved)."""

    def __new__(cls, config: ModelConfig):
        from semi_pd_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM
        from semi_pd_tpu.ops.rope import RotaryEmbedding

        model = DeepseekV2ForCausalLM(config)
        hf = config.hf_config
        g = lambda k, d: getattr(hf, k, d) if hf else d
        model.embed_scale = float(g("scale_emb", 1.0))
        model.residual_mult = float(g("scale_depth", 1.0)) / math.sqrt(
            config.num_hidden_layers
        )
        dmb = g("dim_model_base", None)
        if dmb:
            model.logits_div = config.hidden_size / float(dmb)
        model.rope = RotaryEmbedding(
            head_dim=model.dr, rotary_dim=model.dr,
            max_position=config.context_length, theta=config.rope_theta,
            rope_scaling=config.rope_scaling, is_neox_style=True,
        )
        return model
