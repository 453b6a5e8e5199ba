"""LayerNorm-family causal LMs: StableLM, Starcoder2, Phi(-2), Cohere, OLMo2.

Reference: srt/models/{stablelm.py, phi3_small.py-adjacent, commandr.py,
olmo2.py} — each is the llama block with a different norm/bias/topology mix,
expressed here through the structural knobs on LlamaForCausalLM
(norm_bias / parallel_block / no_rope / qk_norm_full / non-gated MLP)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.ops.elementwise import layer_norm, rms_norm
from semi_pd_tpu.runtime.forward_batch import ForwardArrays


class NonGatedMLPMixin:
    """fc1 -> act -> fc2 MLP (no gating). Class attrs name the HF tensors."""

    MLP_FC1 = "mlp.fc1"
    MLP_FC2 = "mlp.fc2"
    MLP_BIAS = True
    mlp_act = staticmethod(lambda x: jax.nn.gelu(x, approximate=True))

    def _mlp_specs(self) -> Dict[str, Any]:
        c, d = self.config, self.dtype
        L, H, I = c.num_hidden_layers, c.hidden_size, c.intermediate_size
        fc1 = {"w": jax.ShapeDtypeStruct((L, H, I), d)}
        fc2 = {"w": jax.ShapeDtypeStruct((L, I, H), d)}
        if self.MLP_BIAS:
            fc1["b"] = jax.ShapeDtypeStruct((L, I), d)
            fc2["b"] = jax.ShapeDtypeStruct((L, H), d)
        return {"fc1": fc1, "fc2": fc2}

    def _mlp_pspecs(self) -> Dict[str, Any]:
        fc1 = {"w": P(None, None, "tp")}
        fc2 = {"w": P(None, "tp", None)}
        if self.MLP_BIAS:
            fc1["b"] = P(None, "tp")
            fc2["b"] = P()
        return {"fc1": fc1, "fc2": fc2}

    def _mlp_weight_plan(self) -> Dict[str, Any]:
        plan = {
            f"model.layers.{{L}}.{self.MLP_FC1}.weight": ("layers.fc1.w", None, "t"),
            f"model.layers.{{L}}.{self.MLP_FC2}.weight": ("layers.fc2.w", None, "t"),
        }
        if self.MLP_BIAS:
            plan[f"model.layers.{{L}}.{self.MLP_FC1}.bias"] = ("layers.fc1.b", None, "none")
            plan[f"model.layers.{{L}}.{self.MLP_FC2}.bias"] = ("layers.fc2.b", None, "none")
        return plan

    def _mlp(self, lp, x):
        from semi_pd_tpu.layers.linear import apply_linear

        return apply_linear(lp["fc2"], self.mlp_act(apply_linear(lp["fc1"], x)))


class StableLmForCausalLM(LlamaForCausalLM):
    """StableLmForCausalLM (reference srt/models/stablelm.py): gated-silu MLP
    like llama, but LayerNorm with bias everywhere, partial rotary, and qkv
    bias behind config.use_qkv_bias."""

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        config.attention_bias = bool(getattr(hf, "use_qkv_bias", False))
        config.partial_rotary_factor = getattr(hf, "partial_rotary_factor", 0.25)
        super().__init__(config)
        self.norm_bias = True
        self.norm_fn = layer_norm


class Starcoder2ForCausalLM(NonGatedMLPMixin, LlamaForCausalLM):
    """Starcoder2ForCausalLM (reference srt/models/ gpt_bigcode lineage):
    GQA + rope, LayerNorm with bias, non-gated gelu MLP named c_fc/c_proj,
    bias on every linear (config.use_bias)."""

    MLP_FC1 = "mlp.c_fc"
    MLP_FC2 = "mlp.c_proj"

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        use_bias = bool(getattr(hf, "use_bias", True))
        config.attention_bias = use_bias
        config.o_proj_bias = use_bias
        super().__init__(config)
        self.MLP_BIAS = use_bias
        self.norm_bias = True
        self.norm_fn = layer_norm
        act = getattr(hf, "hidden_act", "gelu_pytorch_tanh")
        self.mlp_act = (
            (lambda x: jax.nn.gelu(x, approximate=True))
            if act in ("gelu_new", "gelu_pytorch_tanh")
            else (lambda x: jax.nn.gelu(x, approximate=False))
        )


class PhiForCausalLM(NonGatedMLPMixin, LlamaForCausalLM):
    """PhiForCausalLM / phi-2 (reference srt/models/ phi family): parallel
    attention+MLP block from a single LayerNorm, partial rotary, biased
    lm_head, o_proj named `dense`."""

    MLP_FC1 = "mlp.fc1"
    MLP_FC2 = "mlp.fc2"

    def __init__(self, config: ModelConfig):
        config.attention_bias = True
        config.o_proj_bias = True
        config.partial_rotary_factor = getattr(
            config.hf_config, "partial_rotary_factor", 0.5
        )
        super().__init__(config)
        self.norm_bias = True
        self.norm_fn = layer_norm
        self.parallel_block = True
        self.lm_head_bias = True

    def hf_weight_plan(self) -> Dict[str, Any]:
        plan = super().hf_weight_plan()
        plan["model.layers.{L}.self_attn.dense.weight"] = ("layers.o_proj.w", None, "t")
        plan["model.layers.{L}.self_attn.dense.bias"] = ("layers.o_proj.b", None, "none")
        # phi's final norm is `model.final_layernorm`
        for k in ("model.norm.weight", "model.norm.bias"):
            plan.pop(k, None)
        plan["model.final_layernorm.weight"] = ("final_norm.w", None, "none")
        plan["model.final_layernorm.bias"] = ("final_norm.b", None, "none")
        return plan


class CohereForCausalLM(LlamaForCausalLM):
    """CohereForCausalLM / Command-R (reference srt/models/commandr.py):
    parallel attention+MLP block, bias-free LayerNorm, interleaved (GPT-J)
    rotary, tied embeddings, logits scaled by config.logit_scale."""

    def __init__(self, config: ModelConfig):
        from semi_pd_tpu.ops.rope import RotaryEmbedding

        config.tie_word_embeddings = True
        super().__init__(config)
        self.parallel_block = True
        self.norm_fn = layer_norm  # weight-only leaves: LN without bias
        scale = getattr(config.hf_config, "logit_scale", 1.0)
        self.logits_div = 1.0 / scale
        self.rope = RotaryEmbedding(
            head_dim=self.head_dim,
            rotary_dim=int(self.head_dim * config.partial_rotary_factor),
            max_position=config.context_length,
            theta=config.rope_theta,
            rope_scaling=config.rope_scaling,
            is_neox_style=False,
            dtype=self.dtype,
        )


class Olmo2ForCausalLM(LlamaForCausalLM):
    """Olmo2ForCausalLM (reference srt/models/olmo2.py): norms applied to the
    block OUTPUTS (post-attention / post-feedforward), un-normed residual
    stream into both branches, full-projection q/k RMSNorm."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.use_qk_norm = True
        self.qk_norm_full = True

    def _layer(self, lp, layer_idx, h, kv_cache, fb: ForwardArrays):
        attn_out, kv_cache = self._attn(lp, h, layer_idx, fb, kv_cache)
        h = h + self._norm(attn_out, lp["input_norm"])
        mlp = self._mlp_lora(lp, h, fb)
        return h + self._norm(mlp, lp["post_norm"]), kv_cache

    def hf_weight_plan(self) -> Dict[str, Any]:
        plan = super().hf_weight_plan()
        # olmo2 names: post_attention_layernorm follows attention (our
        # input_norm slot), post_feedforward_layernorm follows the MLP
        del plan["model.layers.{L}.input_layernorm.weight"]
        plan["model.layers.{L}.post_attention_layernorm.weight"] = (
            "layers.input_norm", None, "none",
        )
        plan["model.layers.{L}.post_feedforward_layernorm.weight"] = (
            "layers.post_norm", None, "none",
        )
        return plan


class Phi3SmallForCausalLM(LlamaForCausalLM):
    """Phi-3-small (reference srt/models/phi3_small.py): LayerNorm blocks
    with bias, fused interleaved query_key_value (per-kv-head [q...qkv]
    grouping, +bias), biased dense/o_proj, gegelu MLP (up_proj packs
    interleaved gelu/linear channels — de-interleaved at load into
    contiguous halves so the hot path is one fused matmul), muP scaling
    (attn scale = mup_attn_multiplier/head_dim, embeddings scaled by
    mup_embedding_multiplier, logits divided by mup_width_multiplier),
    tiktoken dummy-token logit masking, and linear / "su" (longrope)
    position scaling.

    NOTE on blocksparse attention: the reference computes blocksparse
    params (phi3_small.py:177-197) but never passes them to its attention
    layer (the RadixAttention construction at :199-206 takes none), i.e.
    the reference serves phi-3-small with DENSE attention. We match that
    serving behavior."""

    def __init__(self, config: ModelConfig):
        import numpy as np

        hf = config.hf_config
        config.attention_bias = True
        config.o_proj_bias = True
        super().__init__(config)
        self.norm_bias = True
        self.norm_fn = layer_norm
        if getattr(hf, "mup_use_scaling", False):
            self.scale = float(hf.mup_attn_multiplier) / self.head_dim
        emb_mult = getattr(hf, "mup_embedding_multiplier", None)
        if emb_mult:
            self.embed_scale = float(emb_mult)
        wmult = getattr(hf, "mup_width_multiplier", None)
        if wmult and wmult != 1.0:
            # HF remote code divides logits by mup_width_multiplier; the
            # reference fork stores the attribute but drops the division
            # (phi3_small.py:366-377) — we keep the model's trained scaling
            self.logits_div = float(wmult)
        self._gegelu_limit = getattr(hf, "gegelu_limit", None)
        I = config.intermediate_size

        def _gegelu(gu):
            g, u = gu[..., :I], gu[..., I:]
            if self._gegelu_limit is not None:
                lim = self._gegelu_limit
                g = jnp.minimum(g, lim)
                u = jnp.clip(u, -lim, lim)
            return g * jax.nn.sigmoid(1.702 * g) * (u + 1.0)

        self.act = _gegelu
        dummy = getattr(hf, "dummy_token_indices", None)
        if dummy:
            bias = np.zeros(config.vocab_size, np.float32)
            bias[np.asarray(dummy)] = -1e30
            self.logit_bias = bias

    # ------------------------------------------------------ MLP with bias
    def _mlp_specs(self) -> Dict[str, Any]:
        c, d = self.config, self.dtype
        specs = super()._mlp_specs()
        specs["gate_up"]["b"] = jax.ShapeDtypeStruct(
            (c.num_hidden_layers, 2 * c.intermediate_size), d)
        specs["down"]["b"] = jax.ShapeDtypeStruct(
            (c.num_hidden_layers, c.hidden_size), d)
        return specs

    def _mlp_pspecs(self) -> Dict[str, Any]:
        specs = super()._mlp_pspecs()
        specs["gate_up"]["b"] = P(None, "tp")
        specs["down"]["b"] = P()
        return specs

    def _mlp_weight_plan(self) -> Dict[str, Any]:
        return {
            "model.layers.{L}.mlp.up_proj.weight": ("layers", None, "phi3small_up_w"),
            "model.layers.{L}.mlp.up_proj.bias": ("layers", None, "phi3small_up_b"),
            "model.layers.{L}.mlp.down_proj.weight": ("layers.down.w", None, "t"),
            "model.layers.{L}.mlp.down_proj.bias": ("layers.down.b", None, "none"),
        }

    def hf_weight_plan(self) -> Dict[str, Any]:
        plan = super().hf_weight_plan()
        for k in list(plan):
            if ".self_attn.q_proj" in k or ".self_attn.k_proj" in k \
                    or ".self_attn.v_proj" in k or ".self_attn.o_proj" in k \
                    or k.startswith("model.norm"):
                del plan[k]
        plan.update({
            "model.layers.{L}.self_attn.query_key_value.weight": (
                "layers", None, "phi3small_qkv_w"),
            "model.layers.{L}.self_attn.query_key_value.bias": (
                "layers", None, "phi3small_qkv_b"),
            "model.layers.{L}.self_attn.dense.weight": (
                "layers.o_proj.w", None, "t"),
            "model.layers.{L}.self_attn.dense.bias": (
                "layers.o_proj.b", None, "none"),
        })
        plan.update(self._norm_plan("model.final_layernorm", "final_norm"))
        return plan

    def postprocess_weight(self, transform: str, tensor):
        import numpy as np

        g = self.num_heads // self.num_kv_heads
        d = self.head_dim
        if transform == "phi3small_qkv_w":
            w = tensor.reshape(self.num_kv_heads, g + 2, d, -1)
            wq = w[:, :g].reshape(self.q_size, -1)
            wk = w[:, g].reshape(self.kv_size, -1)
            wv = w[:, g + 1].reshape(self.kv_size, -1)
            fused = np.concatenate([wq.T, wk.T, wv.T], axis=1)
            return {"qkv_proj.w": np.ascontiguousarray(fused)}
        if transform == "phi3small_qkv_b":
            b = tensor.reshape(self.num_kv_heads, g + 2, d)
            return {"qkv_proj.b": np.concatenate([
                b[:, :g].reshape(-1), b[:, g].reshape(-1),
                b[:, g + 1].reshape(-1)])}
        if transform == "phi3small_up_w":
            # interleaved [gelu, linear] output channels -> contiguous halves
            return {"gate_up.w": np.ascontiguousarray(
                np.concatenate([tensor[0::2], tensor[1::2]]).T)}
        if transform == "phi3small_up_b":
            return {"gate_up.b": np.concatenate([tensor[0::2], tensor[1::2]])}
        raise KeyError(transform)
