"""Model configuration derived from HuggingFace configs.

TPU-native counterpart of the reference's ModelConfig
(reference: python/sglang/srt/configs/model_config.py:31-138 — HF config
parsing, MLA-vs-MHA architecture detection, context length and quantization
resolution). We normalize every supported architecture into one flat config
the model builders consume, so the rest of the stack never touches raw HF
config objects.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional

# Architectures whose attention is Multi-head Latent Attention (compressed KV)
# — these use the latent KV pool (reference memory_pool.py:379 MLATokenToKVPool).
MLA_ARCHS = {
    "DeepseekV2ForCausalLM",
    "DeepseekV3ForCausalLM",
    "MiniCPM3ForCausalLM",
}


@dataclasses.dataclass
class ModelConfig:
    architecture: str
    model_path: str = ""

    # Core transformer dims
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    hidden_act: str = "silu"
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # qwen2-style qkv bias
    o_proj_bias: bool = False
    mlp_bias: bool = False
    logit_softcap: Optional[float] = None  # gemma2/grok
    attn_logit_softcap: Optional[float] = None
    sliding_window: Optional[int] = None
    layer_types: Optional[List[str]] = None  # per-layer "full_attention"/"sliding_attention"

    # Positional encoding
    max_position_embeddings: int = 4096
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    partial_rotary_factor: float = 1.0

    # Context
    context_length: int = 4096

    # MoE (None => dense)
    num_experts: Optional[int] = None
    num_experts_per_tok: int = 2
    moe_intermediate_size: Optional[int] = None
    num_shared_experts: int = 0
    moe_layer_freq: int = 1
    first_k_dense_replace: int = 0
    n_group: Optional[int] = None  # deepseek grouped routing
    topk_group: Optional[int] = None
    topk_method: Optional[str] = None  # greedy | group_limited_greedy | noaux_tc
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = False
    scoring_func: str = "softmax"  # softmax | sigmoid (deepseek v3)

    # MLA (None => standard MHA/GQA)
    use_mla: bool = False
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0

    # dtype / quant
    dtype: str = "bfloat16"
    quantization: Optional[str] = None
    quantization_config: Optional[Dict[str, Any]] = None

    # Embedding / pooling models
    is_embedding: bool = False

    # Multimodal
    is_multimodal: bool = False

    hf_config: Optional[Any] = dataclasses.field(default=None, repr=False)

    # ------------------------------------------------------------------
    @property
    def kv_head_dim(self) -> int:
        """Per-token per-head KV width as stored in the pool."""
        if self.use_mla:
            return self.kv_lora_rank + self.qk_rope_head_dim
        return self.head_dim

    @property
    def num_kv_heads_total(self) -> int:
        return 1 if self.use_mla else self.num_key_value_heads

    @classmethod
    def from_hf_config(
        cls,
        hf_config,
        model_path: str = "",
        context_length: Optional[int] = None,
        dtype: str = "bfloat16",
        quantization: Optional[str] = None,
    ) -> "ModelConfig":
        # VLM configs wrap a text_config; build from the inner config but
        # keep the outer architecture + full config for the model wrapper.
        inner = getattr(hf_config, "text_config", None)
        if inner is not None and hasattr(inner, "num_hidden_layers"):
            cfg = cls.from_hf_config(
                inner, model_path=model_path, context_length=context_length,
                dtype=dtype, quantization=quantization,
            )
            cfg.is_multimodal = True
            cfg.hf_config = hf_config
            outer = getattr(hf_config, "architectures", None)
            if outer:
                cfg.architecture = outer[0]
            elif type(hf_config).__name__ == "LlavaConfig":
                cfg.architecture = "LlavaForConditionalGeneration"
            return cfg

        g = lambda k, d=None: getattr(hf_config, k, d)
        arch_list = g("architectures")
        if arch_list:
            arch = arch_list[0]
        else:
            # Constructed configs (tests) often lack `architectures`; infer
            # from the config class name (FooConfig -> FooForCausalLM).
            cls_name = type(hf_config).__name__
            arch = (
                cls_name[: -len("Config")] + "ForCausalLM"
                if cls_name.endswith("Config") and cls_name != "Config"
                else "LlamaForCausalLM"
            )

        num_heads = g("num_attention_heads", 32)
        hidden = g("hidden_size", 4096)
        head_dim = g("head_dim") or hidden // num_heads

        cfg = cls(
            architecture=arch,
            model_path=model_path,
            vocab_size=g("vocab_size", 32000),
            hidden_size=hidden,
            intermediate_size=g("intermediate_size") or 4 * hidden,
            num_hidden_layers=g("num_hidden_layers", 32),
            num_attention_heads=num_heads,
            num_key_value_heads=g("num_key_value_heads") or num_heads,
            head_dim=head_dim,
            rms_norm_eps=g("rms_norm_eps")
            or g("norm_epsilon")
            or g("layer_norm_eps")
            or g("layer_norm_epsilon")
            or 1e-6,
            hidden_act=g("hidden_act", "silu"),
            tie_word_embeddings=g("tie_word_embeddings", False),
            attention_bias=g("attention_bias", g("qkv_bias", False)),
            sliding_window=g("sliding_window"),
            layer_types=g("layer_types"),
            max_position_embeddings=g("max_position_embeddings", 4096),
            rope_theta=g("rope_theta", 10000.0),
            rope_scaling=g("rope_scaling"),
            partial_rotary_factor=g("partial_rotary_factor", 1.0),
            dtype=dtype,
            quantization=quantization,
            quantization_config=g("quantization_config"),
            hf_config=hf_config,
        )

        cfg.context_length = context_length or g(
            "max_position_embeddings", 4096
        )

        # GPT-BigCode / Falcon multi-query attention: one shared KV head.
        if arch in ("GPTBigCodeForCausalLM", "FalconForCausalLM") and g(
            "multi_query", True
        ):
            cfg.num_key_value_heads = 1
        if arch == "FalconForCausalLM":
            cfg.hidden_act = "gelu"

        # DBRX nests attention/ffn settings in sub-configs.
        if arch == "DbrxForCausalLM":
            ac, fc = hf_config.attn_config, hf_config.ffn_config
            cfg.num_key_value_heads = ac.kv_n_heads
            cfg.rope_theta = ac.rope_theta
            cfg.num_experts = fc.moe_num_experts
            cfg.num_experts_per_tok = fc.moe_top_k
            cfg.moe_intermediate_size = fc.ffn_hidden_size
            cfg.norm_topk_prob = True
            cfg.tie_word_embeddings = False
            cfg.rms_norm_eps = 1e-5  # nn.LayerNorm default

        # Qwen2 puts bias on qkv but not o/mlp.
        if arch.startswith(("Qwen2", "Qwen")) and "Moe" not in arch:
            cfg.attention_bias = True if g("attention_bias") is None else cfg.attention_bias

        # Phi-3-small keys rope under rope_embedding_base /
        # rope_position_scale (reference phi3_small.py:127-128, 160-176);
        # absent rope_scaling means linear scaling by rope_position_scale.
        if arch == "Phi3SmallForCausalLM":
            cfg.rope_theta = g("rope_embedding_base", 1000000.0)
            if cfg.rope_scaling is None:
                cfg.rope_scaling = {
                    "rope_type": "linear",
                    "factor": g("rope_position_scale", 1.0),
                }

        # ExaOne names depth/activation differently (reference exaone.py).
        if arch == "ExaoneForCausalLM":
            cfg.num_hidden_layers = g("num_layers", cfg.num_hidden_layers)
            cfg.hidden_act = g("activation_function", "silu")

        # Qwen v1: intermediate_size is stored as the FUSED w1+w2 width
        # (reference qwen.py builds QWenMLP with intermediate_size // 2);
        # rope base/seq length live under QWen-specific keys.
        if arch == "QWenLMHeadModel":
            cfg.intermediate_size //= 2
            cfg.rope_theta = g("rotary_emb_base", 10000.0)
            cfg.max_position_embeddings = g("seq_length", 8192)
            cfg.context_length = context_length or cfg.max_position_embeddings

        # ChatGLM ggml-era configs name everything differently
        # (reference chatglm.py reads these keys).
        if arch in ("ChatGLMModel", "ChatGLMForConditionalGeneration",
                    "ChatGLMForCausalLM"):
            cfg.num_hidden_layers = g("num_layers", cfg.num_hidden_layers)
            cfg.vocab_size = g("padded_vocab_size", cfg.vocab_size)
            cfg.intermediate_size = g("ffn_hidden_size", cfg.intermediate_size)
            cfg.head_dim = g("kv_channels") or cfg.head_dim
            if g("multi_query_attention", False):
                cfg.num_key_value_heads = g("multi_query_group_num", 2)
            cfg.rms_norm_eps = g("layernorm_epsilon", 1e-5)
            cfg.max_position_embeddings = g("seq_length", 8192)
            cfg.context_length = context_length or cfg.max_position_embeddings
            cfg.rope_theta = 10000.0 * g("rope_ratio", 1.0)
            cfg.partial_rotary_factor = 0.5
            cfg.tie_word_embeddings = g("tie_word_embeddings", False)

        # XVerse-MoE keys (reference xverse_moe.py: moe_top_k, per-expert
        # width == intermediate_size, ungated shared experts).
        if arch == "XverseMoeForCausalLM":
            cfg.num_experts_per_tok = g("moe_top_k", 2)
            cfg.moe_intermediate_size = cfg.intermediate_size
            cfg.num_shared_experts = g("num_shared_experts") or 0
            cfg.norm_topk_prob = g("norm_topk_prob", True)

        # MoE detection (mixtral/qwen2_moe/deepseek/olmoe...)
        n_experts = (
            g("num_local_experts") or g("n_routed_experts") or g("num_experts")
        )
        if n_experts:
            cfg.num_experts = n_experts
            cfg.num_experts_per_tok = g("num_experts_per_tok", 2)
            cfg.moe_intermediate_size = g("moe_intermediate_size") or cfg.intermediate_size
            cfg.num_shared_experts = g("n_shared_experts") or 0
            cfg.first_k_dense_replace = g("first_k_dense_replace", 0)
            cfg.moe_layer_freq = g("moe_layer_freq", 1)
            cfg.n_group = g("n_group")
            cfg.topk_group = g("topk_group")
            cfg.topk_method = g("topk_method")
            cfg.routed_scaling_factor = g("routed_scaling_factor", 1.0)
            cfg.norm_topk_prob = g("norm_topk_prob", False)
            cfg.scoring_func = g("scoring_func", "softmax")

        # MLA detection (reference model_config.py: attention_arch MLA when
        # kv_lora_rank present for deepseek_v2/v3).
        if arch in MLA_ARCHS and g("kv_lora_rank"):
            cfg.use_mla = True
            cfg.q_lora_rank = g("q_lora_rank")
            cfg.kv_lora_rank = g("kv_lora_rank")
            cfg.qk_nope_head_dim = g("qk_nope_head_dim", 128)
            cfg.qk_rope_head_dim = g("qk_rope_head_dim", 64)
            cfg.v_head_dim = g("v_head_dim", 128)
            cfg.head_dim = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim

        if (
            arch.endswith(("EmbeddingModel", "Model", "Classification"))
            or "Reward" in arch
        ):
            cfg.is_embedding = True

        return cfg

    @classmethod
    def from_model_path(
        cls,
        model_path: str,
        trust_remote_code: bool = True,
        context_length: Optional[int] = None,
        dtype: str = "bfloat16",
        quantization: Optional[str] = None,
        json_override_args: Optional[str] = None,
        revision: Optional[str] = None,
        download_dir: Optional[str] = None,
    ) -> "ModelConfig":
        if model_path.endswith(".gguf"):
            # Single-file GGUF checkpoint: synthesize the HF config from the
            # container's metadata (reference loader.py gguf path reads it
            # via the gguf package; gguf_reader.py parses it directly).
            from semi_pd_tpu.model_loader.gguf_reader import hf_config_from_gguf

            hf_config = hf_config_from_gguf(model_path)
        else:
            from transformers import AutoConfig

            try:
                hf_config = AutoConfig.from_pretrained(
                    model_path, trust_remote_code=trust_remote_code,
                    revision=revision, cache_dir=download_dir,
                )
            except ValueError:
                # Remote-code model types (internlm2, baichuan, exaone,
                # chatglm, ...) are unknown to AutoConfig when their modeling
                # code isn't fetchable; the raw config.json carries every
                # field from_hf_config reads. (Reference relies on
                # trust_remote_code downloads; we stay offline.)
                import json
                import os
                from types import SimpleNamespace

                with open(os.path.join(model_path, "config.json")) as f:
                    hf_config = SimpleNamespace(**json.load(f))
                if not getattr(hf_config, "architectures", None):
                    raise
        if json_override_args and json_override_args != "{}":
            # reference server_args.json_model_override_args: a JSON dict
            # merged over the HF config (e.g. '{"rope_scaling": null}')
            import json

            for k, v in json.loads(json_override_args).items():
                setattr(hf_config, k, v)
        return cls.from_hf_config(
            hf_config, model_path=model_path, context_length=context_length,
            dtype=dtype, quantization=quantization,
        )
