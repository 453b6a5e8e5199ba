"""Model registry: HF architecture string → model class.

Reference: python/sglang/srt/models/registry.py (auto-discovery by
architecture string). One TPU implementation often serves several reference
model files because differences are config-only (see models/llama.py)."""

from __future__ import annotations

from typing import Dict, Type

from semi_pd_tpu.config.model_config import ModelConfig

_REGISTRY: Dict[str, type] = {}


def register(*archs: str):
    def deco(cls):
        for a in archs:
            _REGISTRY[a] = cls
        return cls
    return deco


def get_model_class(architecture: str):
    _ensure_populated()
    if architecture not in _REGISTRY:
        raise ValueError(
            f"unsupported architecture {architecture!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[architecture]


def create_model(config: ModelConfig):
    return get_model_class(config.architecture)(config)


_populated = False


def _ensure_populated():
    global _populated
    if _populated:
        return
    _populated = True
    from semi_pd_tpu.models.llama import LlamaForCausalLM

    # Archs whose weights/blocks genuinely map onto the llama implementation
    # (verified: qkv/gate-up naming, rmsnorm, rope; qwen2 differs only by qkv
    # bias which ModelConfig detects). Do NOT add llama-lookalikes with
    # different weight naming here (internlm2's fused wqkv, exaone's c_fc...).
    for arch in (
        "LlamaForCausalLM",
        "MistralForCausalLM",
        "Qwen2ForCausalLM",
        "Qwen3ForCausalLM",
        # XVerse is llama-exact incl. weight naming (reference xverse.py)
        "XverseForCausalLM",
    ):
        _REGISTRY.setdefault(arch, LlamaForCausalLM)

    from semi_pd_tpu.models.llama_variants import (
        BaichuanForCausalLM,
        DeepseekForCausalLM,
        ExaoneForCausalLM,
        InternLM2ForCausalLM,
        InternLM2ForRewardModel,
        MiniCPMForCausalLM,
        QWenLMHeadModel,
        XverseMoeForCausalLM,
    )

    _REGISTRY.setdefault("InternLM2ForCausalLM", InternLM2ForCausalLM)
    _REGISTRY.setdefault("InternLM2ForRewardModel", InternLM2ForRewardModel)
    _REGISTRY.setdefault("ExaoneForCausalLM", ExaoneForCausalLM)
    _REGISTRY.setdefault("BaichuanForCausalLM", BaichuanForCausalLM)
    _REGISTRY.setdefault("BaiChuanForCausalLM", BaichuanForCausalLM)
    _REGISTRY.setdefault("QWenLMHeadModel", QWenLMHeadModel)
    _REGISTRY.setdefault("MiniCPMForCausalLM", MiniCPMForCausalLM)

    from semi_pd_tpu.models.llama_variants import MiniCPM3ForCausalLM

    _REGISTRY.setdefault("MiniCPM3ForCausalLM", MiniCPM3ForCausalLM)
    _REGISTRY.setdefault("XverseMoeForCausalLM", XverseMoeForCausalLM)
    _REGISTRY.setdefault("DeepseekForCausalLM", DeepseekForCausalLM)

    from semi_pd_tpu.models.glm import (
        ChatGLMForCausalLM,
        Glm4ForCausalLM,
        GlmForCausalLM,
    )

    from semi_pd_tpu.models.grok import Grok1ForCausalLM

    _REGISTRY.setdefault("Grok1ForCausalLM", Grok1ForCausalLM)
    _REGISTRY.setdefault("Grok1ModelForCausalLM", Grok1ForCausalLM)

    _REGISTRY.setdefault("GlmForCausalLM", GlmForCausalLM)
    _REGISTRY.setdefault("Glm4ForCausalLM", Glm4ForCausalLM)
    _REGISTRY.setdefault("ChatGLMModel", ChatGLMForCausalLM)
    _REGISTRY.setdefault("ChatGLMForConditionalGeneration", ChatGLMForCausalLM)
    _REGISTRY.setdefault("ChatGLMForCausalLM", ChatGLMForCausalLM)

    from semi_pd_tpu.models.qwen2_moe import (
        MixtralForCausalLM,
        OlmoeForCausalLM,
        Qwen2MoeForCausalLM,
        Qwen3MoeForCausalLM,
    )

    _REGISTRY.setdefault("Qwen2MoeForCausalLM", Qwen2MoeForCausalLM)
    _REGISTRY.setdefault("MixtralForCausalLM", MixtralForCausalLM)
    _REGISTRY.setdefault("Qwen3MoeForCausalLM", Qwen3MoeForCausalLM)
    _REGISTRY.setdefault("OlmoeForCausalLM", OlmoeForCausalLM)

    from semi_pd_tpu.models.phi3 import Phi3ForCausalLM
    from semi_pd_tpu.models.granite import GraniteForCausalLM

    _REGISTRY.setdefault("Phi3ForCausalLM", Phi3ForCausalLM)
    _REGISTRY.setdefault("GraniteForCausalLM", GraniteForCausalLM)

    from semi_pd_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM

    _REGISTRY.setdefault("DeepseekV2ForCausalLM", DeepseekV2ForCausalLM)
    _REGISTRY.setdefault("DeepseekV3ForCausalLM", DeepseekV2ForCausalLM)

    from semi_pd_tpu.models.gemma2 import Gemma2ForCausalLM, GemmaForCausalLM

    _REGISTRY.setdefault("Gemma2ForCausalLM", Gemma2ForCausalLM)
    _REGISTRY.setdefault("GemmaForCausalLM", GemmaForCausalLM)

    from semi_pd_tpu.models.layernorm_families import (
        CohereForCausalLM,
        Olmo2ForCausalLM,
        Phi3SmallForCausalLM,
        PhiForCausalLM,
        StableLmForCausalLM,
        Starcoder2ForCausalLM,
    )

    _REGISTRY.setdefault("Phi3SmallForCausalLM", Phi3SmallForCausalLM)

    _REGISTRY.setdefault("StableLmForCausalLM", StableLmForCausalLM)
    _REGISTRY.setdefault("StableLmEpochForCausalLM", StableLmForCausalLM)
    _REGISTRY.setdefault("Starcoder2ForCausalLM", Starcoder2ForCausalLM)
    _REGISTRY.setdefault("PhiForCausalLM", PhiForCausalLM)
    _REGISTRY.setdefault("CohereForCausalLM", CohereForCausalLM)
    _REGISTRY.setdefault("Olmo2ForCausalLM", Olmo2ForCausalLM)

    from semi_pd_tpu.models.gpt2 import GPT2LMHeadModel, GPTBigCodeForCausalLM

    _REGISTRY.setdefault("GPT2LMHeadModel", GPT2LMHeadModel)
    _REGISTRY.setdefault("GPTBigCodeForCausalLM", GPTBigCodeForCausalLM)

    from semi_pd_tpu.models.classify import (
        Gemma2ForSequenceClassification,
        LlamaForSequenceClassification,
        Qwen2ForRewardModel,
    )

    _REGISTRY.setdefault("LlamaForSequenceClassification", LlamaForSequenceClassification)
    _REGISTRY.setdefault("Gemma2ForSequenceClassification", Gemma2ForSequenceClassification)
    _REGISTRY.setdefault("Qwen2ForRewardModel", Qwen2ForRewardModel)

    from semi_pd_tpu.models.olmo_falcon_dbrx import (
        DbrxForCausalLM,
        FalconForCausalLM,
        OlmoForCausalLM,
    )

    _REGISTRY.setdefault("OlmoForCausalLM", OlmoForCausalLM)
    _REGISTRY.setdefault("FalconForCausalLM", FalconForCausalLM)
    _REGISTRY.setdefault("RWForCausalLM", FalconForCausalLM)
    _REGISTRY.setdefault("DbrxForCausalLM", DbrxForCausalLM)

    from semi_pd_tpu.models.llava import (
        LlavaForConditionalGeneration,
        LlavaVidForCausalLM,
        YiVLForCausalLM,
    )

    _REGISTRY.setdefault("LlavaForConditionalGeneration", LlavaForConditionalGeneration)

    from semi_pd_tpu.models.mllama import MllamaForConditionalGeneration

    _REGISTRY.setdefault("MllamaForConditionalGeneration", MllamaForConditionalGeneration)
    _REGISTRY.setdefault("LlavaLlamaForCausalLM", LlavaForConditionalGeneration)
    _REGISTRY.setdefault("YiVLForCausalLM", YiVLForCausalLM)
    _REGISTRY.setdefault("LlavaVidForCausalLM", LlavaVidForCausalLM)

    # Embedding trunks (reference llama_embedding.py LlamaEmbeddingModel /
    # MistralModel): the llama forward_embedding path serves them;
    # from_hf_config flags is_embedding for *Model archs.
    _REGISTRY.setdefault("LlamaEmbeddingModel", LlamaForCausalLM)
    _REGISTRY.setdefault("MistralModel", LlamaForCausalLM)
    _REGISTRY.setdefault("LlamaModel", LlamaForCausalLM)

    from semi_pd_tpu.models.qwen2_vl import Qwen2VLForConditionalGeneration

    _REGISTRY.setdefault("Qwen2VLForConditionalGeneration", Qwen2VLForConditionalGeneration)

    from semi_pd_tpu.models.qwen2_vl import Qwen2_5_VLForConditionalGeneration

    _REGISTRY.setdefault(
        "Qwen2_5_VLForConditionalGeneration", Qwen2_5_VLForConditionalGeneration
    )

    from semi_pd_tpu.models.minicpmv import MiniCPMVForCausalLM

    _REGISTRY.setdefault("MiniCPMV", MiniCPMVForCausalLM)
    _REGISTRY.setdefault("MiniCPMVForCausalLM", MiniCPMVForCausalLM)

    from semi_pd_tpu.models.janus import JanusProForCausalLM

    # HF in-library name + the original DeepSeek repo's architectures entry
    _REGISTRY.setdefault("JanusForConditionalGeneration", JanusProForCausalLM)
    _REGISTRY.setdefault("MultiModalityCausalLM", JanusProForCausalLM)
