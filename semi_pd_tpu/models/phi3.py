"""Phi-3 (mini/medium) causal LM.

Reference: srt/models/ (phi3 served via llama-compatible path; HF
Phi3ForCausalLM). Structurally llama with two fused checkpoint tensors:
``self_attn.qkv_proj.weight`` = [q;k;v] rows and ``mlp.gate_up_proj.weight``
= [gate;up] rows — both transpose directly onto our fused layouts, so the
weight plan is a pure remap. LongRoPE scaling supported (ops/rope.py longrope branch)."""

from __future__ import annotations

from typing import Any, Dict

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.models.llama import LlamaForCausalLM


class Phi3ForCausalLM(LlamaForCausalLM):
    def hf_weight_plan(self) -> Dict[str, Any]:
        plan = super().hf_weight_plan()
        for k in list(plan):
            if ".self_attn.q_proj" in k or ".self_attn.k_proj" in k or \
               ".self_attn.v_proj" in k or ".mlp.gate_proj" in k or \
               ".mlp.up_proj" in k:
                del plan[k]
        plan["model.layers.{L}.self_attn.qkv_proj.weight"] = (
            "layers.qkv_proj.w", None, "t",
        )
        plan["model.layers.{L}.mlp.gate_up_proj.weight"] = (
            "layers.gate_up.w", None, "t",
        )
        return plan
