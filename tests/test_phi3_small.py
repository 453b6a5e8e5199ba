"""Phi-3-small parity (reference srt/models/phi3_small.py).

No in-library HF model exists (trust_remote_code tiktoken model), so the
parity target is a torch recomposition of the published math: LayerNorm
blocks, fused INTERLEAVED query_key_value (per-kv-head [q..q, k, v] head
grouping), biased dense, gegelu MLP over interleaved gelu/linear channels,
muP scalars (attn scale, embedding multiplier, logits width divisor),
linear rope position scaling, and dummy-token logit masking. This
independently validates the load-time de-interleave transforms and the
fused hot path. (The reference serves phi-3-small with dense attention —
its blocksparse params are computed but never wired; see model docstring.)
"""

import math
import types

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.model_loader.loader import load_params
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

H, NH, NKV, D, I, L, V = 64, 4, 2, 16, 48, 2, 128
MUP_ATTN, MUP_EMB, MUP_W = 2.0, 1.5, 2.0
LIMIT, BASE, POS_SCALE = 1.0, 10000.0, 0.5
DUMMY = [100, 101]


def _cfg():
    return types.SimpleNamespace(
        architectures=["Phi3SmallForCausalLM"],
        vocab_size=V, hidden_size=H, intermediate_size=I,
        num_hidden_layers=L, num_attention_heads=NH, num_key_value_heads=NKV,
        max_position_embeddings=256, layer_norm_epsilon=1e-5,
        hidden_act="gegelu", gegelu_limit=LIMIT,
        rope_embedding_base=BASE, rope_position_scale=POS_SCALE,
        mup_use_scaling=True, mup_attn_multiplier=MUP_ATTN,
        mup_embedding_multiplier=MUP_EMB, mup_width_multiplier=MUP_W,
        dummy_token_indices=DUMMY, tie_word_embeddings=False,
    )


class TorchPhi3Small(nn.Module):
    """Reference-faithful torch recomposition (phi3_small.py forward path)."""

    def __init__(self):
        super().__init__()
        g = NH // NKV
        self.embed = nn.Embedding(V, H)
        self.layers = nn.ModuleList()
        for _ in range(L):
            lyr = nn.Module()
            lyr.ln1 = nn.LayerNorm(H, eps=1e-5)
            lyr.qkv = nn.Linear(H, NKV * (g + 2) * D)
            lyr.dense = nn.Linear(NH * D, H)
            lyr.ln2 = nn.LayerNorm(H, eps=1e-5)
            lyr.up = nn.Linear(H, 2 * I)
            lyr.down = nn.Linear(I, H)
            self.layers.append(lyr)
        self.final_ln = nn.LayerNorm(H, eps=1e-5)
        self.lm_head = nn.Linear(H, V, bias=False)

    @staticmethod
    def _rope(x, pos):
        # neox-style full-dim rotation, linear scaling by POS_SCALE
        inv = 1.0 / BASE ** (torch.arange(0, D, 2, dtype=torch.float64) / D)
        f = pos[:, None].double() * inv * POS_SCALE
        cos = f.cos().float()[:, None, :]
        sin = f.sin().float()[:, None, :]
        x1, x2 = x[..., : D // 2], x[..., D // 2:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)

    def forward(self, ids):
        g = NH // NKV
        T = ids.shape[0]
        pos = torch.arange(T)
        h = self.embed(ids) * MUP_EMB
        scale = MUP_ATTN / D
        causal = torch.tril(torch.ones(T, T, dtype=torch.bool))
        for lyr in self.layers:
            x = lyr.ln1(h)
            qkv = lyr.qkv(x).view(T, NKV, g + 2, D)
            q = qkv[:, :, :g].reshape(T, NH, D)
            k = qkv[:, :, g]
            v = qkv[:, :, g + 1]
            q, k = self._rope(q, pos), self._rope(k, pos)
            k = k.repeat_interleave(g, dim=1)
            v = v.repeat_interleave(g, dim=1)
            att = torch.einsum("qhd,khd->hqk", q, k) * scale
            att = att.masked_fill(~causal, float("-inf")).softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(T, NH * D)
            h = h + lyr.dense(o)
            x = lyr.ln2(h)
            gu = lyr.up(x)
            a_g, a_u = gu[..., 0::2], gu[..., 1::2]
            a_g = a_g.clamp(max=LIMIT)
            a_u = a_u.clamp(-LIMIT, LIMIT)
            h = h + lyr.down(a_g * torch.sigmoid(1.702 * a_g) * (a_u + 1))
        logits = self.lm_head(self.final_ln(h)) / MUP_W
        logits[..., DUMMY] = float("-inf")
        return logits

    def hf_state_dict(self):
        sd = {"model.embed_tokens.weight": self.embed.weight,
              "model.final_layernorm.weight": self.final_ln.weight,
              "model.final_layernorm.bias": self.final_ln.bias,
              "lm_head.weight": self.lm_head.weight}
        for i, lyr in enumerate(self.layers):
            p = f"model.layers.{i}."
            sd.update({
                p + "input_layernorm.weight": lyr.ln1.weight,
                p + "input_layernorm.bias": lyr.ln1.bias,
                p + "self_attn.query_key_value.weight": lyr.qkv.weight,
                p + "self_attn.query_key_value.bias": lyr.qkv.bias,
                p + "self_attn.dense.weight": lyr.dense.weight,
                p + "self_attn.dense.bias": lyr.dense.bias,
                p + "post_attention_layernorm.weight": lyr.ln2.weight,
                p + "post_attention_layernorm.bias": lyr.ln2.bias,
                p + "mlp.up_proj.weight": lyr.up.weight,
                p + "mlp.up_proj.bias": lyr.up.bias,
                p + "mlp.down_proj.weight": lyr.down.weight,
                p + "mlp.down_proj.bias": lyr.down.bias,
            })
        return {k: v.detach() for k, v in sd.items()}


def test_phi3_small_greedy_parity():
    from semi_pd_tpu.models.registry import get_model_class

    assert get_model_class(
        "Phi3SmallForCausalLM").__name__ == "Phi3SmallForCausalLM"

    torch.manual_seed(11)
    ref = TorchPhi3Small().eval().float()

    mc = ModelConfig.from_hf_config(_cfg(), dtype="float32")
    assert mc.rope_scaling == {"rope_type": "linear", "factor": POS_SCALE}
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)
    eng.runner.params = load_params(
        eng.runner.model, weights=list(ref.hf_state_dict().items()))

    model = eng.runner.model
    assert abs(model.scale - MUP_ATTN / D) < 1e-9
    assert model.embed_scale == MUP_EMB and model.logits_div == MUP_W
    assert model.logit_bias is not None and model.logit_bias[DUMMY[0]] < -1e29

    prompt = [5, 6, 7, 8, 9]
    ids = list(prompt)
    ref_toks = []
    with torch.no_grad():
        for _ in range(6):
            t = int(ref(torch.tensor(ids)).argmax(-1)[-1])
            ref_toks.append(t)
            ids.append(t)

    out = eng.generate(
        input_ids=prompt,
        sampling_params=SamplingParams(max_new_tokens=6, temperature=0.0,
                                       ignore_eos=True),
    )
    assert out["output_ids"] == ref_toks
