"""MiniCPM-V parity (reference srt/models/minicpmv.py).

No in-library HF MiniCPMV exists (trust_remote_code), so parity splits:
- vision tower vs transformers' in-library Idefics2VisionTransformer,
- perceiver resampler vs torch.nn.MultiheadAttention composed exactly as
  the reference Resampler2_5 does,
- end-to-end greedy vs an HF Qwen2 trunk driven with inputs_embeds where
  the resampled image features are spliced at the placeholder positions.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.model_loader.loader import load_params
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

IMG_TOK = 120


def _vision_cfg():
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2VisionConfig,
    )

    return Idefics2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=4,
        hidden_act="gelu_pytorch_tanh",
    )


@pytest.fixture(scope="module")
def hf_tower():
    from transformers.models.idefics2.modeling_idefics2 import (
        Idefics2VisionTransformer,
    )

    torch.manual_seed(0)
    return Idefics2VisionTransformer(_vision_cfg()).eval().float()


def test_idefics2_tower_parity(hf_tower):
    from semi_pd_tpu.models.minicpmv import Idefics2VisionTower

    tower = Idefics2VisionTower(_vision_cfg(), "float32")
    # route the HF state dict through the wrapper-style plan manually
    plan = tower.hf_weight_plan()
    params = _load_subtree(tower.param_specs(), plan, hf_tower.state_dict(),
                           conv_tf=True)

    rng = np.random.default_rng(1)
    img = rng.normal(size=(3, 32, 32)).astype(np.float32)
    mine = np.asarray(tower.forward(params, img))
    with torch.no_grad():
        ref = hf_tower(torch.tensor(img)[None]).last_hidden_state[0].numpy()
    np.testing.assert_allclose(mine, ref, atol=2e-4)


class _TorchResampler(nn.Module):
    """Reference Resampler2_5 recomposed from torch primitives
    (minicpmv.py:549: kv_proj -> ln_kv, ln_q(query), MHA(q, k+pos, v),
    ln_post, @ proj)."""

    def __init__(self, Q, E, H, kv_dim):
        super().__init__()
        self.query = nn.Parameter(torch.randn(Q, E) * 0.1)
        self.kv_proj = nn.Linear(kv_dim, E, bias=False)
        self.attn = nn.MultiheadAttention(E, H)
        self.ln_q = nn.LayerNorm(E, eps=1e-6)
        self.ln_kv = nn.LayerNorm(E, eps=1e-6)
        self.ln_post = nn.LayerNorm(E, eps=1e-6)
        self.proj = nn.Parameter(torch.randn(E, E) * E ** -0.5)

    def forward(self, x, pos):  # x [L, kv_dim], pos [L, E]
        x = self.kv_proj(x)
        x = self.ln_kv(x).unsqueeze(1)          # [L, 1, E]
        q = self.ln_q(self.query).unsqueeze(1)  # [Q, 1, E]
        out = self.attn(q, x + pos.unsqueeze(1), x)[0]  # [Q, 1, E]
        return self.ln_post(out[:, 0]) @ self.proj


def test_resampler_parity():
    from semi_pd_tpu.models.minicpmv import (
        Resampler25,
        get_2d_sincos_pos_embed,
    )

    Q, E, H, KV, gh, gw = 4, 16, 2, 12, 3, 5
    torch.manual_seed(2)
    ref = _TorchResampler(Q, E, H, KV).eval().float()

    mine = Resampler25(Q, E, H, KV, "float32")
    params = _load_subtree(mine.param_specs(), mine.hf_weight_plan(),
                           ref.state_dict())

    rng = np.random.default_rng(3)
    feats = rng.normal(size=(gh * gw, KV)).astype(np.float32)
    pos = get_2d_sincos_pos_embed(E, gh, gw).reshape(-1, E).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(feats), torch.tensor(pos)).numpy()
    got = np.asarray(mine.forward(params, feats, (gh, gw)))
    np.testing.assert_allclose(got, want, atol=2e-4)


# --------------------------------------------------------------- end-to-end
@pytest.fixture(scope="module")
def tiny_minicpmv():
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from transformers.models.idefics2.modeling_idefics2 import (
        Idefics2VisionTransformer,
    )

    cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    cfg.architectures = ["MiniCPMV"]
    cfg.vision_config = _vision_cfg()
    cfg.version = 2.6
    cfg.query_num = 4
    cfg.image_token_index = IMG_TOK
    torch.manual_seed(4)
    trunk = Qwen2ForCausalLM(cfg).eval().float()
    tower = Idefics2VisionTransformer(cfg.vision_config).eval().float()
    resampler = _TorchResampler(4, 64, 1, 32).eval().float()
    return cfg, trunk, tower, resampler


def test_minicpmv_greedy_parity(tiny_minicpmv):
    cfg, trunk, tower, resampler = tiny_minicpmv
    from semi_pd_tpu.models.minicpmv import get_2d_sincos_pos_embed
    from semi_pd_tpu.models.registry import get_model_class

    assert get_model_class("MiniCPMV").__name__ == "MiniCPMVForCausalLM"

    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    assert mc.architecture == "MiniCPMV"
    mc.is_multimodal = True
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)

    sd = {}
    sd.update({"llm." + k: v for k, v in trunk.state_dict().items()})
    sd.update({"vpm." + k: v for k, v in tower.state_dict().items()})
    sd.update({"resampler." + k: v for k, v in resampler.state_dict().items()})
    eng.runner.params = load_params(eng.runner.model, weights=list(sd.items()))

    model = eng.runner.model
    assert model.n_image_tokens == 4
    assert model.lm.config.attention_bias  # qwen2 trunk keeps qkv bias

    rng = np.random.default_rng(5)
    img = rng.normal(size=(3, 32, 32)).astype(np.float32)

    # torch side: tower -> resampler -> splice into trunk embeddings
    with torch.no_grad():
        feats = tower(torch.tensor(img)[None]).last_hidden_state[0]
        pos = get_2d_sincos_pos_embed(64, 8, 8).reshape(-1, 64)
        vis = resampler(feats, torch.tensor(pos, dtype=torch.float32))

    prompt = [5, 6, IMG_TOK, 7, 8]
    expanded = [5, 6] + [IMG_TOK] * 4 + [7, 8]
    ids = list(expanded)
    hf_toks = []
    with torch.no_grad():
        for _ in range(4):
            emb = trunk.model.embed_tokens(torch.tensor([ids]))
            emb[0, 2:6] = vis[: 4]
            t = int(trunk(inputs_embeds=emb).logits[0, -1].argmax())
            hf_toks.append(t)
            ids.append(t)

    out = eng.generate(
        input_ids=prompt,
        image_data=img,
        sampling_params=SamplingParams(max_new_tokens=4, temperature=0.0,
                                       ignore_eos=True),
    )
    assert out["output_ids"] == hf_toks


# ------------------------------------------------------------------ helpers
def _load_subtree(specs, plan, state_dict, conv_tf=False):
    """Mini weight loader for standalone submodules: applies the same plan
    semantics (templated {L} names, 't' transpose, conv flatten) the real
    loader uses, without needing a full model object."""
    import jax
    import jax.numpy as jnp

    leaves = {}

    def _set(path, arr):
        leaves[path] = np.asarray(arr)

    n_layers = 0
    for k in plan:
        if "{L}" in k:
            spec = specs
            for part in plan[k][0].split("."):
                spec = spec[part]
            n_layers = spec.shape[0]
            break

    stacked = {}
    for name, t in state_dict.items():
        arr = t.detach().numpy()
        matched = None
        for tmpl, (path, _sl, tf) in plan.items():
            if "{L}" in tmpl:
                pre, post = tmpl.split("{L}")
                if name.startswith(pre) and name.endswith(post):
                    mid = name[len(pre):]
                    lid = int(mid[: mid.index(".")] if "." in mid else mid[: len(mid) - len(post)])
                    matched = (path, tf, lid)
                    break
            elif tmpl == name:
                matched = (path, tf, None)
                break
        assert matched is not None, f"unmatched weight {name}"
        path, tf, lid = matched
        if tf == "t":
            arr = arr.T
        elif tf == "mllama_conv":
            arr = arr.reshape(arr.shape[0], -1).T
            path = path + ".w"  # postprocess-dict key joins the plan path
        if lid is None:
            _set(path, arr)
        else:
            stacked.setdefault(path, {})[lid] = arr

    for path, by_layer in stacked.items():
        _set(path, np.stack([by_layer[i] for i in range(n_layers)]))

    params = jax.tree.map(lambda s: None, specs,
                          is_leaf=lambda x: hasattr(x, "shape"))

    def _assign(tree, path, arr):
        parts = path.split(".")
        for p in parts[:-1]:
            tree = tree[p]
        spec = None
        node = specs
        for p in parts:
            node = node[p]
        spec = node
        assert tuple(spec.shape) == arr.shape, (path, spec.shape, arr.shape)
        tree[parts[-1]] = jnp.asarray(arr, spec.dtype)

    for path, arr in leaves.items():
        _assign(params, path, arr)
    return params


def test_minicpmv_20_uses_minicpm_trunk():
    """version < 2.5 routes to the MiniCPM trunk with its muP-style scales
    (reference minicpmv.py init_llm picks MiniCPMForCausalLM)."""
    from transformers import LlamaConfig

    from semi_pd_tpu.models.minicpmv import MiniCPMVForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        tie_word_embeddings=True,
    )
    cfg.architectures = ["MiniCPMV"]
    cfg.vision_config = _vision_cfg()
    cfg.version = 2.0
    cfg.query_num = 4
    cfg.image_token_index = IMG_TOK
    cfg.scale_emb = 12.0
    cfg.scale_depth = 1.4
    cfg.dim_model_base = 32

    from semi_pd_tpu.config.model_config import ModelConfig as MC

    model = MiniCPMVForCausalLM(MC.from_hf_config(cfg, dtype="float32"))
    assert type(model.lm).__name__ == "MiniCPMForCausalLM"
    assert model.lm.embed_scale == 12.0
    assert model.lm.logits_div == 64 / 32
    assert not model.lm.config.attention_bias
    assert model.n_image_tokens == 4
