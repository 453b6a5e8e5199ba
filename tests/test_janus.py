"""Janus-Pro parity vs transformers' in-library JanusForConditionalGeneration
(reference srt/models/deepseek_janus_pro.py — understanding path: SigLIP
tower -> MLP aligner -> llama trunk with features spliced at placeholders).
The VQ image-generation weights are intentionally unmatched (loader skips).
"""

import numpy as np
import pytest
import torch

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.model_loader.loader import load_params
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

IMG_TOK = 120


@pytest.fixture(scope="module")
def tiny_janus():
    from transformers import JanusConfig
    from transformers.models.janus.modeling_janus import (
        JanusForConditionalGeneration,
    )

    cfg = JanusConfig()
    cfg.image_token_id = IMG_TOK
    tc = cfg.text_config
    tc.vocab_size = 128
    tc.hidden_size = 64
    tc.intermediate_size = 128
    tc.num_hidden_layers = 2
    tc.num_attention_heads = 4
    tc.num_key_value_heads = 2
    tc.max_position_embeddings = 256
    tc.tie_word_embeddings = False
    vc = cfg.vision_config
    vc.hidden_size = 32
    vc.num_hidden_layers = 2
    vc.num_attention_heads = 2
    vc.image_size = 32
    vc.patch_size = 8
    vc.projection_dim = 64
    vc.depth = 2
    vc.num_image_tokens = 16
    cfg.architectures = ["JanusForConditionalGeneration"]
    torch.manual_seed(7)
    hf = JanusForConditionalGeneration(cfg).eval().float()
    return cfg, hf


def test_janus_greedy_parity(tiny_janus):
    cfg, hf = tiny_janus
    from semi_pd_tpu.models.registry import get_model_class

    assert get_model_class(
        "JanusForConditionalGeneration").__name__ == "JanusProForCausalLM"

    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    assert mc.architecture == "JanusForConditionalGeneration"
    assert mc.is_multimodal
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)
    eng.runner.params = load_params(
        eng.runner.model, weights=list(hf.state_dict().items()))

    model = eng.runner.model
    assert model.n_image_tokens == 16

    rng = np.random.default_rng(8)
    img = rng.normal(size=(3, 32, 32)).astype(np.float32)

    prompt = [5, 6, IMG_TOK, 7, 8]
    expanded = [5, 6] + [IMG_TOK] * 16 + [7, 8]
    ids = list(expanded)
    hf_toks = []
    with torch.no_grad():
        for _ in range(4):
            lg = hf(
                input_ids=torch.tensor([ids]),
                pixel_values=torch.tensor(img)[None],
            ).logits[0, -1]
            t = int(lg.argmax())
            hf_toks.append(t)
            ids.append(t)

    out = eng.generate(
        input_ids=prompt,
        image_data=img,
        sampling_params=SamplingParams(max_new_tokens=4, temperature=0.0,
                                       ignore_eos=True),
    )
    assert out["output_ids"] == hf_toks


def test_janus_aligner_features_match(tiny_janus):
    cfg, hf = tiny_janus
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=512, dtype="float32"), model_config=mc)
    eng.runner.params = load_params(
        eng.runner.model, weights=list(hf.state_dict().items()))

    rng = np.random.default_rng(9)
    img = rng.normal(size=(3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = hf.model.get_image_features(torch.tensor(img)[None]).numpy()[0]
    got = np.asarray(eng.runner.model.encode_images(
        eng.runner.params, np.asarray(img)[None]))[0]
    np.testing.assert_allclose(got, want, atol=2e-4)
