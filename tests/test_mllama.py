"""Mllama (Llama 3.2 Vision) parity vs HF (reference srt/models/mllama.py):
cross-attention text trunk + two-stage gated vision encoder. Greedy decode
must match transformers token-for-token with an image, and text-only
requests must batch through the same engine (cross layers identity)."""

import numpy as np
import pytest
import torch

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.model_loader.loader import load_params
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

IMG_TOK = 119  # within the +8 extra embed rows (vocab 112 -> 120 rows)


@pytest.fixture(scope="module")
def tiny_mllama():
    from transformers import MllamaConfig, MllamaForConditionalGeneration as HF
    from transformers.models.mllama.configuration_mllama import (
        MllamaTextConfig,
        MllamaVisionConfig,
    )

    vision = MllamaVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_global_layers=2, attention_heads=2, image_size=16, patch_size=8,
        max_num_tiles=2, supported_aspect_ratios=[[1, 1], [1, 2], [2, 1]],
        intermediate_layers_indices=[1, 2], num_channels=3,
        vision_output_dim=96,  # hidden * (1 + 2 intermediates)
    )
    text = MllamaTextConfig(
        vocab_size=112, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        cross_attention_layers=[1, 3], max_position_embeddings=256,
        rope_theta=10000.0, rope_scaling={"rope_type": "default"},
        tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    cfg = MllamaConfig(vision_config=vision, text_config=text,
                       image_token_index=IMG_TOK)
    cfg.architectures = ["MllamaForConditionalGeneration"]
    torch.manual_seed(0)
    hf = HF(cfg).eval().float()
    return hf, cfg


def _engine(hf, hf_cfg):
    mc = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    mc.architecture = "MllamaForConditionalGeneration"
    mc.is_multimodal = True
    mc.hf_config = hf_cfg
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)
    eng.runner.params = load_params(
        eng.runner.model, weights=list(hf.state_dict().items()))
    return eng


def _hf_greedy(hf, ids, px, ar_ids, ar_mask, n, cross_mask):
    toks = []
    ids = list(ids)
    with torch.no_grad():
        for _ in range(n):
            out = hf(
                input_ids=torch.tensor([ids]),
                pixel_values=px, aspect_ratio_ids=ar_ids,
                aspect_ratio_mask=ar_mask,
                cross_attention_mask=cross_mask(len(ids)),
            )
            t = int(out.logits[0, -1].argmax())
            toks.append(t)
            ids.append(t)
    return toks


def test_mllama_image_greedy_parity(tiny_mllama):
    hf, cfg = tiny_mllama
    eng = _engine(hf, cfg)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 16, 16)).astype(np.float32)  # one 16x16 tile
    # HF input: [B, n_images, n_tiles, C, H, W] with 1 real tile of 2 max
    px = torch.zeros(1, 1, 2, 3, 16, 16)
    px[0, 0, 0] = torch.tensor(img)
    ar_ids = torch.tensor([[1]])  # aspect ratio [1,1]
    ar_mask = torch.tensor([[[1, 0]]])

    prompt = [IMG_TOK, 5, 6, 7]

    def cross_mask(seq_len):
        # every text token attends the single image (prompt starts with it)
        m = torch.ones(1, seq_len, 1, 2, dtype=torch.long)
        m[..., 1] = 0  # second tile is padding
        return m

    want = _hf_greedy(hf, prompt, px, ar_ids, ar_mask, 5, cross_mask)

    out = eng.generate(
        input_ids=prompt,
        image_data={"pixel_values": px[0, 0].numpy(),
                    "aspect_ratio_ids": [[1]]},
        sampling_params=SamplingParams(max_new_tokens=5, temperature=0.0,
                                       ignore_eos=True),
    )
    assert out["output_ids"] == want, (out["output_ids"], want)


def test_mllama_text_only_and_mixed_batch(tiny_mllama):
    hf, cfg = tiny_mllama
    eng = _engine(hf, cfg)

    prompt = [5, 6, 7, 8, 9]
    ids = list(prompt)
    want = []
    with torch.no_grad():
        for _ in range(4):
            t = int(hf(input_ids=torch.tensor([ids])).logits[0, -1].argmax())
            want.append(t)
            ids.append(t)

    out = eng.generate(
        input_ids=prompt,
        sampling_params=SamplingParams(max_new_tokens=4, temperature=0.0,
                                       ignore_eos=True),
    )
    assert out["output_ids"] == want

    # mixed batch: one image request + one text request decode together
    rng = np.random.default_rng(1)
    img = rng.normal(size=(3, 16, 16)).astype(np.float32)
    sp = SamplingParams(max_new_tokens=4, temperature=0.0, ignore_eos=True)
    r_img = eng.make_request(
        input_ids=[IMG_TOK, 9, 8], sampling_params=sp,
        image_data={"pixel_values": img[None], "aspect_ratio_ids": [[1]]})
    r_txt = eng.make_request(input_ids=prompt, sampling_params=sp)
    eng.scheduler.add_request(r_img)
    eng.scheduler.add_request(r_txt)
    eng._run_until_done([r_img, r_txt])
    assert r_txt.output_ids == want  # image neighbor didn't perturb text rows
    assert len(r_img.output_ids) == 4
