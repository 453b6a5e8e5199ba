"""Qwen2.5-VL parity vs HF (reference srt/models/qwen2_5_vl.py): windowed
RMSNorm/SwiGLU ViT + M-RoPE trunk. The tiny config uses a 2-block ViT with
block 1 full-attention (fullatt_block_indexes=[1]) and a window that splits
the 8x8-patch image into 4 windows, so the window mask and the
permute/un-permute path are genuinely exercised."""

import numpy as np
import pytest
import torch

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.model_loader.loader import load_params
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

IMG_TOK = 100


@pytest.fixture(scope="module")
def tiny_qwen25vl():
    from transformers import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration as HF,
    )

    cfg = Qwen2_5_VLConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        image_token_id=IMG_TOK, video_token_id=101,
        vision_start_token_id=102, vision_end_token_id=103,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config={
            "hidden_size": 32, "intermediate_size": 64, "depth": 2,
            "num_heads": 2, "patch_size": 4, "temporal_patch_size": 2,
            "spatial_merge_size": 2, "in_channels": 3,
            "out_hidden_size": 64,
            # window = 2 merged tokens per side (2*2*4 px): 8x8-patch image
            # -> 4x4 merged -> 2x2 windows of 2x2
            "window_size": 16,
            "fullatt_block_indexes": [1],
        },
    )
    cfg.architectures = ["Qwen2_5_VLForConditionalGeneration"]
    torch.manual_seed(0)
    hf = HF(cfg).eval().float()
    return hf, cfg


def _engine(hf, hf_cfg):
    mc = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    mc.architecture = "Qwen2_5_VLForConditionalGeneration"
    mc.is_multimodal = True
    mc.hf_config = hf_cfg
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)
    eng.runner.params = load_params(
        eng.runner.model, weights=list(hf.state_dict().items()))
    return eng


def test_qwen25_vl_greedy_parity(tiny_qwen25vl):
    hf, hf_cfg = tiny_qwen25vl
    eng = _engine(hf, hf_cfg)
    model = eng.runner.model

    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 32, 32)).astype(np.float32)  # 8x8 patches
    patches, grid = model.patchify(img)
    assert grid == (1, 8, 8)
    n_img = model.n_image_tokens_for(grid)
    assert n_img == 16

    prompt = [5, 6, IMG_TOK, 7, 8, 9]
    expanded = [5, 6] + [IMG_TOK] * n_img + [7, 8, 9]

    ids = list(expanded)
    hf_toks = []
    with torch.no_grad():
        for _ in range(4):
            lg = hf(
                input_ids=torch.tensor([ids]),
                pixel_values=torch.tensor(patches),
                image_grid_thw=torch.tensor([[1, 8, 8]]),
            ).logits[0, -1]
            t = int(lg.argmax())
            hf_toks.append(t)
            ids.append(t)

    out = eng.generate(
        input_ids=prompt,
        image_data={"pixel_values": patches, "image_grid_thw": [[1, 8, 8]]},
        sampling_params=SamplingParams(max_new_tokens=4, temperature=0.0,
                                       ignore_eos=True),
    )
    assert out["output_ids"] == hf_toks


def test_window_index_matches_hf(tiny_qwen25vl):
    hf, hf_cfg = tiny_qwen25vl
    eng = _engine(hf, hf_cfg)
    tower = eng.runner.model.tower
    win_idx, counts = tower._window_index(1, 8, 8)
    hf_idx, hf_cu = hf.model.visual.get_window_index(torch.tensor([[1, 8, 8]]))
    np.testing.assert_array_equal(win_idx, hf_idx.numpy())
    hf_cu = np.unique(np.asarray(hf_cu))
    np.testing.assert_array_equal(np.cumsum(counts), hf_cu[1:])
