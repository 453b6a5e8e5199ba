"""Qwen2-VL parity: tiny ViT + m-rope trunk vs HF, image features spliced
through the paged prefill (reference: srt/models/qwen2_vl.py)."""

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
def tiny_qwen2vl():
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration as HF

    cfg = Qwen2VLConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        image_token_id=IMG_TOK, video_token_id=101,
        vision_start_token_id=102, vision_end_token_id=103,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config={
            "embed_dim": 32, "depth": 2, "num_heads": 2, "mlp_ratio": 2,
            "patch_size": 4, "temporal_patch_size": 2,
            "spatial_merge_size": 2, "in_channels": 3, "hidden_size": 64,
        },
    )
    cfg.architectures = ["Qwen2VLForConditionalGeneration"]
    torch.manual_seed(0)
    hf = HF(cfg).eval().float()
    return hf, cfg


def _engine(hf, hf_cfg):
    mc = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    mc.architecture = "Qwen2VLForConditionalGeneration"
    mc.is_multimodal = True
    mc.hf_config = hf_cfg
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)
    eng.runner.params = load_params(
        eng.runner.model, weights=list(hf.state_dict().items()))
    return eng


def test_mrope_positions():
    """get_mrope_positions follows HF get_rope_index (images only)."""
    from transformers import Qwen2VLConfig
    from semi_pd_tpu.models.qwen2_vl import Qwen2VLForConditionalGeneration

    cfg = Qwen2VLConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=2, image_token_id=IMG_TOK,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config={"embed_dim": 32, "depth": 1, "num_heads": 2,
                       "patch_size": 4, "hidden_size": 64},
    )
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    mc.architecture = "Qwen2VLForConditionalGeneration"
    mc.hf_config = cfg
    m = Qwen2VLForConditionalGeneration(mc)
    # prompt: 2 text, 4 image tokens (grid 1x4x4 merged -> 2x2), 2 text
    ids = [5, 6] + [IMG_TOK] * 4 + [7, 8]
    pos, delta = m.get_mrope_positions(ids, [(1, 4, 4)])
    # text 0,1; image block base 2: t=2; h in {2,3}; w in {2,3}
    assert pos[0].tolist() == [0, 0, 0] and pos[1].tolist() == [1, 1, 1]
    assert pos[2].tolist() == [2, 2, 2] and pos[3].tolist() == [2, 2, 3]
    assert pos[4].tolist() == [2, 3, 2] and pos[5].tolist() == [2, 3, 3]
    assert pos[6].tolist() == [4, 4, 4] and pos[7].tolist() == [5, 5, 5]
    assert delta == 6 - 8


def test_qwen2_vl_logit_parity(tiny_qwen2vl):
    hf, hf_cfg = tiny_qwen2vl
    eng = _engine(hf, hf_cfg)
    model = eng.runner.model

    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 16, 16)).astype(np.float32)
    patches, grid = model.patchify(img)
    assert grid == (1, 4, 4) and patches.shape == (16, 96)
    n_img = model.n_image_tokens_for(grid)
    assert n_img == 4

    prompt = [5, 6, IMG_TOK, 7, 8, 9]
    expanded = [5, 6] + [IMG_TOK] * n_img + [7, 8, 9]

    with torch.no_grad():
        hf_logits = hf(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([[1, 4, 4]]),
        ).logits[0, -1].numpy()

    req = eng.make_request(
        input_ids=prompt,
        sampling_params=SamplingParams(max_new_tokens=1, temperature=0.0,
                                       ignore_eos=True),
        image_data={"pixel_values": patches, "image_grid_thw": [[1, 4, 4]]},
    )
    assert len(req.input_ids) == len(expanded)
    assert req.mrope_pos is not None and req.mrope_delta == int(
        req.mrope_pos.max() + 1 - len(expanded)
    )
    eng.scheduler.add_request(req)
    eng._run_until_done([req])
    assert req.output_ids[0] == int(hf_logits.argmax()), (
        req.output_ids, int(hf_logits.argmax())
    )


def test_qwen2_vl_greedy_continuation(tiny_qwen2vl):
    """Multi-token greedy decode (exercises the mrope delta on decode steps)
    matches HF stepwise teacher-forced argmax."""
    hf, hf_cfg = tiny_qwen2vl
    eng = _engine(hf, hf_cfg)
    model = eng.runner.model

    rng = np.random.default_rng(1)
    img = rng.normal(size=(3, 16, 16)).astype(np.float32)
    patches, grid = model.patchify(img)
    prompt = [5, 6, IMG_TOK, 7, 8, 9]
    expanded = [5, 6] + [IMG_TOK] * 4 + [7, 8, 9]

    ids = list(expanded)
    hf_toks = []
    with torch.no_grad():
        for _ in range(5):
            lg = hf(
                input_ids=torch.tensor([ids]),
                pixel_values=torch.tensor(patches),
                image_grid_thw=torch.tensor([[1, 4, 4]]),
            ).logits[0, -1]
            t = int(lg.argmax())
            hf_toks.append(t)
            ids.append(t)

    out = eng.generate(
        input_ids=prompt,
        image_data={"pixel_values": patches, "image_grid_thw": [[1, 4, 4]]},
        sampling_params=SamplingParams(max_new_tokens=5, temperature=0.0,
                                       ignore_eos=True),
    )
    assert out["output_ids"] == hf_toks
