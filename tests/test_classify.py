"""Classification / reward heads through the pooling path (reference:
srt/models/llama_classification.py, qwen2_rm.py; served via /classify)."""

import numpy as np
import torch

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.model_loader.loader import load_params


def test_llama_classification_scores_match_hf():
    from transformers import LlamaConfig, LlamaForSequenceClassification as HF

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, num_labels=3, pad_token_id=0,
    )
    cfg.architectures = ["LlamaForSequenceClassification"]
    torch.manual_seed(0)
    hf = HF(cfg).eval().float()

    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    assert mc.is_embedding
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)
    eng.runner.params = load_params(
        eng.runner.model, weights=list(hf.state_dict().items()))

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, size=11).tolist()
    got = np.asarray(eng.encode(input_ids=ids))
    with torch.no_grad():
        want = hf(input_ids=torch.tensor([ids])).logits[0].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qwen2_reward_scores():
    """No HF reference class exists for Qwen2ForRewardModel — build the value
    head by hand on a Qwen2 trunk (the sglang layout: score.0 / score.2)."""
    from transformers import Qwen2Config, Qwen2Model

    cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    cfg.architectures = ["Qwen2ForRewardModel"]
    torch.manual_seed(1)
    trunk = Qwen2Model(cfg).eval().float()
    head = torch.nn.Sequential(
        torch.nn.Linear(64, 64), torch.nn.ReLU(), torch.nn.Linear(64, 1)
    ).eval().float()

    weights = [("model." + k, v) for k, v in trunk.state_dict().items()]
    weights += [("score." + k, v) for k, v in head.state_dict().items()]

    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    eng = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc)
    eng.runner.params = load_params(eng.runner.model, weights=weights)

    rng = np.random.default_rng(1)
    ids = rng.integers(1, 128, size=9).tolist()
    got = np.asarray(eng.encode(input_ids=ids))
    with torch.no_grad():
        h = trunk(input_ids=torch.tensor([ids])).last_hidden_state[0, -1]
        want = head(h).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
