"""Yi-VL and LLaVA-Vid (reference srt/models/{yivl,llavavid}.py). No HF
in-library classes exist; the projector compositions are verified against
direct numpy evaluation over the same loaded weights, the checkpoint naming
by loading renamed tensors, and the serving path by engine e2e generation."""

import numpy as np
import pytest

import jax.numpy as jnp

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.config.server_args import ServerArgs
from semi_pd_tpu.runtime.engine import Engine
from semi_pd_tpu.sampling.sampling_params import SamplingParams

IMG_TOK = 100


def _mk_config(arch, **extra):
    from transformers import CLIPVisionConfig, LlamaConfig, LlavaConfig

    vision = CLIPVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, image_size=32, patch_size=16,
        projection_dim=32,
    )
    text = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    cfg = LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=IMG_TOK,
        vision_feature_layer=-2,
    )
    cfg.architectures = [arch]
    for k, v in extra.items():
        setattr(cfg, k, v)
    mc = ModelConfig.from_hf_config(cfg, dtype="float32")
    mc.architecture = arch
    mc.is_multimodal = True
    mc.hf_config = cfg
    return mc


def _engine(mc):
    return Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=2048, dtype="float32"), model_config=mc)


def _np_ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def np_gelu_exact(x):
    import math

    return 0.5 * x * (1 + np.vectorize(math.erf)(x / np.sqrt(2)))


def test_yivl_projector_math():
    mc = _mk_config("YiVLForCausalLM")
    eng = _engine(mc)
    model = eng.runner.model
    params = eng.runner.params

    rng = np.random.default_rng(0)
    px = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    got = np.asarray(model.encode_images(params, jnp.asarray(px)))

    feats = np.asarray(model.tower.forward(
        params["vision"], jnp.asarray(px), model.select_layer))
    p = params["proj"]
    x = feats @ np.asarray(p["fc1"]["w"]) + np.asarray(p["fc1"]["b"])
    x = _np_ln(x, np.asarray(p["ln1"]["w"]), np.asarray(p["ln1"]["b"]))
    x = np_gelu_exact(x)
    x = x @ np.asarray(p["fc2"]["w"]) + np.asarray(p["fc2"]["b"])
    want = _np_ln(x, np.asarray(p["ln2"]["w"]), np.asarray(p["ln2"]["b"]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_yivl_weight_names_load():
    mc = _mk_config("YiVLForCausalLM")
    eng = _engine(mc)
    model = eng.runner.model
    Ht, Hv = 64, 48
    rng = np.random.default_rng(1)
    w0 = rng.normal(size=(Ht, Hv)).astype(np.float32)
    w1 = rng.normal(size=(Ht,)).astype(np.float32)
    from semi_pd_tpu.model_loader.loader import update_params

    eng.runner.params = update_params(model, eng.runner.params, [
        ("model.mm_projector.0.weight", w0),
        ("model.mm_projector.1.weight", w1),
    ])
    np.testing.assert_allclose(
        np.asarray(eng.runner.params["proj"]["fc1"]["w"]), w0.T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(eng.runner.params["proj"]["ln1"]["w"]), w1, rtol=1e-6)


def test_yivl_engine_e2e():
    mc = _mk_config("YiVLForCausalLM")
    eng = _engine(mc)
    rng = np.random.default_rng(2)
    img = rng.normal(size=(3, 32, 32)).astype(np.float32)
    out = eng.generate(
        input_ids=[5, 6, IMG_TOK, 7],
        image_data=img,
        sampling_params=SamplingParams(max_new_tokens=3, temperature=0.0,
                                       ignore_eos=True))
    assert len(out["output_ids"]) == 3


def test_llavavid_pooling_math():
    mc = _mk_config("LlavaVidForCausalLM", mm_spatial_pool_stride=2,
                    num_frames=3)
    eng = _engine(mc)
    model = eng.runner.model
    # 32/16 = 2x2 patches per frame; stride 2 -> 1 token per frame
    assert model.n_image_tokens == 3 * 1
    params = eng.runner.params

    rng = np.random.default_rng(3)
    px = rng.normal(size=(3, 3, 32, 32)).astype(np.float32)
    got = np.asarray(model.encode_images(params, jnp.asarray(px)))
    assert got.shape == (3, 1, 64)

    feats = np.asarray(model.tower.forward(
        params["vision"], jnp.asarray(px), model.select_layer))  # [3, 4, Hv]
    pooled = feats.reshape(3, 1, 2, 1, 2, -1).mean(axis=(2, 4)).reshape(3, 1, -1)
    p = params["proj"]
    x = pooled @ np.asarray(p["fc1"]["w"]) + np.asarray(p["fc1"]["b"])
    want = np_gelu_exact(x) @ np.asarray(p["fc2"]["w"]) + np.asarray(p["fc2"]["b"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_llavavid_engine_e2e():
    mc = _mk_config("LlavaVidForCausalLM", mm_spatial_pool_stride=2,
                    num_frames=3)
    eng = _engine(mc)
    rng = np.random.default_rng(4)
    frames = [rng.normal(size=(3, 32, 32)).astype(np.float32) for _ in range(3)]
    out = eng.generate(
        input_ids=[5, IMG_TOK, 7, 8],
        image_data=frames,
        sampling_params=SamplingParams(max_new_tokens=3, temperature=0.0,
                                       ignore_eos=True))
    assert len(out["output_ids"]) == 3
