"""GGUF loading (reference: srt/model_loader/loader.py gguf path +
weight_utils.py gguf_quant_weights_iterator — delegated to the gguf package
there; parsed from scratch in model_loader/gguf_reader.py here).

The test writes real GGUF v3 containers (header, metadata KVs, tensor infos,
aligned data section, llama.cpp tensor names + rope permutation) and checks:
tensor-level encode/decode roundtrips for every supported encoding, and
end-to-end engine parity: engine-from-.gguf == engine-from-state_dict."""

import struct

import numpy as np
import pytest

# ------------------------------------------------------------- GGUF writer
_T_U32, _T_F32, _T_STR = 4, 6, 8


def _kv(key: str, vtype: int, value) -> bytes:
    out = struct.pack("<Q", len(key)) + key.encode()
    out += struct.pack("<I", vtype)
    if vtype == _T_STR:
        out += struct.pack("<Q", len(value)) + value.encode()
    elif vtype == _T_U32:
        out += struct.pack("<I", value)
    elif vtype == _T_F32:
        out += struct.pack("<f", value)
    return out


def _q8_0(a: np.ndarray) -> bytes:
    """Encode float array as GGML Q8_0 (block 32: fp16 scale + 32 int8)."""
    flat = a.reshape(-1, 32).astype(np.float32)
    d = np.abs(flat).max(axis=1, keepdims=True) / 127.0
    d[d == 0] = 1.0
    q = np.clip(np.round(flat / d), -127, 127).astype(np.int8)
    out = b""
    for i in range(flat.shape[0]):
        out += np.float16(d[i, 0]).tobytes() + q[i].tobytes()
    return out


def _q4_1(a: np.ndarray) -> bytes:
    """GGML Q4_1 (block 32: fp16 d, fp16 m, 16 bytes nibbles lo|hi)."""
    flat = a.reshape(-1, 32).astype(np.float32)
    mn = flat.min(axis=1, keepdims=True)
    mx = flat.max(axis=1, keepdims=True)
    d = (mx - mn) / 15.0
    d[d == 0] = 1.0
    q = np.clip(np.round((flat - mn) / d), 0, 15).astype(np.uint8)
    out = b""
    for i in range(flat.shape[0]):
        nib = (q[i, :16] | (q[i, 16:] << 4)).astype(np.uint8)
        out += (np.float16(d[i, 0]).tobytes() + np.float16(mn[i, 0]).tobytes()
                + nib.tobytes())
    return out


def _q4_0(a: np.ndarray) -> bytes:
    flat = a.reshape(-1, 32).astype(np.float32)
    amax_idx = np.abs(flat).argmax(axis=1)
    d = flat[np.arange(flat.shape[0]), amax_idx] / -8.0
    d[d == 0] = 1.0
    q = np.clip(np.round(flat / d[:, None]) + 8, 0, 15).astype(np.uint8)
    out = b""
    for i in range(flat.shape[0]):
        nib = (q[i, :16] | (q[i, 16:] << 4)).astype(np.uint8)
        out += np.float16(d[i]).tobytes() + nib.tobytes()
    return out


_ENC = {
    0: ("F32", lambda a: a.astype(np.float32).tobytes(), 1, 4),
    1: ("F16", lambda a: a.astype(np.float16).tobytes(), 1, 2),
    2: ("Q4_0", _q4_0, 32, 18),
    3: ("Q4_1", _q4_1, 32, 20),
    8: ("Q8_0", _q8_0, 32, 34),
}


def write_gguf(path, metadata, tensors):
    """tensors: list of (name, np_array, ggml_type). Shapes are written in
    ggml order (reversed numpy); data in C order."""
    ALIGN = 32
    header = b"GGUF" + struct.pack("<I", 3)
    header += struct.pack("<Q", len(tensors)) + struct.pack("<Q", len(metadata))
    body = b""
    for key, (vtype, value) in metadata.items():
        body += _kv(key, vtype, value)
    infos, data = b"", b""
    for name, arr, ttype in tensors:
        _, enc, be, bb = _ENC[ttype]
        offset = len(data)
        infos += struct.pack("<Q", len(name)) + name.encode()
        dims = list(reversed(arr.shape))
        infos += struct.pack("<I", len(dims))
        for d in dims:
            infos += struct.pack("<Q", d)
        infos += struct.pack("<I", ttype) + struct.pack("<Q", offset)
        payload = enc(arr)
        data += payload
        if len(data) % ALIGN:
            data += b"\0" * (ALIGN - len(data) % ALIGN)
    head = header + body + infos
    pad = (-len(head)) % ALIGN
    with open(path, "wb") as f:
        f.write(head + b"\0" * pad + data)


def _permute(w: np.ndarray, n_head: int) -> np.ndarray:
    """llama.cpp convert_hf_to_gguf rope permutation of W_q/W_k rows."""
    rows, cols = w.shape
    return (w.reshape(n_head, 2, rows // n_head // 2, cols)
            .swapaxes(1, 2).reshape(rows, cols))


# ------------------------------------------------------------------- tests
def test_tensor_encodings_roundtrip(tmp_path):
    from semi_pd_tpu.model_loader.gguf_reader import GGUFFile

    rng = np.random.default_rng(0)
    arrs = {
        "f32": (rng.normal(size=(8, 64)).astype(np.float32), 0),
        "f16": (rng.normal(size=(4, 32)).astype(np.float16).astype(np.float32), 1),
        "q8": (rng.normal(size=(4, 64)).astype(np.float32), 8),
        "q40": (rng.normal(size=(2, 64)).astype(np.float32), 2),
        "q41": (rng.normal(size=(2, 64)).astype(np.float32), 3),
    }
    path = str(tmp_path / "enc.gguf")
    write_gguf(
        path,
        {"general.architecture": (_T_STR, "llama")},
        [(k, a, t) for k, (a, t) in arrs.items()],
    )
    f = GGUFFile(path)
    assert f.version == 3
    got_f32 = f.tensor("f32")
    np.testing.assert_array_equal(got_f32, arrs["f32"][0])
    np.testing.assert_array_equal(f.tensor("f16"), arrs["f16"][0])
    # quantized: reconstruction error bounded by the format's step size
    for key, rtol in (("q8", 0.01), ("q40", 0.15), ("q41", 0.1)):
        a = arrs[key][0]
        err = np.abs(f.tensor(key) - a).max()
        assert err <= rtol * np.abs(a).max(), (key, err)


def test_unsupported_encoding_raises(tmp_path):
    from semi_pd_tpu.model_loader.gguf_reader import GGUFFile

    path = str(tmp_path / "k.gguf")
    # hand-write a tensor info claiming IQ2_XXS (type 16, unsupported)
    a = np.zeros((1, 256), np.float32)
    write_gguf(path, {"general.architecture": (_T_STR, "llama")},
               [("x", a, 0)])
    f = GGUFFile(path)
    f.tensors["x"] = (f.tensors["x"][0], 16, f.tensors["x"][2])
    with pytest.raises(NotImplementedError, match="IQ2_XXS"):
        f.tensor("x")


@pytest.fixture(scope="module")
def hf_llama():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    cfg.architectures = ["LlamaForCausalLM"]
    torch.manual_seed(0)
    return LlamaForCausalLM(cfg).eval().float(), cfg


def _write_llama_gguf(path, hf, hf_cfg, ttype=0):
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    md = {
        "general.architecture": (_T_STR, "llama"),
        "llama.block_count": (_T_U32, hf_cfg.num_hidden_layers),
        "llama.embedding_length": (_T_U32, hf_cfg.hidden_size),
        "llama.feed_forward_length": (_T_U32, hf_cfg.intermediate_size),
        "llama.attention.head_count": (_T_U32, hf_cfg.num_attention_heads),
        "llama.attention.head_count_kv": (_T_U32, hf_cfg.num_key_value_heads),
        "llama.context_length": (_T_U32, hf_cfg.max_position_embeddings),
        "llama.rope.freq_base": (_T_F32, hf_cfg.rope_theta),
        "llama.attention.layer_norm_rms_epsilon": (_T_F32, hf_cfg.rms_norm_eps),
    }
    nm = {
        "model.embed_tokens.weight": "token_embd.weight",
        "model.norm.weight": "output_norm.weight",
        "lm_head.weight": "output.weight",
    }
    per_layer = {
        "input_layernorm.weight": "attn_norm.weight",
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }
    tensors = []
    for hf_name, a in sd.items():
        if hf_name in nm:
            gname = nm[hf_name]
        else:
            parts = hf_name.split(".")
            layer = parts[2]
            gname = f"blk.{layer}." + per_layer[".".join(parts[3:])]
            if parts[3:5] == ["self_attn", "q_proj"]:
                a = _permute(a, hf_cfg.num_attention_heads)
            elif parts[3:5] == ["self_attn", "k_proj"]:
                a = _permute(a, hf_cfg.num_key_value_heads)
        # norms stay F32 (llama.cpp keeps 1-D tensors unquantized)
        t = 0 if a.ndim == 1 else ttype
        tensors.append((gname, a, t))
    write_gguf(path, md, tensors)


def test_engine_from_gguf_matches_state_dict(tmp_path, hf_llama):
    """Full e2e: ModelConfig synthesized from GGUF metadata, weights loaded
    via the gguf iterator (incl. un-permuting W_q/W_k), greedy tokens match
    the state_dict-loaded engine exactly (F32 encoding: lossless)."""
    from semi_pd_tpu.config.model_config import ModelConfig
    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.model_loader.loader import load_params
    from semi_pd_tpu.runtime.engine import Engine
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    hf, hf_cfg = hf_llama
    path = str(tmp_path / "model.gguf")
    _write_llama_gguf(path, hf, hf_cfg, ttype=0)

    eng_gguf = Engine(server_args=ServerArgs(
        model_path=path, page_size=4, max_total_tokens=1024, dtype="float32"))
    mc = eng_gguf.runner.model_config
    assert mc.architecture == "LlamaForCausalLM"
    assert mc.hidden_size == 64 and mc.num_hidden_layers == 2
    assert mc.num_key_value_heads == 2

    mc2 = ModelConfig.from_hf_config(hf_cfg, dtype="float32")
    eng_ref = Engine(server_args=ServerArgs(
        model_path="", random_weights=True, page_size=4,
        max_total_tokens=1024, dtype="float32"), model_config=mc2)
    eng_ref.runner.params = load_params(
        eng_ref.runner.model,
        weights=[(k, v.numpy()) for k, v in hf.state_dict().items()])

    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 128, size=9).tolist() for _ in range(3)]
    sp = SamplingParams(max_new_tokens=6, temperature=0.0, ignore_eos=True)
    got = [o["output_ids"] for o in eng_gguf.generate(input_ids=prompts, sampling_params=sp)]
    want = [o["output_ids"] for o in eng_ref.generate(input_ids=prompts, sampling_params=sp)]
    assert got == want


def test_engine_from_q8_gguf_generates(tmp_path, hf_llama):
    """Q8_0-quantized weights load and serve (small reconstruction error)."""
    from semi_pd_tpu.config.server_args import ServerArgs
    from semi_pd_tpu.runtime.engine import Engine
    from semi_pd_tpu.sampling.sampling_params import SamplingParams

    hf, hf_cfg = hf_llama
    path = str(tmp_path / "model_q8.gguf")
    _write_llama_gguf(path, hf, hf_cfg, ttype=8)
    eng = Engine(server_args=ServerArgs(
        model_path=path, page_size=4, max_total_tokens=1024, dtype="float32"))
    out = eng.generate(
        input_ids=[[5, 6, 7, 8]],
        sampling_params=SamplingParams(max_new_tokens=4, temperature=0.0,
                                       ignore_eos=True))
    assert len(out[0]["output_ids"]) == 4
