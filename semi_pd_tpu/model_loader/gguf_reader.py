"""GGUF checkpoint reader (from scratch — no `gguf` package dependency).

Reference capability: srt/model_loader/loader.py:1143 _get_gguf_weights_map +
weight_utils.py gguf_quant_weights_iterator (both delegate to the `gguf`
python package, which is not available here). This module parses the GGUF v2/
v3 binary format directly (magic, metadata KVs, tensor infos, aligned data
section; spec: ggml/docs/gguf.md), dequantizes the common tensor encodings to
numpy, and maps llama-family GGUF tensor names back to HF names — including
inverting llama.cpp's rope permutation of W_q/W_k so the loaded weights are
HF-exact.

Supported encodings: F32, F16, BF16, Q8_0, Q4_0/1, Q5_0/1 (block-32) and
the Q2_K..Q6_K superblock K-quants (vectorized numpy dequant following the
public ggml-quants.c element layouts).
K-quants (Q4_K & co.) raise a clear error: their 256-wide super-block layout
is a llama.cpp implementation detail we do not need for serving parity.
"""

from __future__ import annotations

import logging
import struct
from typing import Any, Dict, Iterator, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)

GGUF_MAGIC = b"GGUF"

# metadata value types (gguf.md)
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32, _T_F32 = range(7)
_T_BOOL, _T_STR, _T_ARR, _T_U64, _T_I64, _T_F64 = range(7, 13)

_SCALARS = {
    _T_U8: ("<B", 1), _T_I8: ("<b", 1), _T_U16: ("<H", 2), _T_I16: ("<h", 2),
    _T_U32: ("<I", 4), _T_I32: ("<i", 4), _T_F32: ("<f", 4),
    _T_BOOL: ("<B", 1), _T_U64: ("<Q", 8), _T_I64: ("<q", 8), _T_F64: ("<d", 8),
}

# ggml tensor encodings (type id -> name); block formats carry
# (block_elems, block_bytes)
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1 = 2, 3
GGML_Q5_0, GGML_Q5_1 = 6, 7
GGML_Q8_0 = 8
GGML_Q2_K, GGML_Q3_K, GGML_Q4_K, GGML_Q5_K, GGML_Q6_K = 10, 11, 12, 13, 14
GGML_IQ4_NL, GGML_IQ4_XS = 20, 23
GGML_BF16 = 30
_TYPE_NAMES = {
    0: "F32", 1: "F16", 2: "Q4_0", 3: "Q4_1", 6: "Q5_0", 7: "Q5_1",
    8: "Q8_0", 9: "Q8_1", 10: "Q2_K", 11: "Q3_K", 12: "Q4_K", 13: "Q5_K",
    14: "Q6_K", 15: "Q8_K", 16: "IQ2_XXS", 17: "IQ2_XS", 18: "IQ3_XXS",
    19: "IQ1_S", 20: "IQ4_NL", 21: "IQ3_S", 22: "IQ2_S", 23: "IQ4_XS",
    30: "BF16",
}
_BLOCK = {
    GGML_F32: (1, 4), GGML_F16: (1, 2), GGML_BF16: (1, 2),
    GGML_Q4_0: (32, 18), GGML_Q4_1: (32, 20), GGML_Q8_0: (32, 34),
    GGML_Q5_0: (32, 22), GGML_Q5_1: (32, 24),
    # K-quants: 256-element superblocks
    GGML_Q2_K: (256, 84), GGML_Q3_K: (256, 110), GGML_Q4_K: (256, 144),
    GGML_Q5_K: (256, 176), GGML_Q6_K: (256, 210),
    # IQ4: non-linear 4-bit codebook (block-32 NL, superblock-256 XS)
    GGML_IQ4_NL: (32, 18), GGML_IQ4_XS: (256, 136),
}

# kvalues_iq4nl from public ggml-quants.c: the shared non-linear 4-bit
# codebook for IQ4_NL / IQ4_XS
_IQ4_VALUES = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10,
     1, 13, 25, 38, 53, 69, 89, 113], dtype=np.float32)


class _Cursor:
    def __init__(self, buf: memoryview):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> memoryview:
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def scalar(self, fmt: str, size: int):
        (v,) = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return v

    def string(self) -> str:
        n = self.scalar("<Q", 8)
        return bytes(self.take(n)).decode("utf-8", errors="replace")

    def value(self, vtype: int):
        if vtype == _T_STR:
            return self.string()
        if vtype == _T_ARR:
            etype = self.scalar("<I", 4)
            n = self.scalar("<Q", 8)
            return [self.value(etype) for _ in range(n)]
        fmt, size = _SCALARS[vtype]
        v = self.scalar(fmt, size)
        return bool(v) if vtype == _T_BOOL else v


def _dequant(raw: np.ndarray, ggml_type: int, n_elems: int) -> np.ndarray:
    """Dequantize a flat byte buffer to float32/float16 (C-order elements)."""
    if ggml_type == GGML_F32:
        return raw.view(np.float32)[:n_elems]
    if ggml_type == GGML_F16:
        return raw.view(np.float16)[:n_elems]
    if ggml_type == GGML_BF16:
        import ml_dtypes

        return raw.view(ml_dtypes.bfloat16)[:n_elems]
    be, bb = _BLOCK[ggml_type]
    blocks = raw.reshape(-1, bb)
    if ggml_type == GGML_Q8_0:
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)  # [B,1]
        q = blocks[:, 2:].view(np.int8).astype(np.float32)            # [B,32]
        out = d * q
    elif ggml_type == GGML_Q4_0:
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
        qs = blocks[:, 2:]                                            # [B,16]
        lo = (qs & 0x0F).astype(np.float32) - 8.0   # elements 0..15
        hi = (qs >> 4).astype(np.float32) - 8.0     # elements 16..31
        out = d * np.concatenate([lo, hi], axis=1)
    elif ggml_type == GGML_Q4_1:
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
        m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
        qs = blocks[:, 4:]
        lo = (qs & 0x0F).astype(np.float32)
        hi = (qs >> 4).astype(np.float32)
        out = d * np.concatenate([lo, hi], axis=1) + m
    elif ggml_type in (GGML_Q5_0, GGML_Q5_1):
        # block: d fp16 [, m fp16], qh u32 (32 high bits), qs 16B nibbles;
        # elem j gets qh bit j (low nibbles: j<16; high nibbles: j>=16)
        off = 2 if ggml_type == GGML_Q5_0 else 4
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
        qh = blocks[:, off:off + 4].copy().view(np.uint32).astype(np.uint32)
        qs = blocks[:, off + 4:]
        bits = (qh[:, :1] >> np.arange(32, dtype=np.uint32)) & 1  # [B,32]
        lo = (qs & 0x0F) | (bits[:, :16] << 4).astype(np.uint8)
        hi = (qs >> 4) | (bits[:, 16:] << 4).astype(np.uint8)
        q = np.concatenate([lo, hi], axis=1).astype(np.float32)
        if ggml_type == GGML_Q5_0:
            out = d * (q - 16.0)
        else:
            m = blocks[:, 2:4].copy().view(np.float16).astype(np.float32)
            out = d * q + m
    elif ggml_type == GGML_IQ4_NL:
        # block: d fp16, qs 16B nibble codebook indices (lo: elems 0..15)
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
        qs = blocks[:, 2:]
        lo = _IQ4_VALUES[qs & 0x0F]
        hi = _IQ4_VALUES[qs >> 4]
        out = d * np.concatenate([lo, hi], axis=1)
    elif ggml_type == GGML_IQ4_XS:
        # superblock: d fp16, scales_h u16 (2b/sub), scales_l 4B (4b/sub),
        # qs 128B — 8 sub-blocks of 32 elems, 6-bit scale ls-32 each
        d = blocks[:, :2].copy().view(np.float16).astype(np.float32)  # [B,1]
        scales_h = blocks[:, 2:4].copy().view(np.uint16).astype(np.uint32)
        scales_l = blocks[:, 4:8]                                     # [B,4]
        qs = blocks[:, 8:].reshape(-1, 8, 16)                         # [B,8,16]
        ib = np.arange(8)
        ls = ((scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0x0F) | (
            ((scales_h >> (2 * ib)) & 3) << 4)                        # [B,8]
        dl = d * (ls.astype(np.float32) - 32.0)                       # [B,8]
        sub = np.concatenate(
            [_IQ4_VALUES[qs & 0x0F], _IQ4_VALUES[qs >> 4]], axis=2)   # [B,8,32]
        out = dl[:, :, None] * sub
    elif ggml_type in (GGML_Q2_K, GGML_Q3_K, GGML_Q4_K, GGML_Q5_K, GGML_Q6_K):
        out = _dequant_k(blocks, ggml_type)
    else:  # pragma: no cover — guarded by caller
        raise NotImplementedError(ggml_type)
    return out.reshape(-1)[:n_elems].astype(np.float32)


def _k_scale_min(scales: np.ndarray):
    """Unpack the 12-byte 6-bit (scale, min) pairs of Q4_K/Q5_K superblocks
    (ggml get_scale_min_k4): 8 sub-blocks of 32 elements each."""
    sc = np.empty(scales.shape[:-1] + (8,), np.float32)
    mn = np.empty_like(sc)
    for j in range(4):
        sc[..., j] = (scales[..., j] & 63).astype(np.float32)
        mn[..., j] = (scales[..., j + 4] & 63).astype(np.float32)
        sc[..., j + 4] = ((scales[..., j + 8] & 0x0F)
                          | ((scales[..., j] >> 6) << 4)).astype(np.float32)
        mn[..., j + 4] = ((scales[..., j + 8] >> 4)
                          | ((scales[..., j + 4] >> 6) << 4)).astype(np.float32)
    return sc, mn


def _dequant_k(blocks: np.ndarray, t: int) -> np.ndarray:
    """K-quant superblocks (QK_K=256) -> [B, 256] float32, following the
    public ggml-quants.c dequantize_row_q{2,3,4,5,6}_K element layouts."""
    B = blocks.shape[0]
    f16 = lambda s: blocks[:, s:s + 2].copy().view(np.float16).astype(np.float32)
    if t == GGML_Q4_K:
        d, dmin = f16(0), f16(2)
        sc, mn = _k_scale_min(blocks[:, 4:16])
        qs = blocks[:, 16:144].reshape(B, 4, 32)  # 4 chunks of 64 elems
        lo = (qs & 0x0F).astype(np.float32)
        hi = (qs >> 4).astype(np.float32)
        q = np.stack([lo, hi], axis=2).reshape(B, 8, 32)  # sub-block order
        out = d[:, :, None] * sc[:, :, None] * q - dmin[:, :, None] * mn[:, :, None]
        return out.reshape(B, 256)
    if t == GGML_Q5_K:
        d, dmin = f16(0), f16(2)
        sc, mn = _k_scale_min(blocks[:, 4:16])
        qh = blocks[:, 16:48]                      # [B, 32]: bit s -> sub-block s
        qs = blocks[:, 48:176].reshape(B, 4, 32)
        lo = (qs & 0x0F).astype(np.float32)
        hi = (qs >> 4).astype(np.float32)
        q = np.stack([lo, hi], axis=2).reshape(B, 8, 32)
        hbit = (qh[:, None, :] >> np.arange(8, dtype=np.uint8)[None, :, None]) & 1
        q = q + 16.0 * hbit.astype(np.float32)
        out = d[:, :, None] * sc[:, :, None] * q - dmin[:, :, None] * mn[:, :, None]
        return out.reshape(B, 256)
    if t == GGML_Q6_K:
        ql = blocks[:, 0:128].reshape(B, 2, 64)    # two 128-elem halves
        qh = blocks[:, 128:192].reshape(B, 2, 32)
        sc = blocks[:, 192:208].view(np.int8).astype(np.float32)  # [B,16]
        d = f16(208)
        l = np.arange(32)
        q = np.empty((B, 2, 128), np.float32)
        q[:, :, l] = ((ql[:, :, l] & 0x0F) | (((qh[:, :, l] >> 0) & 3) << 4)).astype(np.float32) - 32
        q[:, :, l + 32] = ((ql[:, :, l + 32] & 0x0F) | (((qh[:, :, l] >> 2) & 3) << 4)).astype(np.float32) - 32
        q[:, :, l + 64] = ((ql[:, :, l] >> 4) | (((qh[:, :, l] >> 4) & 3) << 4)).astype(np.float32) - 32
        q[:, :, l + 96] = ((ql[:, :, l + 32] >> 4) | (((qh[:, :, l] >> 6) & 3) << 4)).astype(np.float32) - 32
        q = q.reshape(B, 16, 16)
        return (d[:, :, None] * sc[:, :, None] * q).reshape(B, 256)
    if t == GGML_Q2_K:
        scales = blocks[:, 0:16]                   # [B,16] 4-bit sc | min<<4
        qs = blocks[:, 16:80].reshape(B, 2, 32)    # two 128-elem halves
        d, dmin = f16(80), f16(82)
        sc = (scales & 0x0F).astype(np.float32)
        mn = (scales >> 4).astype(np.float32)
        # order within a 128-half: shift 0..3; within a shift: q[l], q[l+16]
        q = (qs[:, :, None, None, :] >> (2 * np.arange(4))[None, None, :, None, None]) & 3
        q = q.reshape(B, 2, 4, 2, 16).astype(np.float32)
        out = (d * sc).reshape(B, 2, 4, 2)[..., None] * q \
            - (dmin * mn).reshape(B, 2, 4, 2)[..., None]
        return out.reshape(B, 256)
    if t == GGML_Q3_K:
        hmask = blocks[:, 0:32].reshape(B, 1, 32)
        qs = blocks[:, 32:96].reshape(B, 2, 32)
        raw = blocks[:, 96:108].copy().view(np.uint32)  # [B,3] packed 6-bit
        d = f16(108)
        km1, km2 = np.uint32(0x03030303), np.uint32(0x0F0F0F0F)
        a0, a1, tmp = raw[:, 0], raw[:, 1], raw[:, 2]
        aux = np.stack([
            (a0 & km2) | (((tmp >> np.uint32(0)) & km1) << np.uint32(4)),
            (a1 & km2) | (((tmp >> np.uint32(2)) & km1) << np.uint32(4)),
            ((a0 >> np.uint32(4)) & km2) | (((tmp >> np.uint32(4)) & km1) << np.uint32(4)),
            ((a1 >> np.uint32(4)) & km2) | (((tmp >> np.uint32(6)) & km1) << np.uint32(4)),
        ], axis=1)
        sc = aux.view(np.int8).astype(np.float32) - 32.0  # [B,16]
        # low 2 bits from qs (per 128-half, shift 0..3, lanes l / l+16);
        # high bit from hmask bit (2-half*4+shift*1): m = 1 << (shift + 4*half)
        q = (qs[:, :, None, :] >> (2 * np.arange(4))[None, None, :, None]) & 3
        q = q.reshape(B, 2, 4, 2, 16).astype(np.float32)
        mbit = np.uint8(1) << (np.arange(4)[None, None, :] + 4 * np.arange(2)[None, :, None]).astype(np.uint8)
        h = (hmask[:, :, None, :] & mbit[..., None]) != 0  # [B,2,4,32]
        q = q - 4.0 * (~h.reshape(B, 2, 4, 2, 16)).astype(np.float32)
        out = (d * sc).reshape(B, 2, 4, 2)[..., None] * q  # sc already -32
        return out.reshape(B, 256)
    raise NotImplementedError(t)  # pragma: no cover


class GGUFFile:
    """Parsed GGUF container: `.metadata` dict + lazy `.tensor(name)`."""

    def __init__(self, path: str):
        self.path = path
        self._mm = np.memmap(path, dtype=np.uint8, mode="r")
        cur = _Cursor(memoryview(self._mm))
        if bytes(cur.take(4)) != GGUF_MAGIC:
            raise ValueError(f"{path}: not a GGUF file")
        self.version = cur.scalar("<I", 4)
        if self.version not in (2, 3):
            raise ValueError(f"{path}: unsupported GGUF version {self.version}")
        n_tensors = cur.scalar("<Q", 8)
        n_kv = cur.scalar("<Q", 8)
        self.metadata: Dict[str, Any] = {}
        for _ in range(n_kv):
            key = cur.string()
            vtype = cur.scalar("<I", 4)
            self.metadata[key] = cur.value(vtype)
        self.tensors: Dict[str, Tuple[List[int], int, int]] = {}
        for _ in range(n_tensors):
            name = cur.string()
            n_dims = cur.scalar("<I", 4)
            dims = [cur.scalar("<Q", 8) for _ in range(n_dims)]
            ttype = cur.scalar("<I", 4)
            offset = cur.scalar("<Q", 8)
            self.tensors[name] = (dims, ttype, offset)
        align = int(self.metadata.get("general.alignment", 32))
        self._data_base = (cur.pos + align - 1) // align * align

    def tensor(self, name: str) -> np.ndarray:
        dims, ttype, offset = self.tensors[name]
        if ttype not in _BLOCK and ttype not in (GGML_F32, GGML_F16, GGML_BF16):
            raise NotImplementedError(
                f"GGUF tensor {name!r} uses encoding "
                f"{_TYPE_NAMES.get(ttype, ttype)}; supported: F32, F16, BF16, "
                f"Q8_0, Q4_0/1, Q5_0/1, Q2_K..Q6_K, IQ4_NL/XS "
                f"(codebook IQ1/IQ2/IQ3 are not)"
            )
        n_elems = int(np.prod(dims))
        be, bb = _BLOCK[ttype]
        n_bytes = (n_elems + be - 1) // be * bb
        start = self._data_base + offset
        raw = np.asarray(self._mm[start:start + n_bytes])
        flat = _dequant(raw, ttype, n_elems)
        # ggml dims are [ne0 (contiguous), ne1, ...]; numpy shape is reversed
        return flat.reshape(list(reversed(dims)))


# --------------------------------------------------------------- name maps
# llama.cpp tensor names -> HF names (llama/qwen2/mistral-family layout;
# reference delegates to gguf.get_tensor_name_map).
_LLAMA_MAP = {
    "token_embd.weight": "model.embed_tokens.weight",
    "output_norm.weight": "model.norm.weight",
    "output.weight": "lm_head.weight",
    "blk.{L}.attn_norm.weight": "model.layers.{L}.input_layernorm.weight",
    "blk.{L}.attn_q.weight": "model.layers.{L}.self_attn.q_proj.weight",
    "blk.{L}.attn_k.weight": "model.layers.{L}.self_attn.k_proj.weight",
    "blk.{L}.attn_v.weight": "model.layers.{L}.self_attn.v_proj.weight",
    "blk.{L}.attn_output.weight": "model.layers.{L}.self_attn.o_proj.weight",
    "blk.{L}.attn_q.bias": "model.layers.{L}.self_attn.q_proj.bias",
    "blk.{L}.attn_k.bias": "model.layers.{L}.self_attn.k_proj.bias",
    "blk.{L}.attn_v.bias": "model.layers.{L}.self_attn.v_proj.bias",
    "blk.{L}.ffn_norm.weight": "model.layers.{L}.post_attention_layernorm.weight",
    "blk.{L}.ffn_gate.weight": "model.layers.{L}.mlp.gate_proj.weight",
    "blk.{L}.ffn_up.weight": "model.layers.{L}.mlp.up_proj.weight",
    "blk.{L}.ffn_down.weight": "model.layers.{L}.mlp.down_proj.weight",
}


def _unpermute_rope(w: np.ndarray, n_head: int) -> np.ndarray:
    """Invert llama.cpp's convert-time permutation of W_q/W_k.

    convert_hf_to_gguf permutes rows: reshape(h, 2, d/2, in) swap(1,2) —
    turning HF half-rotation layout into GGML interleaved. Inverse:
    reshape(h, d/2, 2, in) swap(1,2)."""
    rows, cols = w.shape
    head_dim = rows // n_head
    return (
        w.reshape(n_head, head_dim // 2, 2, cols)
        .swapaxes(1, 2)
        .reshape(rows, cols)
    )


def hf_config_from_gguf(path: str):
    """Synthesize a transformers config from GGUF metadata (single-file
    checkpoints carry no config.json; reference reads the same fields via the
    gguf package)."""
    f = GGUFFile(path)
    md = f.metadata
    arch = md.get("general.architecture", "llama")
    g = lambda key, default=None: md.get(f"{arch}.{key}", default)
    n_embd = int(g("embedding_length"))
    n_head = int(g("attention.head_count"))
    vocab = f.tensors["token_embd.weight"][0][1] if "token_embd.weight" in f.tensors \
        else len(md.get("tokenizer.ggml.tokens", []))
    common = dict(
        vocab_size=int(vocab),
        hidden_size=n_embd,
        intermediate_size=int(g("feed_forward_length", 4 * n_embd)),
        num_hidden_layers=int(g("block_count")),
        num_attention_heads=n_head,
        num_key_value_heads=int(g("attention.head_count_kv", n_head)),
        max_position_embeddings=int(g("context_length", 4096)),
        rms_norm_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
        rope_theta=float(g("rope.freq_base", 10000.0)),
        tie_word_embeddings="output.weight" not in f.tensors,
    )
    if arch == "qwen2":
        from transformers import Qwen2Config

        cfg = Qwen2Config(**common)
        cfg.architectures = ["Qwen2ForCausalLM"]
    else:
        from transformers import LlamaConfig

        cfg = LlamaConfig(**common)
        cfg.architectures = ["LlamaForCausalLM"]
    return cfg


def iterate_gguf_weights(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (hf_name, array) for every tensor in a llama-family GGUF file,
    dequantized and un-permuted; plug-compatible with loader.load_params'
    `weights` iterable."""
    f = GGUFFile(path)
    arch = f.metadata.get("general.architecture", "llama")
    if arch not in ("llama", "qwen2", "mistral", "gemma", "phi3", "stablelm"):
        logger.warning("gguf arch %r: using llama-family tensor name map", arch)
    n_head = int(f.metadata.get(f"{arch}.attention.head_count", 0))
    n_head_kv = int(f.metadata.get(f"{arch}.attention.head_count_kv", n_head))
    needs_unpermute = arch in ("llama", "mistral")

    import re

    compiled = []
    for tmpl, hf_tmpl in _LLAMA_MAP.items():
        pat = re.escape(tmpl).replace(re.escape("{L}"), r"(?P<L>\d+)")
        compiled.append((re.compile("^" + pat + "$"), tmpl, hf_tmpl))

    tied_output = "output.weight" not in f.tensors
    for name in f.tensors:
        for rx, tmpl, hf_tmpl in compiled:
            m = rx.match(name)
            if not m:
                continue
            arr = f.tensor(name)
            if needs_unpermute and arr.ndim == 2:
                if tmpl == "blk.{L}.attn_q.weight" and n_head:
                    arr = _unpermute_rope(arr, n_head)
                elif tmpl == "blk.{L}.attn_k.weight" and n_head_kv:
                    arr = _unpermute_rope(arr, n_head_kv)
            hf_name = hf_tmpl
            if "{L}" in hf_tmpl:
                hf_name = hf_tmpl.replace("{L}", m.group("L"))
            yield hf_name, arr
            break
        else:
            logger.debug("gguf tensor without HF mapping: %s", name)
    if tied_output:
        # tie_word_embeddings models omit output.weight; mirror the embedding
        yield "lm_head.weight", f.tensor("token_embd.weight")
