"""GGUF K-quant dequantization (reference srt/model_loader/loader.py gguf
path; layouts from public ggml-quants.c dequantize_row_q*_K).

The vectorized numpy dequant in gguf_reader is checked against a direct
scalar transcription of the C loops, over random block bytes (which cover
every bit pattern class), plus a container round-trip through the writer
used by test_gguf.
"""

import numpy as np
import pytest

from semi_pd_tpu.model_loader.gguf_reader import (
    GGML_IQ4_NL,
    GGML_IQ4_XS,
    GGML_Q2_K,
    GGML_Q3_K,
    GGML_Q4_K,
    GGML_Q5_K,
    GGML_Q6_K,
    GGML_Q5_0,
    GGML_Q5_1,
    _BLOCK,
    _IQ4_VALUES,
    _dequant,
)


def _f16(b, o):
    return float(np.frombuffer(bytes(b[o:o + 2]), np.float16)[0])


def _scale_min_k4(scales, j):
    # ggml get_scale_min_k4
    if j < 4:
        return scales[j] & 63, scales[j + 4] & 63
    sc = (scales[j + 4] & 0x0F) | ((scales[j - 4] >> 6) << 4)
    mn = (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4)
    return sc, mn


def _scalar_dequant(block, t):
    y = np.zeros(
        32 if t in (GGML_Q5_0, GGML_Q5_1, GGML_IQ4_NL) else 256, np.float32)
    if t == GGML_IQ4_NL:
        # ggml dequantize_row_iq4_nl
        d = _f16(block, 0)
        qs = block[2:18]
        for j in range(16):
            y[j] = d * _IQ4_VALUES[int(qs[j]) & 0x0F]
            y[j + 16] = d * _IQ4_VALUES[int(qs[j]) >> 4]
        return y
    if t == GGML_IQ4_XS:
        # ggml dequantize_row_iq4_xs
        d = _f16(block, 0)
        scales_h = int(np.frombuffer(bytes(block[2:4]), np.uint16)[0])
        scales_l = block[4:8]
        qs = block[8:136]
        o = qo = 0
        for ib in range(8):
            ls = ((int(scales_l[ib // 2]) >> (4 * (ib % 2))) & 0x0F) | (
                ((scales_h >> (2 * ib)) & 3) << 4)
            dl = d * (ls - 32)
            for j in range(16):
                y[o + j] = dl * _IQ4_VALUES[int(qs[qo + j]) & 0x0F]
                y[o + j + 16] = dl * _IQ4_VALUES[int(qs[qo + j]) >> 4]
            o += 32
            qo += 16
        return y
    if t == GGML_Q5_0:
        d = _f16(block, 0)
        qh = int(np.frombuffer(bytes(block[2:6]), np.uint32)[0])
        qs = block[6:22]
        for j in range(16):
            xh0 = ((qh >> j) << 4) & 0x10
            xh1 = (qh >> (j + 12)) & 0x10
            y[j] = ((int(qs[j]) & 0x0F) | xh0) - 16
            y[j + 16] = ((int(qs[j]) >> 4) | xh1) - 16
        return y * d
    if t == GGML_Q5_1:
        d, m = _f16(block, 0), _f16(block, 2)
        qh = int(np.frombuffer(bytes(block[4:8]), np.uint32)[0])
        qs = block[8:24]
        for j in range(16):
            xh0 = ((qh >> j) << 4) & 0x10
            xh1 = (qh >> (j + 12)) & 0x10
            y[j] = d * ((int(qs[j]) & 0x0F) | xh0) + m
            y[j + 16] = d * ((int(qs[j]) >> 4) | xh1) + m
        return y
    if t == GGML_Q4_K:
        d, dmin = _f16(block, 0), _f16(block, 2)
        scales = block[4:16]
        q = block[16:144]
        o = qo = 0
        for chunk in range(4):
            for half in range(2):
                sc, mn = _scale_min_k4(scales, 2 * chunk + half)
                for l in range(32):
                    v = (q[qo + l] & 0x0F) if half == 0 else (q[qo + l] >> 4)
                    y[o] = d * sc * v - dmin * mn
                    o += 1
            qo += 32
        return y
    if t == GGML_Q5_K:
        d, dmin = _f16(block, 0), _f16(block, 2)
        scales = block[4:16]
        qh = block[16:48]
        ql = block[48:176]
        o, qo, u = 0, 0, 1
        for chunk in range(4):
            for half in range(2):
                sc, mn = _scale_min_k4(scales, 2 * chunk + half)
                for l in range(32):
                    v = (ql[qo + l] & 0x0F) if half == 0 else (ql[qo + l] >> 4)
                    if qh[l] & u:
                        v += 16
                    y[o] = d * sc * v - dmin * mn
                    o += 1
                u <<= 1
            qo += 32
        return y
    if t == GGML_Q6_K:
        ql = block[0:128]
        qh = block[128:192]
        sc = np.frombuffer(bytes(block[192:208]), np.int8)
        d = _f16(block, 208)
        o = 0
        for n in range(2):  # 128-halves
            lo, ho = 64 * n, 32 * n
            for l in range(32):
                is_ = l // 16
                q1 = ((int(ql[lo + l]) & 0x0F) | (((int(qh[ho + l]) >> 0) & 3) << 4)) - 32
                q2 = ((int(ql[lo + l + 32]) & 0x0F) | (((int(qh[ho + l]) >> 2) & 3) << 4)) - 32
                q3 = ((int(ql[lo + l]) >> 4) | (((int(qh[ho + l]) >> 4) & 3) << 4)) - 32
                q4 = ((int(ql[lo + l + 32]) >> 4) | (((int(qh[ho + l]) >> 6) & 3) << 4)) - 32
                base = 8 * n
                y[o + l] = d * sc[base + is_] * q1
                y[o + l + 32] = d * sc[base + is_ + 2] * q2
                y[o + l + 64] = d * sc[base + is_ + 4] * q3
                y[o + l + 96] = d * sc[base + is_ + 6] * q4
            o += 128
        return y
    if t == GGML_Q2_K:
        scales = block[0:16]
        q = block[16:80]
        d, dmin = _f16(block, 80), _f16(block, 82)
        o, is_, qo = 0, 0, 0
        for n in range(2):
            shift = 0
            for j in range(4):
                sc = scales[is_]; is_ += 1
                dl, ml = d * (sc & 0x0F), dmin * (sc >> 4)
                for l in range(16):
                    y[o] = dl * ((q[qo + l] >> shift) & 3) - ml
                    o += 1
                sc = scales[is_]; is_ += 1
                dl, ml = d * (sc & 0x0F), dmin * (sc >> 4)
                for l in range(16):
                    y[o] = dl * ((q[qo + l + 16] >> shift) & 3) - ml
                    o += 1
                shift += 2
            qo += 32
        return y
    if t == GGML_Q3_K:
        hmask = block[0:32]
        q = block[32:96]
        aux = list(np.frombuffer(bytes(block[96:108]), np.uint32))
        d = _f16(block, 108)
        km1, km2 = 0x03030303, 0x0F0F0F0F
        tmp = aux[2]
        new = [
            (aux[0] & km2) | (((tmp >> 0) & km1) << 4),
            (aux[1] & km2) | (((tmp >> 2) & km1) << 4),
            ((aux[0] >> 4) & km2) | (((tmp >> 4) & km1) << 4),
            ((aux[1] >> 4) & km2) | (((tmp >> 6) & km1) << 4),
        ]
        sc = np.frombuffer(
            np.asarray(new, np.uint32).tobytes(), np.int8).astype(np.float32)
        o, is_, qo, m = 0, 0, 0, 1
        for n in range(2):
            shift = 0
            for j in range(4):
                dl = d * (sc[is_] - 32); is_ += 1
                for l in range(16):
                    v = (int(q[qo + l]) >> shift) & 3
                    if not (hmask[l] & m):
                        v -= 4
                    y[o] = dl * v
                    o += 1
                dl = d * (sc[is_] - 32); is_ += 1
                for l in range(16):
                    v = (int(q[qo + l + 16]) >> shift) & 3
                    if not (hmask[l + 16] & m):
                        v -= 4
                    y[o] = dl * v
                    o += 1
                shift += 2
                m <<= 1
            qo += 32
        return y
    raise AssertionError(t)


@pytest.mark.parametrize("t", [GGML_Q5_0, GGML_Q5_1, GGML_Q2_K, GGML_Q3_K,
                               GGML_Q4_K, GGML_Q5_K, GGML_Q6_K,
                               GGML_IQ4_NL, GGML_IQ4_XS])
def test_vectorized_matches_scalar(t):
    be, bb = _BLOCK[t]
    rng = np.random.default_rng(t)
    n_blocks = 5
    raw = rng.integers(0, 256, size=n_blocks * bb, dtype=np.uint8)
    # keep fp16 scale fields finite and small: overwrite with real halves
    for b in range(n_blocks):
        scale_pos = {GGML_Q6_K: 208, GGML_Q2_K: 80, GGML_Q3_K: 108}.get(t, 0)
        n_halves = 2 if t in (GGML_Q5_1, GGML_Q2_K, GGML_Q4_K, GGML_Q5_K) else 1
        vals = rng.normal(scale=0.1, size=n_halves).astype(np.float16)
        raw[b * bb + scale_pos: b * bb + scale_pos + 2 * n_halves] = (
            np.frombuffer(vals.tobytes(), np.uint8))
    got = _dequant(raw, t, n_blocks * be)
    want = np.concatenate([
        _scalar_dequant(raw[b * bb:(b + 1) * bb], t) for b in range(n_blocks)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _write_raw_gguf(path, tensors):
    """Minimal v3 container writer for pre-encoded tensor payloads:
    tensors = [(name, ggml_dims, ggml_type, payload_bytes)]."""
    import struct

    ALIGN = 32
    head = b"GGUF" + struct.pack("<I", 3)
    head += struct.pack("<Q", len(tensors)) + struct.pack("<Q", 0)
    infos, data = b"", b""
    for name, dims, ttype, payload in tensors:
        infos += struct.pack("<Q", len(name)) + name.encode()
        infos += struct.pack("<I", len(dims))
        for d in dims:
            infos += struct.pack("<Q", d)
        infos += struct.pack("<I", ttype) + struct.pack("<Q", len(data))
        data += payload
        if len(data) % ALIGN:
            data += b"\0" * (ALIGN - len(data) % ALIGN)
    head += infos
    pad = (-len(head)) % ALIGN
    with open(path, "wb") as f:
        f.write(head + b"\0" * pad + data)


def test_q4k_roundtrip_through_container(tmp_path):
    """Write a GGUF file carrying a Q4_K tensor and read it back."""
    from semi_pd_tpu.model_loader.gguf_reader import GGUFFile

    rng = np.random.default_rng(0)
    bb = _BLOCK[GGML_Q4_K][1]
    raw = rng.integers(0, 256, size=2 * bb, dtype=np.uint8)
    for b in range(2):  # sane fp16 d/dmin
        vals = rng.normal(scale=0.1, size=2).astype(np.float16)
        raw[b * bb: b * bb + 4] = np.frombuffer(vals.tobytes(), np.uint8)
    path = str(tmp_path / "k.gguf")
    _write_raw_gguf(path, [("t", [256, 2], GGML_Q4_K, raw.tobytes())])
    f = GGUFFile(path)
    arr = f.tensor("t")
    assert arr.shape == (2, 256)
    want = np.stack([_scalar_dequant(raw[b * bb:(b + 1) * bb], GGML_Q4_K)
                     for b in range(2)])
    np.testing.assert_allclose(arr, want, rtol=1e-6)
