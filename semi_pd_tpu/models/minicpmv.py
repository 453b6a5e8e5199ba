"""MiniCPM-V (2.x / 2.6): Idefics2 vision tower + perceiver resampler over a
MiniCPM or Qwen2 trunk.

Reference: srt/models/minicpmv.py — Idefics2VisionTransformer (:382) encodes
image patches; Resampler2_5 (:549) cross-attends ``num_queries`` learned
queries (with 2D sincos positions added to the keys) and projects into the
trunk's hidden size; the resampled tokens splice at the <image> placeholders
(same embed_override machinery as llava). The vision tower is parity-tested
against transformers' in-library Idefics2VisionTransformer; the resampler
against torch.nn.MultiheadAttention composed exactly as the reference does.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.ops.elementwise import layer_norm


def get_2d_sincos_pos_embed(embed_dim: int, h: int, w: int) -> np.ndarray:
    """[h, w, embed_dim] sincos table (reference minicpmv.py:115, version
    (2,5) layout: half the dims encode the h coordinate, half the w; each
    half is [sin | cos] of pos * omega)."""
    def _1d(dim, pos):  # pos [h, w]
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000.0 ** omega
        out = np.einsum("hw,d->hwd", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    grid_w, grid_h = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32)
    )
    # reference stacks meshgrid(w, h) and feeds grid[0] (the w coordinate)
    # into the FIRST half of the embedding (minicpmv.py:100-107)
    emb_first = _1d(embed_dim // 2, grid_w)
    emb_second = _1d(embed_dim // 2, grid_h)
    return np.concatenate([emb_first, emb_second], axis=-1)  # [h, w, D]


class Idefics2VisionTower:
    """Functional Idefics2VisionTransformer (HF modeling_idefics2).

    ``act_tanh``/``pos_bucketize``/``out_proj_name`` parameterize the two
    SigLIP-lineage variants: Idefics2 (tanh gelu, bucketized positions) and
    Janus (exact gelu, arange positions, out proj named projection_layer)."""

    def __init__(self, vcfg, dtype, act_tanh=True, pos_bucketize=True,
                 out_proj_name="out_proj"):
        self.E = vcfg.hidden_size
        self.heads = vcfg.num_attention_heads
        self.hd = self.E // self.heads
        # Janus sizes its MLP by mlp_ratio instead of intermediate_size
        self.inter = getattr(vcfg, "intermediate_size", None) or int(
            vcfg.hidden_size * getattr(vcfg, "mlp_ratio", 4.0))
        self.depth = vcfg.num_hidden_layers
        self.patch = vcfg.patch_size
        self.image_size = vcfg.image_size
        self.side = vcfg.image_size // vcfg.patch_size  # patches per side
        self.in_ch = getattr(vcfg, "num_channels", 3)
        self.eps = getattr(vcfg, "layer_norm_eps", 1e-6)
        self.dtype = dtype
        self.act_tanh = act_tanh
        self.pos_bucketize = pos_bucketize
        self.out_proj_name = out_proj_name

    def param_specs(self) -> Dict[str, Any]:
        d, E, M, n = self.dtype, self.E, self.inter, self.depth
        sd = lambda *sh: jax.ShapeDtypeStruct(sh, d)
        return {
            "patch": {"w": sd(self.in_ch * self.patch * self.patch, E),
                      "b": sd(E)},
            "pos": {"w": sd(self.side * self.side, E)},
            "blocks": {
                "ln1": {"w": sd(n, E), "b": sd(n, E)},
                "ln2": {"w": sd(n, E), "b": sd(n, E)},
                "q": {"w": sd(n, E, E), "b": sd(n, E)},
                "k": {"w": sd(n, E, E), "b": sd(n, E)},
                "v": {"w": sd(n, E, E), "b": sd(n, E)},
                "o": {"w": sd(n, E, E), "b": sd(n, E)},
                "fc1": {"w": sd(n, E, M), "b": sd(n, M)},
                "fc2": {"w": sd(n, M, E), "b": sd(n, E)},
            },
            "post_ln": {"w": sd(E), "b": sd(E)},
        }

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        b = "encoder.layers.{L}."
        return {
            # postprocess returns {"w": ...}; plan targets the parent dict
            "embeddings.patch_embedding.weight": ("patch", None, "mllama_conv"),
            "embeddings.patch_embedding.bias": ("patch.b", None, "none"),
            "embeddings.position_embedding.weight": ("pos.w", None, "none"),
            "post_layernorm.weight": ("post_ln.w", None, "none"),
            "post_layernorm.bias": ("post_ln.b", None, "none"),
            b + "layer_norm1.weight": ("blocks.ln1.w", None, "none"),
            b + "layer_norm1.bias": ("blocks.ln1.b", None, "none"),
            b + "layer_norm2.weight": ("blocks.ln2.w", None, "none"),
            b + "layer_norm2.bias": ("blocks.ln2.b", None, "none"),
            b + "self_attn.q_proj.weight": ("blocks.q.w", None, "t"),
            b + "self_attn.q_proj.bias": ("blocks.q.b", None, "none"),
            b + "self_attn.k_proj.weight": ("blocks.k.w", None, "t"),
            b + "self_attn.k_proj.bias": ("blocks.k.b", None, "none"),
            b + "self_attn.v_proj.weight": ("blocks.v.w", None, "t"),
            b + "self_attn.v_proj.bias": ("blocks.v.b", None, "none"),
            b + "self_attn.%s.weight" % self.out_proj_name: ("blocks.o.w", None, "t"),
            b + "self_attn.%s.bias" % self.out_proj_name: ("blocks.o.b", None, "none"),
            b + "mlp.fc1.weight": ("blocks.fc1.w", None, "t"),
            b + "mlp.fc1.bias": ("blocks.fc1.b", None, "none"),
            b + "mlp.fc2.weight": ("blocks.fc2.w", None, "t"),
            b + "mlp.fc2.bias": ("blocks.fc2.b", None, "none"),
        }

    def forward(self, params, pixel: jax.Array) -> jax.Array:
        """[C, H, W] (full-resolution square image) -> [n_patches, E]."""
        C, H, W = pixel.shape
        gh, gw = H // self.patch, W // self.patch
        x = pixel.reshape(C, gh, self.patch, gw, self.patch)
        x = x.transpose(1, 3, 0, 2, 4).reshape(gh * gw, -1).astype(self.dtype)
        x = x @ params["patch"]["w"] + params["patch"]["b"]
        if self.pos_bucketize:
            # bucketized fractional coords (HF Idefics2VisionEmbeddings with
            # a full attention mask). torch.bucketize(..., right=True) sends
            # a coordinate equal to a boundary to the LEFT bucket, so
            # bucket(i/g) = #{k >= 1 : k/side < i/g} — for the native grid
            # this is [0, 0, 1, ..., side-2], not identity. Exact integers:
            hb = np.maximum(0, (np.arange(gh) * self.side - 1) // gh)
            wb = np.maximum(0, (np.arange(gw) * self.side - 1) // gw)
            pos_ids = (hb[:, None] * self.side + wb[None, :]).reshape(-1)
        else:  # Janus: plain arange positions
            pos_ids = np.arange(gh * gw)
        x = x + params["pos"]["w"][jnp.asarray(pos_ids)]
        L = x.shape[0]
        for l in range(self.depth):
            bp = jax.tree.map(lambda a: a[l], params["blocks"])
            y = layer_norm(x, bp["ln1"], self.eps)
            q = (y @ bp["q"]["w"] + bp["q"]["b"]).reshape(L, self.heads, self.hd)
            k = (y @ bp["k"]["w"] + bp["k"]["b"]).reshape(L, self.heads, self.hd)
            v = (y @ bp["v"]["w"] + bp["v"]["b"]).reshape(L, self.heads, self.hd)
            att = jnp.einsum("lhd,mhd->hlm", q, k).astype(jnp.float32)
            att = jax.nn.softmax(att * self.hd ** -0.5, axis=-1)
            o = jnp.einsum("hlm,mhd->lhd", att.astype(v.dtype), v)
            x = x + (o.reshape(L, self.E) @ bp["o"]["w"] + bp["o"]["b"])
            y = layer_norm(x, bp["ln2"], self.eps)
            y = jax.nn.gelu(y @ bp["fc1"]["w"] + bp["fc1"]["b"],
                            approximate=self.act_tanh)
            x = x + (y @ bp["fc2"]["w"] + bp["fc2"]["b"])
        return layer_norm(x, params["post_ln"], self.eps)


class Resampler25:
    """Perceiver resampler (reference minicpmv.py Resampler2_5): num_queries
    learned queries cross-attend the vision sequence (2D sincos positions
    added to keys) through one torch-style MultiheadAttention, then
    layer-norm + projection."""

    def __init__(self, num_queries: int, embed_dim: int, num_heads: int,
                 kv_dim: int, dtype):
        self.Q = num_queries
        self.E = embed_dim
        self.heads = num_heads
        self.hd = embed_dim // num_heads
        self.kv_dim = kv_dim
        self.dtype = dtype

    def param_specs(self) -> Dict[str, Any]:
        d, E = self.dtype, self.E
        sd = lambda *sh: jax.ShapeDtypeStruct(sh, d)
        return {
            "query": sd(self.Q, E),
            "kv_proj": {"w": sd(self.kv_dim, E)},
            # torch nn.MultiheadAttention: fused in_proj [3E, E] + bias
            "in_proj": {"w": sd(E, 3 * E), "b": sd(3 * E)},
            "out_proj": {"w": sd(E, E), "b": sd(E)},
            "ln_q": {"w": sd(E), "b": sd(E)},
            "ln_kv": {"w": sd(E), "b": sd(E)},
            "ln_post": {"w": sd(E), "b": sd(E)},
            "proj": sd(E, E),
        }

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        return {
            "query": ("query", None, "none"),
            "kv_proj.weight": ("kv_proj.w", None, "t"),
            "attn.in_proj_weight": ("in_proj.w", None, "t"),
            "attn.in_proj_bias": ("in_proj.b", None, "none"),
            "attn.out_proj.weight": ("out_proj.w", None, "t"),
            "attn.out_proj.bias": ("out_proj.b", None, "none"),
            "ln_q.weight": ("ln_q.w", None, "none"),
            "ln_q.bias": ("ln_q.b", None, "none"),
            "ln_kv.weight": ("ln_kv.w", None, "none"),
            "ln_kv.bias": ("ln_kv.b", None, "none"),
            "ln_post.weight": ("ln_post.w", None, "none"),
            "ln_post.bias": ("ln_post.b", None, "none"),
            "proj": ("proj", None, "none"),
        }

    def forward(self, params, feats: jax.Array, tgt_hw: Tuple[int, int]) -> jax.Array:
        """feats [n_patches, kv_dim] (one image) -> [num_queries, E]."""
        E, H = self.E, self.heads
        x = feats.astype(self.dtype) @ params["kv_proj"]["w"]
        x = layer_norm(x, params["ln_kv"], 1e-6)
        pos = get_2d_sincos_pos_embed(E, tgt_hw[0], tgt_hw[1]).reshape(-1, E)
        q = layer_norm(params["query"], params["ln_q"], 1e-6)  # [Q, E]
        wq, wk, wv = jnp.split(params["in_proj"]["w"], 3, axis=1)
        bq, bk, bv = jnp.split(params["in_proj"]["b"], 3)
        qh = (q @ wq + bq).reshape(self.Q, H, self.hd)
        k_in = x + jnp.asarray(pos, x.dtype)
        kh = (k_in @ wk + bk).reshape(-1, H, self.hd)
        vh = (x @ wv + bv).reshape(-1, H, self.hd)
        att = jnp.einsum("qhd,khd->hqk", qh, kh).astype(jnp.float32)
        att = jax.nn.softmax(att * self.hd ** -0.5, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att.astype(vh.dtype), vh)
        o = o.reshape(self.Q, E) @ params["out_proj"]["w"] + params["out_proj"]["b"]
        o = layer_norm(o, params["ln_post"], 1e-6)
        return o @ params["proj"]


class MiniCPMVForCausalLM:
    """MiniCPM-V wrapper: trunk (MiniCPM for 2.x, Qwen2 for 2.6) + Idefics2
    vision + resampler; image features splice via embed_override like llava."""

    is_multimodal = True

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.vision_cfg = hf.vision_config
        self.image_token_index = getattr(hf, "image_token_index", None)
        if self.image_token_index is None:
            self.image_token_index = getattr(hf, "unk_token_id", 0)
        raw_ver = getattr(hf, "version", 2.6)
        if isinstance(raw_ver, (list, tuple)):
            version = float(".".join(str(v) for v in raw_ver[:2]))
        else:
            version = float(raw_ver)
        from semi_pd_tpu.models.llama import LlamaForCausalLM
        from semi_pd_tpu.models.llama_variants import MiniCPMForCausalLM

        lm_cfg = ModelConfig.from_hf_config(hf, dtype=config.dtype)
        lm_cfg.is_multimodal = False  # trunk itself is text-only
        if version >= 2.5:
            # 2.6 trunk is Qwen2 (qkv bias, untied head); 2.5 is Llama-3
            lm_cfg.architecture = "Qwen2ForCausalLM"
            lm_cfg.attention_bias = bool(
                getattr(hf, "attention_bias", version >= 2.6))
            self.lm = LlamaForCausalLM(lm_cfg)
        else:
            lm_cfg.architecture = "MiniCPMForCausalLM"
            self.lm = MiniCPMForCausalLM(lm_cfg)
        self.dtype = self.lm.dtype
        self.tower = Idefics2VisionTower(self.vision_cfg, self.dtype)
        self.num_queries = getattr(hf, "query_num", 64)
        # reference: num_heads = embed_dim // 128 (minicpmv.py init_resampler)
        self.resampler = Resampler25(
            self.num_queries, config.hidden_size,
            max(1, config.hidden_size // 128),
            self.vision_cfg.hidden_size, self.dtype,
        )

    def __getattr__(self, name):
        if name == "lm":
            raise AttributeError(name)
        return getattr(self.lm, name)

    @property
    def page_size(self):
        return self.lm.page_size

    @page_size.setter
    def page_size(self, v):
        self.lm.page_size = v

    @property
    def scan_layers(self):
        return self.lm.scan_layers

    @scan_layers.setter
    def scan_layers(self, v):
        self.lm.scan_layers = v

    @property
    def n_image_tokens(self) -> int:
        return self.num_queries

    def param_specs(self) -> Dict[str, Any]:
        return {
            "vision": self.tower.param_specs(),
            "resampler": self.resampler.param_specs(),
            "lm": self.lm.param_specs(),
        }

    def param_partition_specs(self) -> Dict[str, Any]:
        return {
            "vision": jax.tree.map(lambda _: P(), self.tower.param_specs()),
            "resampler": jax.tree.map(lambda _: P(), self.resampler.param_specs()),
            "lm": self.lm.param_partition_specs(),
        }

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.default_rng(seed)
        return jax.tree.map(
            lambda s: jnp.asarray(
                rng.standard_normal(s.shape, dtype=np.float32) * 0.02, s.dtype
            ),
            self.param_specs(),
        )

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        plan = {}
        for tmpl, (path, sl, tf) in self.lm.hf_weight_plan().items():
            # trunk weights live under llm. (reference minicpmv.py init_llm)
            plan["llm." + tmpl] = ("lm." + path, sl, tf)
        for tmpl, (path, sl, tf) in self.tower.hf_weight_plan().items():
            plan["vpm." + tmpl] = ("vision." + path, sl, tf)
        for tmpl, (path, sl, tf) in self.resampler.hf_weight_plan().items():
            plan["resampler." + tmpl] = ("resampler." + path, sl, tf)
        return plan

    def postprocess_weight(self, tag: str, arr: np.ndarray):
        if tag == "mllama_conv":  # Conv2d [E, C, ps, ps] -> [C*ps*ps, E]
            return {"w": arr.reshape(arr.shape[0], -1).T}
        raise KeyError(tag)

    # --------------------------------------------------------- multimodal
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N, C, H, W] -> [N, num_queries, hidden] resampled features."""
        outs = []
        for i in range(pixel_values.shape[0]):
            feats = self.tower.forward(params["vision"], pixel_values[i])
            side_h = pixel_values.shape[2] // self.tower.patch
            side_w = pixel_values.shape[3] // self.tower.patch
            outs.append(self.resampler.forward(
                params["resampler"], feats, (side_h, side_w)))
        return jnp.stack(outs)

    # ------------------------------------------------------------ forward
    def forward(self, params, fb, kv, return_hidden: bool = False,
                all_logits: bool = False):
        return self.lm.forward(params["lm"], fb, kv, return_hidden, all_logits)

    def forward_embedding(self, params, fb, kv):
        return self.lm.forward_embedding(params["lm"], fb, kv)
