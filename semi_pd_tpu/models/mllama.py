"""Mllama (Llama 3.2 Vision) — cross-attention VLM.

Reference: srt/models/mllama.py (+ HF modeling_mllama). Unlike the
llava/qwen2-vl splice models, the <|image|> token embeds NORMALLY; instead
the text trunk interleaves CROSS-ATTENTION layers (text_config.
cross_attention_layers) whose K/V come from the vision encoder's output:

- Vision: conv patch embed -> gated pre-tile embedding -> class token ->
  gated positional (+tile) embedding -> layernorm_pre -> local transformer
  (collecting intermediate_layers_indices inputs) -> layernorm_post ->
  gated post-tile embedding -> global transformer (tanh-gated blocks) ->
  concat(final, intermediates) -> multi_modal_projector to text hidden.
- Text: llama self-attn layers (llama3-scaled rope) + cross layers:
  h += tanh(attn_gate) * cross_attn(norm(h), vision_states)   (q/k RMSNorm)
  h += tanh(mlp_gate) * mlp(norm(h))
  Rows of requests without a visible image zero BOTH branches (HF's
  full_text_row_masked_out_mask), making the layer an exact identity —
  so text-only and image requests batch together.

Serving integration: per-request projected vision states are computed once
at prefill (engine._attach_images) and carried in
ForwardArrays.cross_states [B, Nv, H]; cross K/V are recomputed from them
each step (correctness tier — a paged cross-KV pool is the production
follow-up). One image per request supported; tokens at positions >=
cross_from (the <|image|> token) attend it.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.layers.linear import apply_linear
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.ops.elementwise import layer_norm, rms_norm, silu_and_mul


class MllamaVisionModel:
    """Functional Mllama vision encoder (HF MllamaVisionModel)."""

    def __init__(self, vcfg, dtype):
        self.E = vcfg.hidden_size
        self.heads = vcfg.attention_heads
        self.hd = self.E // self.heads
        self.inter = vcfg.intermediate_size
        self.depth = vcfg.num_hidden_layers
        self.g_depth = vcfg.num_global_layers
        self.patch = vcfg.patch_size
        self.image_size = vcfg.image_size
        self.in_ch = getattr(vcfg, "num_channels", 3)
        self.max_tiles = vcfg.max_num_tiles
        self.max_ar = vcfg.max_aspect_ratio_id
        self.inter_idx = list(vcfg.intermediate_layers_indices)
        self.P = (self.image_size // self.patch) ** 2 + 1  # +1 class token
        self.out_dim = self.E * (1 + len(self.inter_idx))
        self.dtype = dtype

    # -------------------------------------------------------------- specs
    def _blk(self, n):
        d, E, M = self.dtype, self.E, self.inter
        sd = lambda *sh: jax.ShapeDtypeStruct(sh, d)
        return {
            "ln1": {"w": sd(n, E), "b": sd(n, E)},
            "ln2": {"w": sd(n, E), "b": sd(n, E)},
            "q": {"w": sd(n, E, E)}, "k": {"w": sd(n, E, E)},
            "v": {"w": sd(n, E, E)}, "o": {"w": sd(n, E, E)},
            "fc1": {"w": sd(n, E, M), "b": sd(n, M)},
            "fc2": {"w": sd(n, M, E), "b": sd(n, E)},
        }

    def param_specs(self) -> Dict[str, Any]:
        d, E = self.dtype, self.E
        sd = lambda *sh: jax.ShapeDtypeStruct(sh, d)
        gblk = self._blk(self.g_depth)
        # [n, 1] not [n]: stacked scalar leaves index to numpy scalars in
        # the loader (no view to assign into)
        gblk["gate_attn"] = sd(self.g_depth, 1)
        gblk["gate_ffn"] = sd(self.g_depth, 1)
        return {
            "patch": {"w": sd(self.in_ch * self.patch * self.patch, E)},
            "class_emb": sd(E),
            "pos_emb": sd(self.P, E),
            "pos_gate": sd(1),
            "pos_tile": sd(self.max_ar + 1, self.max_tiles * self.P * E),
            "pre_tile": {"emb": sd(self.max_ar + 1, self.max_tiles * E),
                         "gate": sd(1)},
            "post_tile": {"emb": sd(self.max_ar + 1, self.max_tiles * E),
                          "gate": sd(1)},
            "ln_pre": {"w": sd(E), "b": sd(E)},
            "ln_post": {"w": sd(E), "b": sd(E)},
            "local": self._blk(self.depth),
            "global": gblk,
        }

    def param_partition_specs(self):
        return jax.tree.map(lambda _: P(), self.param_specs())

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        plan = {
            "patch_embedding.weight": ("patch", None, "mllama_conv"),
            "class_embedding": ("class_emb", None, "none"),
            "gated_positional_embedding.embedding": ("pos_emb", None, "none"),
            "gated_positional_embedding.gate": ("pos_gate", None, "none"),
            "gated_positional_embedding.tile_embedding.weight": ("pos_tile", None, "none"),
            "pre_tile_positional_embedding.embedding.weight": ("pre_tile.emb", None, "none"),
            "pre_tile_positional_embedding.gate": ("pre_tile.gate", None, "none"),
            "post_tile_positional_embedding.embedding.weight": ("post_tile.emb", None, "none"),
            "post_tile_positional_embedding.gate": ("post_tile.gate", None, "none"),
            "layernorm_pre.weight": ("ln_pre.w", None, "none"),
            "layernorm_pre.bias": ("ln_pre.b", None, "none"),
            "layernorm_post.weight": ("ln_post.w", None, "none"),
            "layernorm_post.bias": ("ln_post.b", None, "none"),
        }
        for pre, dest in (("transformer", "local"), ("global_transformer", "global")):
            b = pre + ".layers.{L}."
            plan.update({
                b + "input_layernorm.weight": (f"{dest}.ln1.w", None, "none"),
                b + "input_layernorm.bias": (f"{dest}.ln1.b", None, "none"),
                b + "post_attention_layernorm.weight": (f"{dest}.ln2.w", None, "none"),
                b + "post_attention_layernorm.bias": (f"{dest}.ln2.b", None, "none"),
                b + "self_attn.q_proj.weight": (f"{dest}.q.w", None, "t"),
                b + "self_attn.k_proj.weight": (f"{dest}.k.w", None, "t"),
                b + "self_attn.v_proj.weight": (f"{dest}.v.w", None, "t"),
                b + "self_attn.o_proj.weight": (f"{dest}.o.w", None, "t"),
                b + "mlp.fc1.weight": (f"{dest}.fc1.w", None, "t"),
                b + "mlp.fc1.bias": (f"{dest}.fc1.b", None, "none"),
                b + "mlp.fc2.weight": (f"{dest}.fc2.w", None, "t"),
                b + "mlp.fc2.bias": (f"{dest}.fc2.b", None, "none"),
            })
        plan["global_transformer.layers.{L}.gate_attn"] = ("global.gate_attn", None, "none")
        plan["global_transformer.layers.{L}.gate_ffn"] = ("global.gate_ffn", None, "none")
        return plan

    # ------------------------------------------------------------ forward
    def _block(self, bp, x, key_valid, gated=False):
        """x [T, E]; key_valid [T] bool — invalid keys masked out."""
        L = x.shape[0]
        y = layer_norm(x, bp["ln1"], 1e-5)
        q = (y @ bp["q"]["w"]).reshape(L, self.heads, self.hd)
        k = (y @ bp["k"]["w"]).reshape(L, self.heads, self.hd)
        v = (y @ bp["v"]["w"]).reshape(L, self.heads, self.hd)
        att = jnp.einsum("lhd,mhd->hlm", q, k).astype(jnp.float32)
        att = att * (self.hd ** -0.5)
        att = jnp.where(key_valid[None, None, :], att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("hlm,mhd->lhd", att.astype(v.dtype), v)
        o = o.reshape(L, self.E) @ bp["o"]["w"]
        if gated:
            o = jnp.tanh(bp["gate_attn"]) * o
        x = x + o
        y = layer_norm(x, bp["ln2"], 1e-5)
        y = jax.nn.gelu(y @ bp["fc1"]["w"] + bp["fc1"]["b"], approximate=False)
        y = y @ bp["fc2"]["w"] + bp["fc2"]["b"]
        if gated:
            y = jnp.tanh(bp["gate_ffn"]) * y
        return x + y

    def forward(self, params, pixel_tiles: jax.Array, ratio_id: int,
                n_tiles: int) -> jax.Array:
        """pixel_tiles [max_tiles, C, H, W] (zero-padded tiles), ratio_id
        into the aspect-ratio table -> [n_tiles * P, hidden*(1+K)]
        (un-projected; multi_modal_projector applies in the wrapper)."""
        mt, E, Pp = self.max_tiles, self.E, self.P
        ps = self.patch
        C, H, W = pixel_tiles.shape[1:]
        g = H // ps
        # conv as unfold+matmul: [mt, C, g, ps, g, ps] -> [mt, g*g, C*ps*ps]
        x = pixel_tiles.reshape(mt, C, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(mt, g * g, C * ps * ps).astype(self.dtype)
        x = x @ params["patch"]["w"]  # [mt, P-1, E]
        # pre-tile embedding (gated)
        pre = params["pre_tile"]["emb"][ratio_id].reshape(mt, 1, E)
        x = x + jnp.tanh(params["pre_tile"]["gate"]) * pre
        # class token
        cls = jnp.broadcast_to(params["class_emb"], (mt, 1, E)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)  # [mt, P, E]
        # gated positional + tile-positional embedding
        gate = jnp.tanh(params["pos_gate"])
        x = x + (1 - gate) * params["pos_emb"][None]
        tile_pos = params["pos_tile"][ratio_id].reshape(mt, Pp, E)
        x = x + gate * tile_pos
        x = layer_norm(x, params["ln_pre"], 1e-5)
        # pad patches per tile to %8 (HF does; affects attention row count)
        pad = (-Pp) % 8
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        Pt = Pp + pad
        valid = np.zeros((mt, Pt), bool)
        valid[:n_tiles, :Pp] = True
        valid = jnp.asarray(valid.reshape(-1))
        x = x.reshape(mt * Pt, E)
        inter = []
        for l in range(self.depth):
            if l in self.inter_idx:
                inter.append(x)
            bp = jax.tree.map(lambda a: a[l], params["local"])
            x = self._block(bp, x, valid)
        if self.depth in self.inter_idx:
            inter.append(x)
        x = layer_norm(x, params["ln_post"], 1e-5)
        # post-tile embedding + global transformer
        x = x.reshape(mt, Pt, E)
        post = params["post_tile"]["emb"][ratio_id].reshape(mt, 1, E)
        x = x + jnp.tanh(params["post_tile"]["gate"]) * post
        x = x.reshape(mt * Pt, E)
        for l in range(self.g_depth):
            bp = jax.tree.map(lambda a: a[l], params["global"])
            x = self._block(bp, x, valid, gated=True)
        # concat(final, intermediates), drop pad rows, keep real tiles
        feats = jnp.concatenate([x] + inter, axis=-1)  # [mt*Pt, E*(1+K)]
        feats = feats.reshape(mt, Pt, -1)[:, :Pp]
        return feats[:n_tiles].reshape(n_tiles * Pp, -1)


class MllamaForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True
    uses_cross_attention = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.scan_layers = False  # heterogeneous self/cross layers
        hf = config.hf_config
        self.image_token_index = getattr(hf, "image_token_index", 128256)
        self.vision_cfg = hf.vision_config
        self.tower = MllamaVisionModel(self.vision_cfg, self.dtype)
        self.cross_layers = set(
            getattr(hf.text_config, "cross_attention_layers", []) or []
        )
        self.n_vision_tokens = self.tower.max_tiles * self.tower.P

    # ------------------------------------------------------------- params
    def _self_layer_specs(self):
        """One llama layer's leaves, UNstacked (per-layer dict list)."""
        full = super().param_specs()["layers"]

        def unstack(s):
            return jax.ShapeDtypeStruct(s.shape[1:], s.dtype)

        return jax.tree.map(unstack, full)

    def _cross_layer_specs(self):
        c, d = self.config, self.dtype
        H = c.hidden_size
        sd = lambda *sh: jax.ShapeDtypeStruct(sh, d)
        return {
            "input_norm": sd(H),
            "q": {"w": sd(H, self.q_size)},
            "k": {"w": sd(H, self.kv_size)},
            "v": {"w": sd(H, self.kv_size)},
            "o": {"w": sd(self.q_size, H)},
            "q_norm": sd(self.head_dim),
            "k_norm": sd(self.head_dim),
            "attn_gate": sd(1),
            "mlp_gate": sd(1),
            "post_norm": sd(H),
            "gate_up": {"w": sd(H, 2 * c.intermediate_size)},
            "down": {"w": sd(c.intermediate_size, H)},
        }

    def param_specs(self) -> Dict[str, Any]:
        c, d = self.config, self.dtype
        self_specs = self._self_layer_specs()
        cross_specs = self._cross_layer_specs()
        layers = [
            cross_specs if l in self.cross_layers else self_specs
            for l in range(c.num_hidden_layers)
        ]
        specs = {
            "embed": {"w": jax.ShapeDtypeStruct(
                # mllama reserves 8 extra rows (<|image|> etc.)
                (c.vocab_size + 8, c.hidden_size), d)},
            "layers": layers,
            "final_norm": jax.ShapeDtypeStruct((c.hidden_size,), d),
            "lm_head": {"w": jax.ShapeDtypeStruct((c.hidden_size, c.vocab_size), d)},
            "vision": self.tower.param_specs(),
            "proj": {"w": jax.ShapeDtypeStruct(
                (self.tower.out_dim, c.hidden_size), d),
                "b": jax.ShapeDtypeStruct((c.hidden_size,), d)},
        }
        return specs

    def param_partition_specs(self) -> Dict[str, Any]:
        return jax.tree.map(lambda _: P(), self.param_specs())

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        c = self.config
        plan = {
            "language_model.model.embed_tokens.weight": ("embed.w", None, "none"),
            "language_model.model.norm.weight": ("final_norm", None, "none"),
            "language_model.lm_head.weight": ("lm_head.w", None, "t"),
            "multi_modal_projector.weight": ("proj.w", None, "t"),
            "multi_modal_projector.bias": ("proj.b", None, "none"),
        }
        for tmpl, act in self.tower.hf_weight_plan().items():
            plan["vision_model." + tmpl] = ("vision." + act[0],) + act[1:]
        I = c.intermediate_size
        for l in range(c.num_hidden_layers):
            b = f"language_model.model.layers.{l}."
            if l in self.cross_layers:
                plan.update({
                    b + "input_layernorm.weight": (f"layers.{l}.input_norm", None, "none"),
                    b + "cross_attn.q_proj.weight": (f"layers.{l}.q.w", None, "t"),
                    b + "cross_attn.k_proj.weight": (f"layers.{l}.k.w", None, "t"),
                    b + "cross_attn.v_proj.weight": (f"layers.{l}.v.w", None, "t"),
                    b + "cross_attn.o_proj.weight": (f"layers.{l}.o.w", None, "t"),
                    b + "cross_attn.q_norm.weight": (f"layers.{l}.q_norm", None, "none"),
                    b + "cross_attn.k_norm.weight": (f"layers.{l}.k_norm", None, "none"),
                    b + "cross_attn_attn_gate": (f"layers.{l}.attn_gate", None, "none"),
                    b + "cross_attn_mlp_gate": (f"layers.{l}.mlp_gate", None, "none"),
                    b + "post_attention_layernorm.weight": (f"layers.{l}.post_norm", None, "none"),
                    b + "mlp.gate_proj.weight": (f"layers.{l}.gate_up.w", (0, I), "t"),
                    b + "mlp.up_proj.weight": (f"layers.{l}.gate_up.w", (I, I), "t"),
                    b + "mlp.down_proj.weight": (f"layers.{l}.down.w", None, "t"),
                })
            else:
                plan.update({
                    b + "input_layernorm.weight": (f"layers.{l}.input_norm", None, "none"),
                    b + "self_attn.q_proj.weight": (f"layers.{l}.qkv_proj.w", (0, self.q_size), "t"),
                    b + "self_attn.k_proj.weight": (f"layers.{l}.qkv_proj.w", (self.q_size, self.kv_size), "t"),
                    b + "self_attn.v_proj.weight": (f"layers.{l}.qkv_proj.w", (self.q_size + self.kv_size, self.kv_size), "t"),
                    b + "self_attn.o_proj.weight": (f"layers.{l}.o_proj.w", None, "t"),
                    b + "post_attention_layernorm.weight": (f"layers.{l}.post_norm", None, "none"),
                    b + "mlp.gate_proj.weight": (f"layers.{l}.gate_up.w", (0, I), "t"),
                    b + "mlp.up_proj.weight": (f"layers.{l}.gate_up.w", (I, I), "t"),
                    b + "mlp.down_proj.weight": (f"layers.{l}.down.w", None, "t"),
                })
        # Refactored HF layout (transformers >= 4.52): language model nests
        # under model.language_model (inner "model." stripped), vision under
        # model.vision_model, projector under model., lm_head hoisted.
        for tmpl in list(plan):
            act = plan[tmpl]
            if tmpl.startswith("language_model.model."):
                plan["model.language_model." + tmpl[len("language_model.model."):]] = act
            elif tmpl == "language_model.lm_head.weight":
                plan["lm_head.weight"] = act
            elif tmpl.startswith(("vision_model.", "multi_modal_projector.")):
                plan["model." + tmpl] = act
        return plan

    def postprocess_weight(self, tag: str, arr: np.ndarray):
        if tag == "mllama_conv":
            # Conv2d kernel [E, C, ps, ps] -> flattened [C*ps*ps, E]
            return {"w": arr.reshape(arr.shape[0], -1).T}
        raise KeyError(tag)

    # ----------------------------------------------------------- vision
    def preprocess_image(self, image):
        """Host half of encode_images: normalize to padded tile pixels +
        static (ratio_id, n_tiles). Split from the device half so the
        runner can jit the tower with a replicated output sharding
        (multi-host lockstep, runtime/mirror.py)."""
        mt = self.tower.max_tiles
        if isinstance(image, dict):
            px = np.asarray(image["pixel_values"], np.float32)
            px = px.reshape((-1,) + px.shape[-3:])  # [tiles, C, H, W]
            ratio_id = int(np.asarray(image["aspect_ratio_ids"]).reshape(-1)[0])
            n_tiles = px.shape[0]
        else:
            px = np.asarray(image, np.float32)[None]
            ratio_id, n_tiles = 1, 1
        if px.shape[0] < mt:
            px = np.concatenate(
                [px, np.zeros((mt - px.shape[0],) + px.shape[1:], np.float32)]
            )
        return px, ratio_id, n_tiles

    def encode_tiles(self, params, px, ratio_id: int, n_tiles: int):
        """Device half: padded tiles -> projected cross states
        [n_tiles*P, text_hidden]. Pure traced math (jittable)."""
        feats = self.tower.forward(params["vision"], px, ratio_id, n_tiles)
        return (feats.astype(self.dtype) @ params["proj"]["w"]
                + params["proj"]["b"])

    def encode_images(self, params, image) -> np.ndarray:
        """image: dict from the HF processor ({pixel_values [.., tiles, C,
        H, W], aspect_ratio_ids, ...}) or raw [C, H, W] (single tile).
        Returns projected cross states [n_tiles*P, text_hidden]."""
        px, ratio_id, n_tiles = self.preprocess_image(image)
        return np.asarray(
            self.encode_tiles(params, jnp.asarray(px), ratio_id, n_tiles),
            np.float32)

    # ----------------------------------------------------------- forward
    def _cross_layer(self, lp, h, fb):
        c = self.config
        T = h.shape[0]
        cs = fb.cross_states  # [B, Nv, H]
        Nv = cs.shape[1]
        y = rms_norm(h, lp["input_norm"], c.rms_norm_eps)
        q = apply_linear(lp["q"], y).reshape(T, self.num_heads, self.head_dim)
        q = rms_norm(q, lp["q_norm"], c.rms_norm_eps)
        k = apply_linear(lp["k"], cs.astype(y.dtype)).reshape(
            -1, Nv, self.num_kv_heads, self.head_dim)
        k = rms_norm(k, lp["k_norm"], c.rms_norm_eps)
        v = apply_linear(lp["v"], cs.astype(y.dtype)).reshape(
            -1, Nv, self.num_kv_heads, self.head_dim)
        kq = k[fb.q_req_idx]  # [T, Nv, Hkv, D]
        vq = v[fb.q_req_idx]
        groups = self.num_heads // self.num_kv_heads
        kq = jnp.repeat(kq, groups, axis=2)
        vq = jnp.repeat(vq, groups, axis=2)
        att = jnp.einsum("thd,tnhd->thn", q, kq).astype(jnp.float32)
        att = att * (self.head_dim ** -0.5)
        n_valid = fb.cross_len[fb.q_req_idx]  # [T]
        att = jnp.where(
            jnp.arange(Nv)[None, None, :] < n_valid[:, None, None], att, -jnp.inf
        )
        att = jax.nn.softmax(att, axis=-1)
        att = jnp.nan_to_num(att)  # rows with no visible image: all -inf
        o = jnp.einsum("thn,tnhd->thd", att.astype(vq.dtype), vq)
        o = apply_linear(lp["o"], o.reshape(T, self.q_size))
        # visibility: request has an image AND this row is at/after it
        vis = (n_valid > 0) & (fb.q_pos >= fb.cross_from[fb.q_req_idx])
        visf = vis[:, None].astype(h.dtype)
        h = h + visf * jnp.tanh(lp["attn_gate"]) * o
        y = rms_norm(h, lp["post_norm"], c.rms_norm_eps)
        mlp = apply_linear(lp["down"], silu_and_mul(apply_linear(lp["gate_up"], y)))
        return h + visf * jnp.tanh(lp["mlp_gate"]) * mlp

    def forward(self, params, fb, kv, return_hidden: bool = False,
                all_logits: bool = False):
        c = self.config
        (kv_cache,) = kv
        h = jnp.take(params["embed"]["w"], fb.input_ids, axis=0)
        for l in range(c.num_hidden_layers):
            lp = params["layers"][l]
            if l in self.cross_layers:
                if fb.cross_states is not None:
                    h = self._cross_layer(lp, h, fb)
                # no image anywhere in the batch: exact identity — skip
            else:
                h, kv_cache = self._layer(lp, l, h, kv_cache, fb)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        last_h = h if all_logits else h[fb.logits_idx]
        from semi_pd_tpu.layers.linear import lm_head_logits

        logits = lm_head_logits(last_h, params["lm_head"], c.logit_softcap)
        if return_hidden:
            return logits, (kv_cache,), last_h
        return logits, (kv_cache,)
