"""DeepSeek-V2/V3: Multi-head Latent Attention + fine-grained MoE.

Reference: python/sglang/srt/models/deepseek_v2.py (DeepseekV2AttentionMLA
:393 with forward_normal/forward_absorb paths :591/:633; MoE block :141).
TPU-native differences:

- **Absorb-only attention.** The reference switches between a decompressed
  "normal" path (prefill) and the weight-absorbed path (decode). Here both
  phases run the absorbed form through the same ragged paged kernel: queries
  are projected into latent space (q_nope @ W_UK), the pool stores one
  [c_kv | k_pe] latent row per token (Hkv=1), V is the latent prefix of K,
  and W_UV is applied after attention. One code path, no decompression of
  history, and the MQA-style layout maps perfectly onto the paged kernel
  (reads are 1-head latent rows — the memory-bandwidth win that makes MLA
  attractive on TPU).
- **Dense-first + MoE layers via unrolled layer loop** (first_k_dense_replace
  dense layers break scan uniformity; scan is disabled for this family).
- DeepSeek-yarn rope mscale handled in ops/rope.py; the attention softmax
  scale gets the paper's mscale^2 correction.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.layers.attention import paged_attention_mla
from semi_pd_tpu.layers.linear import apply_linear
from semi_pd_tpu.models.llama import LlamaForCausalLM
from semi_pd_tpu.ops.elementwise import rms_norm, silu_and_mul
from semi_pd_tpu.ops.moe import moe_ffn, route_topk
from semi_pd_tpu.ops.rope import RotaryEmbedding
from semi_pd_tpu.runtime.forward_batch import ForwardArrays


class DeepseekV2ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        self.scan_layers = False  # heterogeneous layers (dense-first + MoE)
        self.dn = c.qk_nope_head_dim
        self.dr = c.qk_rope_head_dim
        self.dv = c.v_head_dim
        self.kv_lora = c.kv_lora_rank
        self.q_lora = c.q_lora_rank
        self.lat_dim = self.kv_lora + self.dr  # pool row width
        self.is_v3 = c.architecture == "DeepseekV3ForCausalLM"

        # softmax scale with deepseek-yarn mscale^2 correction (reference
        # deepseek_v2.py scaling block)
        self.scale = (self.dn + self.dr) ** -0.5
        rs = c.rope_scaling or {}
        if rs.get("mscale_all_dim"):
            factor = rs.get("factor", 1.0)
            m = 0.1 * rs["mscale_all_dim"] * math.log(factor) + 1.0 if factor > 1 else 1.0
            self.scale = self.scale * m * m

        # rope over the decoupled k_pe head only
        self.rope = RotaryEmbedding(
            head_dim=self.dr,
            rotary_dim=self.dr,
            max_position=c.context_length,
            theta=c.rope_theta,
            rope_scaling=c.rope_scaling,
            is_neox_style=False,  # HF deepseek interleaves (gpt-j style)
        )

    # ---------------------------------------------------------------- specs
    def _is_moe_layer(self, l: int) -> bool:
        c = self.config
        return (
            c.num_experts is not None
            and l >= c.first_k_dense_replace
            and l % c.moe_layer_freq == 0
        )

    def param_specs(self) -> Dict[str, Any]:
        c, d = self.config, self.dtype
        H = c.hidden_size
        Hq = c.num_attention_heads
        # Per-layer dicts in a list (unrolled loop; no stacking needed)
        layers = []
        for l in range(c.num_hidden_layers):
            attn = {
                "input_norm": jax.ShapeDtypeStruct((H,), d),
                "kv_a": {"w": jax.ShapeDtypeStruct((H, self.kv_lora + self.dr), d)},
                "kv_norm": jax.ShapeDtypeStruct((self.kv_lora,), d),
                "w_uk": jax.ShapeDtypeStruct((Hq, self.dn, self.kv_lora), d),
                "w_uv": jax.ShapeDtypeStruct((Hq, self.kv_lora, self.dv), d),
                "o_proj": {"w": jax.ShapeDtypeStruct((Hq * self.dv, H), d)},
                "post_norm": jax.ShapeDtypeStruct((H,), d),
            }
            if self.q_lora:
                attn["q_a"] = {"w": jax.ShapeDtypeStruct((H, self.q_lora), d)}
                attn["q_norm"] = jax.ShapeDtypeStruct((self.q_lora,), d)
                attn["q_b"] = {"w": jax.ShapeDtypeStruct((self.q_lora, Hq * (self.dn + self.dr)), d)}
            else:
                attn["q_proj"] = {"w": jax.ShapeDtypeStruct((H, Hq * (self.dn + self.dr)), d)}

            if self._is_moe_layer(l):
                E, F = c.num_experts, c.moe_intermediate_size
                attn["router"] = {"w": jax.ShapeDtypeStruct((H, E), d)}
                if self.is_v3:
                    attn["e_bias"] = jax.ShapeDtypeStruct((E,), jnp.float32)
                attn["experts"] = {
                    "gate_up": jax.ShapeDtypeStruct((E, H, 2 * F), d),
                    "down": jax.ShapeDtypeStruct((E, F, H), d),
                }
                if c.num_shared_experts:
                    FS = c.num_shared_experts * F
                    attn["shared"] = {
                        "gate_up": {"w": jax.ShapeDtypeStruct((H, 2 * FS), d)},
                        "down": {"w": jax.ShapeDtypeStruct((FS, H), d)},
                    }
            else:
                I = c.intermediate_size
                attn["gate_up"] = {"w": jax.ShapeDtypeStruct((H, 2 * I), d)}
                attn["down"] = {"w": jax.ShapeDtypeStruct((I, H), d)}
            layers.append(attn)

        specs = {
            "embed": {"w": jax.ShapeDtypeStruct((c.vocab_size, H), d)},
            "layers": layers,
            "final_norm": jax.ShapeDtypeStruct((H,), d),
        }
        if not c.tie_word_embeddings:
            specs["lm_head"] = {"w": jax.ShapeDtypeStruct((H, c.vocab_size), d)}
        return specs

    def param_partition_specs(self) -> Dict[str, Any]:
        c = self.config
        layers = []
        for l in range(c.num_hidden_layers):
            lp = {
                "input_norm": P(),
                "kv_a": {"w": P()},  # latent proj is small; replicate
                "kv_norm": P(),
                "w_uk": P("tp", None, None),  # shard q heads
                "w_uv": P("tp", None, None),
                "o_proj": {"w": P("tp", None)},
                "post_norm": P(),
            }
            if self.q_lora:
                lp["q_a"] = {"w": P()}
                lp["q_norm"] = P()
                lp["q_b"] = {"w": P(None, "tp")}
            else:
                lp["q_proj"] = {"w": P(None, "tp")}
            if self._is_moe_layer(l):
                lp["router"] = {"w": P()}
                if self.is_v3:
                    lp["e_bias"] = P()
                lp["experts"] = {
                    "gate_up": P(None, None, "tp"),
                    "down": P(None, "tp", None),
                }
                if c.num_shared_experts:
                    lp["shared"] = {
                        "gate_up": {"w": P(None, "tp")},
                        "down": {"w": P("tp", None)},
                    }
            else:
                lp["gate_up"] = {"w": P(None, "tp")}
                lp["down"] = {"w": P("tp", None)}
            layers.append(lp)
        specs = {
            "embed": {"w": P("tp", None)},
            "layers": layers,
            "final_norm": P(),
        }
        if not c.tie_word_embeddings:
            specs["lm_head"] = {"w": P(None, "tp")}
        return specs

    # --------------------------------------------------------------- weights
    def hf_weight_plan(self) -> Dict[str, Tuple]:
        """Per-layer dict params: plan paths use layers.{L}.<leaf> resolved by
        the loader's list indexing."""
        c = self.config
        Hq = c.num_attention_heads
        plan = {
            "model.embed_tokens.weight": ("embed.w", None, "none"),
            "lm_head.weight": ("lm_head.w", None, "t"),
            "model.norm.weight": ("final_norm", None, "none"),
            "model.layers.{L}.input_layernorm.weight": ("layers.{L}.input_norm", None, "none"),
            "model.layers.{L}.post_attention_layernorm.weight": ("layers.{L}.post_norm", None, "none"),
            "model.layers.{L}.self_attn.kv_a_proj_with_mqa.weight": ("layers.{L}.kv_a.w", None, "t"),
            "model.layers.{L}.self_attn.kv_a_layernorm.weight": ("layers.{L}.kv_norm", None, "none"),
            "model.layers.{L}.self_attn.kv_b_proj.weight": ("layers.{L}", None, "kv_b"),
            "model.layers.{L}.self_attn.o_proj.weight": ("layers.{L}.o_proj.w", None, "t"),
            # dense mlp
            "model.layers.{L}.mlp.gate_proj.weight": ("layers.{L}.gate_up.w", (0, c.intermediate_size), "t"),
            "model.layers.{L}.mlp.up_proj.weight": ("layers.{L}.gate_up.w", (c.intermediate_size, c.intermediate_size), "t"),
            "model.layers.{L}.mlp.down_proj.weight": ("layers.{L}.down.w", None, "t"),
        }
        if self.q_lora:
            plan.update({
                "model.layers.{L}.self_attn.q_a_proj.weight": ("layers.{L}.q_a.w", None, "t"),
                "model.layers.{L}.self_attn.q_a_layernorm.weight": ("layers.{L}.q_norm", None, "none"),
                "model.layers.{L}.self_attn.q_b_proj.weight": ("layers.{L}.q_b.w", None, "t"),
            })
        else:
            plan["model.layers.{L}.self_attn.q_proj.weight"] = ("layers.{L}.q_proj.w", None, "t")
        if c.num_experts:
            F = c.moe_intermediate_size
            plan.update({
                "model.layers.{L}.mlp.gate.weight": ("layers.{L}.router.w", None, "t"),
                "model.layers.{L}.mlp.experts.{E}.gate_proj.weight": ("layers.{L}.experts.gate_up", (0, F), "t"),
                "model.layers.{L}.mlp.experts.{E}.up_proj.weight": ("layers.{L}.experts.gate_up", (F, F), "t"),
                "model.layers.{L}.mlp.experts.{E}.down_proj.weight": ("layers.{L}.experts.down", None, "t"),
            })
            if self.is_v3:
                plan["model.layers.{L}.mlp.gate.e_score_correction_bias"] = ("layers.{L}.e_bias", None, "none")
            if c.num_shared_experts:
                FS = c.num_shared_experts * F
                plan.update({
                    "model.layers.{L}.mlp.shared_experts.gate_proj.weight": ("layers.{L}.shared.gate_up.w", (0, FS), "t"),
                    "model.layers.{L}.mlp.shared_experts.up_proj.weight": ("layers.{L}.shared.gate_up.w", (FS, FS), "t"),
                    "model.layers.{L}.mlp.shared_experts.down_proj.weight": ("layers.{L}.shared.down.w", None, "t"),
                })
        return plan

    def postprocess_weight(self, key: str, arr):
        """kv_b_proj [Hq*(dn+dv), kv_lora] -> w_uk [Hq, dn, lora] + w_uv
        [Hq, lora, dv] (the absorb-form split; reference deepseek_v2.py
        w_kc/w_vc split in load_weights / model_runner.py:547-555)."""
        import numpy as np

        Hq = self.config.num_attention_heads
        a = arr.reshape(Hq, self.dn + self.dv, self.kv_lora)
        w_uk = np.ascontiguousarray(a[:, : self.dn, :])  # [Hq, dn, lora]
        w_uv = np.ascontiguousarray(
            a[:, self.dn :, :].transpose(0, 2, 1)
        )  # [Hq, lora, dv]
        return {"w_uk": w_uk, "w_uv": w_uv}

    # --------------------------------------------------------------- forward
    def forward(self, params, fb: ForwardArrays, kv, return_hidden: bool = False,
                all_logits: bool = False):
        c = self.config
        (kv_cache,) = kv
        h = jnp.take(params["embed"]["w"], fb.input_ids, axis=0)
        if self.embed_scale is not None:  # minicpm3 scale_emb
            h = h * jnp.asarray(self.embed_scale, h.dtype)
        for l in range(c.num_hidden_layers):
            h, kv_cache = self._ds_layer(params["layers"][l], l, h, kv_cache, fb)
        h = rms_norm(h, params["final_norm"], c.rms_norm_eps)
        last_h = h if all_logits else h[fb.logits_idx]
        head = params.get("lm_head") or {"w": params["embed"]["w"].T}
        from semi_pd_tpu.layers.linear import lm_head_logits

        logits = lm_head_logits(last_h, head, c.logit_softcap)
        if self.logits_div is not None:  # minicpm3 hidden/dim_model_base
            logits = logits / jnp.asarray(self.logits_div, logits.dtype)
        if return_hidden:
            return logits, (kv_cache,), last_h
        return logits, (kv_cache,)

    def _ds_layer(self, lp, l, h, kv_cache, fb: ForwardArrays):
        c = self.config
        T = h.shape[0]
        Hq = c.num_attention_heads

        x = rms_norm(h, lp["input_norm"], c.rms_norm_eps)

        # --- q path
        if self.q_lora:
            qa = rms_norm(apply_linear(lp["q_a"], x), lp["q_norm"], c.rms_norm_eps)
            q = apply_linear(lp["q_b"], qa)
        else:
            q = apply_linear(lp["q_proj"], x)
        q = q.reshape(T, Hq, self.dn + self.dr)
        q_nope, q_pe = q[..., : self.dn], q[..., self.dn :]

        # --- latent kv path
        kv_a = apply_linear(lp["kv_a"], x)  # [T, lora + dr]
        c_kv = rms_norm(kv_a[..., : self.kv_lora], lp["kv_norm"], c.rms_norm_eps)
        k_pe = kv_a[..., self.kv_lora :].reshape(T, 1, self.dr)

        # rope on the decoupled dims (k_pe single shared head)
        q_pe, k_pe = self.rope(fb.q_pos, q_pe, k_pe)

        # --- absorb: q into latent space
        q_eff = jnp.einsum(
            "thd,hdk->thk", q_nope.astype(jnp.float32),
            lp["w_uk"].astype(jnp.float32),
        ).astype(q.dtype)  # [T, Hq, lora]
        q_cat = jnp.concatenate([q_eff, q_pe], axis=-1)  # [T, Hq, lora+dr]
        latent = jnp.concatenate([c_kv, k_pe[:, 0, :]], axis=-1)  # [T, lora+dr]

        attn_lat, kv_cache = paged_attention_mla(
            q_cat, latent, kv_cache, l, fb,
            page_size=self.page_size, scale=self.scale, v_dim=self.kv_lora,
        )  # [T, Hq, lora]

        # --- un-absorb: latent out -> per-head values
        attn = jnp.einsum(
            "thk,hkv->thv", attn_lat.astype(jnp.float32),
            lp["w_uv"].astype(jnp.float32),
        ).astype(h.dtype)  # [T, Hq, dv]
        attn_out = apply_linear(lp["o_proj"], attn.reshape(T, Hq * self.dv))
        if self.residual_mult is not None:  # minicpm3 scale_depth/sqrt(L)
            attn_out = attn_out * jnp.asarray(self.residual_mult, attn_out.dtype)
        h = h + attn_out

        # --- MLP / MoE
        y = rms_norm(h, lp["post_norm"], c.rms_norm_eps)
        if "experts" in lp:
            logits = apply_linear(lp["router"], y).astype(jnp.float32)
            # V2 "greedy" routing ignores groups; grouped selection applies
            # for group_limited_greedy (V2 large) and V3's noaux_tc.
            grouped = self.is_v3 or c.topk_method == "group_limited_greedy"
            weights, idx = route_topk(
                logits, c.num_experts_per_tok,
                scoring="sigmoid" if self.is_v3 else "softmax",
                norm_topk_prob=c.norm_topk_prob,
                n_group=c.n_group if grouped else None,
                topk_group=c.topk_group if grouped else None,
                routed_scaling_factor=c.routed_scaling_factor,
                e_score_bias=lp.get("e_bias"),
                group_score_func="top2" if self.is_v3 else "max",
            )
            out = moe_ffn(y, lp["experts"]["gate_up"], lp["experts"]["down"], weights, idx)
            if "shared" in lp:
                out = out + apply_linear(
                    lp["shared"]["down"],
                    silu_and_mul(apply_linear(lp["shared"]["gate_up"], y)),
                )
            mlp = out
        else:
            mlp = apply_linear(lp["down"], silu_and_mul(apply_linear(lp["gate_up"], y)))
        if self.residual_mult is not None:
            mlp = mlp * jnp.asarray(self.residual_mult, mlp.dtype)
        return h + mlp, kv_cache
