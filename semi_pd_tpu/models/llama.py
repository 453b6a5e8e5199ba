"""Llama-family causal LMs (dense decoder, GQA, RoPE, SiLU-gated MLP).

Reference: python/sglang/srt/models/llama.py:337 LlamaForCausalLM (also
covers mistral/qwen2/internlm2/exaone/granite in the reference zoo — here one
implementation genuinely serves them all because differences are pure config:
qkv bias (qwen2), rope scaling, tied embeddings, logit softcap off).

TPU-native structure, deliberately unlike the reference's nn.Module tree:

- Params are a plain pytree with per-layer leaves **stacked** on a leading
  [L, ...] axis so the forward pass is a single ``lax.scan`` over layers —
  compile time is O(1) in depth (an 80-layer 70B traces as fast as a 2-layer
  toy) and XLA double-buffers the per-layer weight fetch from HBM.
- Tensor parallelism is sharding metadata, not code: ``param_partition_specs``
  maps each leaf to a PartitionSpec over the ("dp","tp") mesh; attention
  heads and MLP widths shard over "tp"; XLA inserts the collectives the
  reference issues by hand (tensor_model_parallel_all_reduce, llama.py:204).
- The KV pool rides through the scan carry; writes are in-place scatters on
  the donated unified-storage buffers (see layers/attention.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.config.model_config import ModelConfig
from semi_pd_tpu.layers.attention import paged_attention
from semi_pd_tpu.layers.linear import apply_linear, lm_head_logits
from semi_pd_tpu.ops.elementwise import ACT2FN, fused_add_rms_norm, rms_norm
from semi_pd_tpu.ops.rope import RotaryEmbedding
from semi_pd_tpu.runtime.forward_batch import ForwardArrays


class LlamaForCausalLM:
    """Functional model: holds config + rope table, params live in a pytree."""

    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        self.num_heads = c.num_attention_heads
        self.num_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        self.q_size = self.num_heads * self.head_dim
        self.kv_size = self.num_kv_heads * self.head_dim
        self.scale = self.head_dim ** -0.5
        self.dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        self.rope = RotaryEmbedding(
            head_dim=self.head_dim,
            rotary_dim=int(self.head_dim * c.partial_rotary_factor),
            max_position=c.context_length,
            theta=c.rope_theta,
            rope_scaling=c.rope_scaling,
            dtype=self.dtype,
        )
        # Non-gated families (phi/gpt2) override mlp_act instead; default
        # to the silu gate for acts without a gated mapping.
        self.act = ACT2FN.get(c.hidden_act, ACT2FN["silu"])
        # Qwen3-style per-head q/k RMSNorm (applied on head_dim before rope)
        self.use_qk_norm = c.architecture in (
            "Qwen3ForCausalLM", "Qwen3MoeForCausalLM",
        )
        # OLMoE-style full-projection q/k norm (over q_size/kv_size, pre-split)
        self.qk_norm_full = False
        # Family hooks consumed by subclasses (gemma: (1+w) rmsnorm + embed
        # scaling; granite: scalar multipliers)
        self.norm_fn = rms_norm
        self.embed_scale = None
        self.residual_mult = None
        self.logits_div = None
        # optional additive [vocab] bias on final logits (phi3small masks
        # tiktoken dummy tokens to -inf; reference phi3_small.py
        # dummy_token_indices index_fill_)
        self.logit_bias = None
        # Structural knobs for the LayerNorm families (gpt2/stablelm/phi/
        # cohere/starcoder2): norms carry a bias leaf; attn+mlp run in
        # parallel from one norm (phi/cohere); learned absolute positions;
        # rope disabled; biased lm_head (phi)
        self.norm_bias = False
        self.parallel_block = False
        self.pos_embed = False
        self.no_rope = False
        self.lm_head_bias = False
        self.qkv_clip = None  # olmo/dbrx clip_qkv
        # Double-sparsity attention (runner sets when enabled): [L, Hkv, C]
        # heavy-channel indices + top-k token budget (ops/attention/
        # double_sparsity.py). The KV pytree then carries a label buffer.
        self.ds_channels = None
        self.ds_heavy_token_num = 256
        self.ds_sparse_threshold = 4096  # dense below (cheaper and exact)
        # ALiBi position bias (baichuan-13b): [Hq] slopes; disables rope.
        # Routed through the jnp reference attention (the Pallas kernel has
        # no bias hook yet).
        self.alibi_slopes = None
        # Set by the runner before tracing (static under jit): property of the
        # memory pool, not the checkpoint.
        self.page_size = 16
        # scan_layers=True compiles O(1) in depth (lax.scan over stacked
        # params); False unrolls with python-int layer indices. The runner
        # picks per platform (Mosaic on v5e was observed to hang compiling
        # DMA offsets derived from traced layer indices; unrolled is the
        # conservative TPU default until that is root-caused).
        self.scan_layers = True

    # ------------------------------------------------------------- specs
    def _norm_spec(self, *shape):
        d = self.dtype
        if self.norm_bias:
            return {"w": jax.ShapeDtypeStruct(shape, d),
                    "b": jax.ShapeDtypeStruct(shape, d)}
        return jax.ShapeDtypeStruct(shape, d)

    def _norm_pspec(self):
        return {"w": P(), "b": P()} if self.norm_bias else P()

    def _norm_plan(self, hf_base: str, dest: str):
        if self.norm_bias:
            return {hf_base + ".weight": (dest + ".w", None, "none"),
                    hf_base + ".bias": (dest + ".b", None, "none")}
        return {hf_base + ".weight": (dest, None, "none")}

    def _norm(self, x, p):
        return self.norm_fn(x, p, self.config.rms_norm_eps)

    def param_specs(self) -> Dict[str, Any]:
        c, d = self.config, self.dtype
        L, H = c.num_hidden_layers, c.hidden_size
        qkv_out = self.q_size + 2 * self.kv_size
        layer = {
            "input_norm": self._norm_spec(L, H),
            "qkv_proj": {"w": jax.ShapeDtypeStruct((L, H, qkv_out), d)},
            "o_proj": {"w": jax.ShapeDtypeStruct((L, self.q_size, H), d)},
            **self._mlp_specs(),
        }
        if not self.parallel_block:
            layer["post_norm"] = self._norm_spec(L, H)
        if c.attention_bias:
            layer["qkv_proj"]["b"] = jax.ShapeDtypeStruct((L, qkv_out), d)
        if c.o_proj_bias:
            layer["o_proj"]["b"] = jax.ShapeDtypeStruct((L, H), d)
        if self.use_qk_norm:
            qn = self.q_size if self.qk_norm_full else self.head_dim
            kn = self.kv_size if self.qk_norm_full else self.head_dim
            layer["q_norm"] = jax.ShapeDtypeStruct((L, qn), d)
            layer["k_norm"] = jax.ShapeDtypeStruct((L, kn), d)
        specs = {
            "embed": {"w": jax.ShapeDtypeStruct((c.vocab_size, H), d)},
            "layers": layer,
            "final_norm": self._norm_spec(H),
        }
        if self.pos_embed:
            specs["pos_embed"] = {
                "w": jax.ShapeDtypeStruct((c.max_position_embeddings, H), d)
            }
        if not c.tie_word_embeddings:
            specs["lm_head"] = {"w": jax.ShapeDtypeStruct((H, c.vocab_size), d)}
            if self.lm_head_bias:
                specs["lm_head"]["b"] = jax.ShapeDtypeStruct((c.vocab_size,), d)
        return specs

    def param_partition_specs(self) -> Dict[str, Any]:
        """PartitionSpec per leaf over mesh axes ("dp", "tp")."""
        c = self.config
        layer = {
            "input_norm": self._norm_pspec(),
            "qkv_proj": {"w": P(None, None, "tp")},
            "o_proj": {"w": P(None, "tp", None)},
            **self._mlp_pspecs(),
        }
        if not self.parallel_block:
            layer["post_norm"] = self._norm_pspec()
        if c.attention_bias:
            layer["qkv_proj"]["b"] = P(None, "tp")
        if c.o_proj_bias:
            layer["o_proj"]["b"] = P()
        if self.use_qk_norm:
            layer["q_norm"] = P()
            layer["k_norm"] = P()
        specs = {
            "embed": {"w": P("tp", None)},
            "layers": layer,
            "final_norm": self._norm_pspec(),
        }
        if self.pos_embed:
            specs["pos_embed"] = {"w": P()}
        if not c.tie_word_embeddings:
            specs["lm_head"] = {"w": P(None, "tp")}
            if self.lm_head_bias:
                specs["lm_head"]["b"] = P("tp")
        return specs

    # ------------------------------------------------------------- init
    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        """Random-init params (tests/bench; reference counterpart: the
        load_format=dummy path in model_loader/loader.py)."""
        rng = np.random.default_rng(seed)

        def mk(spec):
            scale = 0.02
            a = rng.standard_normal(spec.shape, dtype=np.float32) * scale
            return jnp.asarray(a, dtype=spec.dtype)

        return jax.tree.map(mk, self.param_specs())

    # ------------------------------------------------------------- weights
    def hf_weight_plan(self) -> Dict[str, Tuple]:
        """Map HF checkpoint tensor name patterns -> (dest path, transform).

        Returns dict: hf_name_template -> (path_in_pytree, slot, transform)
        handled by model_loader.loader (reference: llama.py load_weights
        stacked-params mapping)."""
        plan = {
            "model.embed_tokens.weight": ("embed.w", None, "none"),
            **self._norm_plan("model.norm", "final_norm"),
            **self._norm_plan("model.layers.{L}.input_layernorm", "layers.input_norm"),
            "model.layers.{L}.self_attn.q_proj.weight": ("layers.qkv_proj.w", (0, self.q_size), "t"),
            "model.layers.{L}.self_attn.k_proj.weight": ("layers.qkv_proj.w", (self.q_size, self.kv_size), "t"),
            "model.layers.{L}.self_attn.v_proj.weight": ("layers.qkv_proj.w", (self.q_size + self.kv_size, self.kv_size), "t"),
            "model.layers.{L}.self_attn.o_proj.weight": ("layers.o_proj.w", None, "t"),
            **self._mlp_weight_plan(),
        }
        if not self.parallel_block:
            plan.update(self._norm_plan(
                "model.layers.{L}.post_attention_layernorm", "layers.post_norm"
            ))
        if self.config.o_proj_bias:
            plan["model.layers.{L}.self_attn.o_proj.bias"] = ("layers.o_proj.b", None, "none")
        if self.config.attention_bias:
            plan.update({
                "model.layers.{L}.self_attn.q_proj.bias": ("layers.qkv_proj.b", (0, self.q_size), "none"),
                "model.layers.{L}.self_attn.k_proj.bias": ("layers.qkv_proj.b", (self.q_size, self.kv_size), "none"),
                "model.layers.{L}.self_attn.v_proj.bias": ("layers.qkv_proj.b", (self.q_size + self.kv_size, self.kv_size), "none"),
            })
        if self.use_qk_norm:
            plan["model.layers.{L}.self_attn.q_norm.weight"] = ("layers.q_norm", None, "none")
            plan["model.layers.{L}.self_attn.k_norm.weight"] = ("layers.k_norm", None, "none")
        if self.pos_embed:
            plan["model.embed_positions.weight"] = ("pos_embed.w", None, "none")
        if not self.config.tie_word_embeddings:
            plan["lm_head.weight"] = ("lm_head.w", None, "t")
            if self.lm_head_bias:
                plan["lm_head.bias"] = ("lm_head.b", None, "none")
        return plan

    # ------------------------------------------------------------- forward
    def forward(
        self,
        params: Dict[str, Any],
        fb: ForwardArrays,
        kv: Tuple[jax.Array, ...],
        return_hidden: bool = False,
        all_logits: bool = False,
    ):
        c = self.config
        # kv is (pool,) or (pool, ds_labels) under double sparsity; thread
        # the whole tuple through the layer scan as one carry leaf group.
        kv_cache = kv if len(kv) > 1 else kv[0]
        h = jnp.take(params["embed"]["w"], fb.input_ids, axis=0)
        if self.embed_scale is not None:
            h = h * jnp.asarray(self.embed_scale, h.dtype)
        if self.pos_embed:
            h = h + jnp.take(params["pos_embed"]["w"], fb.q_pos, axis=0)
        if fb.embed_override is not None:
            # multimodal splice: image-patch features replace token embeds
            h = jnp.where(
                fb.embed_mask[:, None], fb.embed_override.astype(h.dtype), h
            )

        if self.scan_layers:
            layer_ids = jnp.arange(c.num_hidden_layers, dtype=jnp.int32)

            def body(carry, xs):
                h, kv_cache = carry
                lp, lid = xs
                h, kv_cache = self._layer(lp, lid, h, kv_cache, fb)
                return (h, kv_cache), None

            (h, kv_cache), _ = jax.lax.scan(
                body, (h, kv_cache), (params["layers"], layer_ids)
            )
        else:
            for l in range(c.num_hidden_layers):
                lp = jax.tree.map(lambda x: x[l], params["layers"])
                h, kv_cache = self._layer(lp, l, h, kv_cache, fb)

        h = self.norm_fn(h, params["final_norm"], c.rms_norm_eps)
        # all_logits: logits for every flat token row (input-logprob scoring,
        # reference: return_logprob + logprob_start_len in io_struct.py)
        last_h = h if all_logits else h[fb.logits_idx]  # [T|B, H]
        head = params.get("lm_head") or {"w": params["embed"]["w"].T}
        logits = lm_head_logits(last_h, head, c.logit_softcap)
        if self.logits_div is not None:
            logits = logits / jnp.asarray(self.logits_div, logits.dtype)
        if self.logit_bias is not None:
            logits = logits + jnp.asarray(self.logit_bias, logits.dtype)
        kv_out = kv_cache if isinstance(kv_cache, tuple) else (kv_cache,)
        if return_hidden:
            return logits, kv_out, last_h
        return logits, kv_out

    def forward_embedding(self, params, fb: ForwardArrays, kv):
        """Pooled sequence embedding (reference: layers/pooler.py LAST
        pooling + llama_embedding.py): normalized last-token hidden state."""
        c = self.config
        kv_cache = kv if len(kv) > 1 else kv[0]
        h = jnp.take(params["embed"]["w"], fb.input_ids, axis=0)
        if self.scan_layers:
            layer_ids = jnp.arange(c.num_hidden_layers, dtype=jnp.int32)

            def body(carry, xs):
                h, kv_cache = carry
                lp, lid = xs
                h, kv_cache = self._layer(lp, lid, h, kv_cache, fb)
                return (h, kv_cache), None

            (h, kv_cache), _ = jax.lax.scan(
                body, (h, kv_cache), (params["layers"], layer_ids)
            )
        else:
            for l in range(c.num_hidden_layers):
                lp = jax.tree.map(lambda x: x[l], params["layers"])
                h, kv_cache = self._layer(lp, l, h, kv_cache, fb)
        h = self.norm_fn(h, params["final_norm"], c.rms_norm_eps)
        emb = h[fb.logits_idx].astype(jnp.float32)  # [B, H] last-token pool
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )
        return emb, (kv_cache if isinstance(kv_cache, tuple) else (kv_cache,))

    def _layer(self, lp, layer_idx, h, kv_cache, fb: ForwardArrays):
        attn_in = self._norm(h, lp["input_norm"])
        attn_out, kv_cache = self._attn(lp, attn_in, layer_idx, fb, kv_cache)
        if self.parallel_block:
            # phi/cohere: attention and MLP both branch from the same norm
            mlp = self._mlp_lora(lp, attn_in, fb)
            return h + attn_out + mlp, kv_cache
        if self.residual_mult is not None:
            attn_out = attn_out * jnp.asarray(self.residual_mult, attn_out.dtype)
        h = h + attn_out

        mlp_in = self._norm(h, lp["post_norm"])
        mlp = self._mlp_lora(lp, mlp_in, fb)
        if self.residual_mult is not None:
            mlp = mlp * jnp.asarray(self.residual_mult, mlp.dtype)
        return h + mlp, kv_cache

    def _attn(self, lp, attn_in, layer_idx, fb: ForwardArrays, kv_cache):
        """Normed input -> o_proj output (qkv, qk-norm, rope, paged attention,
        LoRA deltas)."""
        c = self.config
        T = attn_in.shape[0]
        lora = lp.get("lora") if isinstance(lp, dict) else None
        li = fb.lora_idx

        qkv = apply_linear(lp["qkv_proj"], attn_in)
        if self.qkv_clip is not None:
            qkv = jnp.clip(qkv, -self.qkv_clip, self.qkv_clip)
        if lora is not None and li is not None:
            from semi_pd_tpu.ops.moe import grouped_apply

            qkv = qkv + grouped_apply(attn_in, lora["qkv_a"], lora["qkv_b"], li)
        q, k, v = jnp.split(qkv, [self.q_size, self.q_size + self.kv_size], axis=-1)
        if self.use_qk_norm and self.qk_norm_full:
            q = self.norm_fn(q, lp["q_norm"], c.rms_norm_eps)
            k = self.norm_fn(k, lp["k_norm"], c.rms_norm_eps)
        q = q.reshape(T, self.num_heads, self.head_dim)
        k = k.reshape(T, self.num_kv_heads, self.head_dim)
        v = v.reshape(T, self.num_kv_heads, self.head_dim)
        if self.use_qk_norm and not self.qk_norm_full:
            q = self.norm_fn(q, lp["q_norm"], c.rms_norm_eps)
            k = self.norm_fn(k, lp["k_norm"], c.rms_norm_eps)
        if not self.no_rope:
            pos = fb.q_pos
            if getattr(self, "uses_mrope", False) and fb.mrope_pos is not None:
                pos = fb.mrope_pos
            q, k = self.rope(pos, q, k)

        if isinstance(kv_cache, tuple):
            from semi_pd_tpu.ops.attention.double_sparsity import (
                paged_attention_ds,
            )

            pool, labels = kv_cache
            attn_out, pool, labels = paged_attention_ds(
                q, k, v, pool, labels, self.ds_channels, layer_idx, fb,
                page_size=self.page_size, scale=self.scale,
                heavy_token_num=self.ds_heavy_token_num,
                sparse_threshold=self.ds_sparse_threshold,
            )
            kv_cache = (pool, labels)
        else:
            attn_out, kv_cache = paged_attention(
                q, k, v, kv_cache, layer_idx, fb,
                page_size=self.page_size, scale=self.scale,
                logit_cap=c.attn_logit_softcap, sliding_window=c.sliding_window,
                alibi_slopes=self.alibi_slopes,
            )
        attn_flat = attn_out.reshape(T, self.q_size)
        attn_out = apply_linear(lp["o_proj"], attn_flat)
        if lora is not None and li is not None:
            from semi_pd_tpu.ops.moe import grouped_apply

            attn_out = attn_out + grouped_apply(
                attn_flat, lora["o_a"], lora["o_b"], li
            )
        return attn_out, kv_cache

    def _mlp_lora(self, lp, mlp_in, fb: ForwardArrays):
        lora = lp.get("lora") if isinstance(lp, dict) else None
        li = fb.lora_idx
        if lora is None or li is None:
            return self._mlp(lp, mlp_in)
        from semi_pd_tpu.ops.moe import grouped_apply

        gu = apply_linear(lp["gate_up"], mlp_in) + grouped_apply(
            mlp_in, lora["gate_up_a"], lora["gate_up_b"], li
        )
        act = self.act(gu)
        return apply_linear(lp["down"], act) + grouped_apply(
            act, lora["down_a"], lora["down_b"], li
        )

    # ------------------------------------------------- MLP hooks (overridable
    # by MoE subclasses: qwen2_moe.py, deepseek_v2.py)
    def _mlp_specs(self) -> Dict[str, Any]:
        c, d = self.config, self.dtype
        L, H = c.num_hidden_layers, c.hidden_size
        return {
            "gate_up": {"w": jax.ShapeDtypeStruct((L, H, 2 * c.intermediate_size), d)},
            "down": {"w": jax.ShapeDtypeStruct((L, c.intermediate_size, H), d)},
        }

    def _mlp_pspecs(self) -> Dict[str, Any]:
        return {
            "gate_up": {"w": P(None, None, "tp")},
            "down": {"w": P(None, "tp", None)},
        }

    def _mlp_weight_plan(self) -> Dict[str, Any]:
        I = self.config.intermediate_size
        return {
            "model.layers.{L}.mlp.gate_proj.weight": ("layers.gate_up.w", (0, I), "t"),
            "model.layers.{L}.mlp.up_proj.weight": ("layers.gate_up.w", (I, I), "t"),
            "model.layers.{L}.mlp.down_proj.weight": ("layers.down.w", None, "t"),
        }

    def _mlp(self, lp, x):
        return apply_linear(lp["down"], self.act(apply_linear(lp["gate_up"], x)))
