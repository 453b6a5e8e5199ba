"""DeepSeek NextN / MTP speculative draft head.

Reference: srt/models/deepseek_nextn.py — the multi-token-prediction module
shipped with DeepSeek-V3: token embedding and lm_head are SHARED with the
target; the draft is enorm/hnorm -> eh_proj([norm(embed); norm(hidden)]) ->
one full DeepseekV2 decoder layer (MLA attention + MoE) -> shared_head.norm.

TPU-native integration: the module plugs into the same fused EAGLE round
programs (speculative/eagle.py eagle_round / eagle_tree_round) as the llama
EAGLE draft — chain or top-k tree drafting, one dispatch per round. Its
draft KV pool is the target's MLA latent layout with one layer, sharing the
unified slot space (pages/retraction/radix bookkeeping unchanged).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from semi_pd_tpu.layers.linear import apply_linear
from semi_pd_tpu.ops.elementwise import rms_norm
from semi_pd_tpu.runtime.forward_batch import ForwardArrays


class NextNDraftModel:
    """One DeepseekV2 decoder layer behind the eh_proj merge. Implements the
    EagleDraftModel interface (step / pre_head / param_specs / init_params)
    so the fused EAGLE rounds are draft-architecture-agnostic."""

    def __init__(self, target):
        # target: models.deepseek_v2.DeepseekV2ForCausalLM instance
        self.target = target
        self.config = target.config
        self.dtype = target.dtype
        self.page_size = target.page_size

    def _layer_spec_source(self) -> int:
        """NextN's decoder layer mirrors the target's LAST layer (MoE when
        the model is MoE — reference deepseek_nextn.py builds a
        DeepseekV2DecoderLayer from the full config)."""
        return self.config.num_hidden_layers - 1

    def param_specs(self) -> Dict[str, Any]:
        c, d = self.config, self.dtype
        H = c.hidden_size
        lsrc = self._layer_spec_source()
        return {
            "enorm": jax.ShapeDtypeStruct((H,), d),
            "hnorm": jax.ShapeDtypeStruct((H,), d),
            "eh_proj": {"w": jax.ShapeDtypeStruct((2 * H, H), d)},
            "head_norm": jax.ShapeDtypeStruct((H,), d),
            "layer": self.target.param_specs()["layers"][lsrc],
        }

    def param_partition_specs(self) -> Dict[str, Any]:
        lsrc = self._layer_spec_source()
        return {
            "enorm": P(),
            "hnorm": P(),
            "eh_proj": {"w": P()},
            "head_norm": P(),
            "layer": self.target.param_partition_specs()["layers"][lsrc],
        }

    def hf_weight_plan(self) -> Dict[str, Tuple]:
        """NextN checkpoints (e.g. DeepSeek-V3 mtp module) keep the layer
        under model.layers.<L>. with L = num_hidden_layers; plus the merge
        projections. The decoder-layer entries reuse the target's per-layer
        plan rewritten to the draft's 'layer.' prefix."""
        L = self.config.num_hidden_layers
        plan = {
            "enorm.weight": ("enorm", None, "none"),
            "hnorm.weight": ("hnorm", None, "none"),
            "eh_proj.weight": ("eh_proj.w", None, "t"),
            "shared_head.norm.weight": ("head_norm", None, "none"),
        }
        tgt_plan = self.target.hf_weight_plan()
        src_prefix = f"model.layers.{L - 1}."
        for hf_key, (dst, sl, tr) in tgt_plan.items():
            if hf_key.startswith(src_prefix):
                leaf = hf_key[len(src_prefix):]
                # target dst "layers.<l>.rest" -> draft dst "layer.rest"
                plan[f"model.layers.{L}.{leaf}"] = (
                    "layer." + dst.split(".", 2)[2], sl, tr,
                )
        return plan

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.default_rng(seed)

        def mk(spec):
            return jnp.asarray(
                rng.standard_normal(spec.shape, dtype=np.float32) * 0.02,
                dtype=spec.dtype,
            )

        return jax.tree.map(mk, self.param_specs())

    def step(
        self,
        dp: Dict[str, Any],
        tok_embed: jax.Array,  # [B, H] shared target embedding of the token
        hidden_feed: jax.Array,  # [B, H] previous hidden (target or draft)
        draft_kv: jax.Array,  # MLA latent pool [1, 1, S, 1, Dlat]
        positions: jax.Array,  # [B] ROPE position being written
        out_slots: jax.Array,
        page_table: jax.Array,
        kv_lens: jax.Array,
        attn_meta,
        mask_positions: Optional[jax.Array] = None,
        win_base: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        c = self.config
        B = tok_embed.shape[0]
        x = jnp.concatenate(
            [
                rms_norm(tok_embed, dp["enorm"], c.rms_norm_eps),
                rms_norm(hidden_feed, dp["hnorm"], c.rms_norm_eps),
            ],
            axis=-1,
        )
        h = apply_linear(dp["eh_proj"], x)
        fb_like = ForwardArrays(
            input_ids=jnp.zeros(B, jnp.int32),
            q_req_idx=jnp.arange(B, dtype=jnp.int32),
            q_pos=positions,
            out_slots=out_slots, page_table=page_table, kv_lens=kv_lens,
            logits_idx=jnp.arange(B, dtype=jnp.int32),
            sampling=None, rng_key=None,
            num_reqs=jnp.asarray(B, jnp.int32),
            attn_meta=attn_meta,
            mask_pos=mask_positions, win_base=win_base,
        )
        h, draft_kv = self.target._ds_layer(dp["layer"], 0, h, draft_kv, fb_like)
        return h, draft_kv

    def pre_head(self, dp: Dict[str, Any], h: jax.Array) -> jax.Array:
        """shared_head.norm before the (shared) lm_head."""
        return rms_norm(h, dp["head_norm"], self.config.rms_norm_eps)
