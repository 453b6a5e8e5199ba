"""VerlEngine: RL-framework (verl/OpenRLHF-style) integration shim.

Reference: srt/entrypoints/verl_engine.py (147 LoC) — an Engine wrapper the
trainer drives directly: rollout generation, in-place weight sync from
trainer tensors, and memory release/resume between rollout phases. TPU
notes: weight sync lands through device_put with the model's own
NamedShardings (no NCCL broadcast chain), and release/resume is bookkeeping
only — XLA buffers free when the params pytree is dropped."""

from __future__ import annotations

import logging
from typing import Any, Dict, Iterable, List, Optional, Tuple

logger = logging.getLogger(__name__)


class VerlEngine:
    def __init__(self, device_mesh=None, nnodes: int = 1, **kwargs):
        from semi_pd_tpu.runtime.engine import Engine

        self._engine = Engine(mesh=device_mesh, **kwargs)
        self._released = False

    # ------------------------------------------------------------ rollout
    def generate(self, prompt=None, input_ids=None, sampling_params=None,
                 return_logprob: bool = False):
        assert not self._released, "resume_memory_occupation() first"
        return self._engine.generate(
            prompt=prompt, input_ids=input_ids,
            sampling_params=sampling_params, return_logprob=return_logprob,
        )

    # ------------------------------------------------------- weight sync
    def update_weights_from_tensor(
        self, named_tensors: Iterable[Tuple[str, Any]], load_format=None
    ) -> bool:
        """Trainer → rollout weight sync (reference verl_engine.py
        update_weights_from_tensor: per-tensor broadcast + load)."""
        return self._engine.update_weights_from_tensor(list(named_tensors))

    def update_weights_from_disk(self, model_path: str) -> bool:
        return self._engine.update_weights_from_disk(model_path)

    # ---------------------------------------------------- memory control
    def release_memory_occupation(self) -> None:
        """Free the KV pool's HBM between rollout phases (reference
        torch_memory_saver pause): the pool's device buffers are deleted and
        reallocated on resume. Params stay resident."""
        if not self._engine.release_memory_occupation():
            raise RuntimeError(
                "release_memory_occupation refused: engine still has "
                "in-flight requests (drain rollouts first)")
        self._released = True

    def resume_memory_occupation(self) -> None:
        self._engine.resume_memory_occupation()
        self._released = False

    # ------------------------------------------------------------- misc
    @property
    def tokenizer(self):
        return self._engine.tokenizer

    def flush_cache(self) -> bool:
        return self._engine.flush_cache()

    def shutdown(self) -> None:  # symmetry with the reference API
        pass
