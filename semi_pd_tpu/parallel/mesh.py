"""Device mesh construction.

Replaces the reference's entire L1 distributed stack (SURVEY.md §2.7:
GroupCoordinator/NCCL/custom all-reduce/shm broadcast, srt/distributed/ —
~3.5k LoC): on TPU the mesh + NamedSharding annotations ARE the distributed
runtime; XLA emits ICI/DCN collectives during compilation. Axis conventions:

- "dp": data parallel — replicas of the model; requests are partitioned.
- "tp": tensor parallel — attention heads / MLP width / vocab; MoE experts
  are also sharded over this axis (reference EPMoE shards experts over TP
  ranks the same way, layers/moe/ep_moe/layer.py:106).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    tp_size: int = 1,
    dp_size: int = 1,
    devices: Optional[Sequence] = None,
) -> Optional[Mesh]:
    devices = list(devices if devices is not None else jax.devices())
    need = tp_size * dp_size
    if need == 1 and len(devices) == 1:
        return None  # single device: skip sharding machinery entirely
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(dp_size, tp_size)
    return Mesh(arr, ("dp", "tp"))
