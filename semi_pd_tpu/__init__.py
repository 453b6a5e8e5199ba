"""semi_pd_tpu — a TPU-native LLM serving framework with Semi-PD capabilities.

A from-scratch JAX/XLA/Pallas implementation of phase-wise disaggregated
(prefill/decode) LLM serving with unified storage (one weight copy, one paged
KV cache, one page table in HBM shared by both phases), following the
capability surface of infinigence/Semi-PD (see /root/repo/SURVEY.md) but
architected TPU-first:

- prefill and decode are two separately-jitted XLA programs over the same
  device mesh, sharing buffers via donation/aliasing (no IPC handles needed);
- compute isolation comes from SLO-bounded prefill chunk sizing instead of
  CUDA MPS SM percentages;
- collectives are XLA ICI collectives from NamedSharding/shard_map, not NCCL;
- hot kernels (ragged paged attention, quant matmuls, sampling) are Pallas.
"""

from semi_pd_tpu.version import __version__

__all__ = ["__version__"]
