"""Multi-host mirroring: node 0's scheduler drives followers in lockstep.

Reference: the multi-node path fans every scheduler decision out over
torch.distributed/ZMQ (srt/managers/scheduler.py:645-660 recv_requests
TP-broadcast via utils.py:695 broadcast_pyobj; server_args.py:1145-1199
tcp:// channel derivation). TPU-native shape: jax multi-controller SPMD
requires each process to launch the IDENTICAL jit sequence over the global
mesh; only node 0 runs the scheduler/HTTP server, and a MirroredRunner
broadcasts each device transaction's HOST inputs over TickChannel so
followers replay it. Device state (KV pool, RNG key, chained decode
tokens) stays process-local and evolves identically by SPMD symmetry —
no device array ever crosses the wire.

Scope (validated in ServerArgs): the core serving loop — packed steps,
DP-attention packed steps, grammar/penalty masked steps, chained overlap
decode, fused readback — and online weight updates (disk/tensor/
distributed all funnel through the mirrored ``update_weights``).
Multimodal vision encodes are mirrored too (pixel inputs broadcast, the
vision jit replayed in lockstep with a replicated output sharding), and
so are the fused speculative rounds (EAGLE chain/tree, NGRAM verify) —
host batches + drafts/hidden seeds are host values already.
LoRA register/unload installs its stacked adapter pytree through the
mirrored ``install_lora`` (host values; replicated over the mesh), and
the hierarchical host-KV tier's page transfers mirror as ``hdl``
(lockstep gather with a replicated output node 0 reads) and ``hup``
(host page buffers scattered into each process's pool shards) — the
host-RAM tree itself lives on node 0 only, which is where the scheduler
that consults it runs.
"""

from __future__ import annotations

import logging
from typing import Any, List, Optional, Tuple

logger = logging.getLogger(__name__)


class MirroredRunner:
    """Wraps node 0's ModelRunner: broadcasts each device transaction's
    host-value inputs before executing it locally."""

    def __init__(self, runner, chan):
        self._r = runner
        self._chan = chan

    def __getattr__(self, name):
        return getattr(self._r, name)

    # -- mirrored device transactions ------------------------------------
    def step_packed(self, hb, prev_tokens=None):
        from semi_pd_tpu.runtime.forward_batch import ForwardMode

        packed = hb.pack()
        chained = prev_tokens is not None
        is_dec = hb.mode == ForwardMode.DECODE
        self._chan.broadcast(("sp", packed, chained, is_dec))
        return self._r.step_packed_raw(
            *packed, chained=chained, prev_tokens=prev_tokens,
            is_decode=is_dec,
        )

    def step_packed_dp(self, hb, prev_tokens=None):
        from semi_pd_tpu.runtime.forward_batch import ForwardMode

        ints, floats, shapes, perm, b2g = self._r._dp_blocked(hb)
        chained = prev_tokens is not None
        is_dec = hb.mode == ForwardMode.DECODE
        self._chan.broadcast(
            ("spdp", (ints, floats, shapes, perm, b2g), chained, is_dec))
        return self._r.step_packed_dp_raw(
            ints, floats, shapes, perm, b2g,
            chained=chained, prev_tokens=prev_tokens, is_decode=is_dec,
        )

    def step_host(self, hb, vocab_mask=None, penalties=None, chained=False):
        self._chan.broadcast(
            ("step", hb.wire(), vocab_mask, penalties, chained))
        return self._r.step_host(hb, vocab_mask, penalties, chained)

    def step_with_hidden_host(self, hb, vocab_mask=None):
        self._chan.broadcast(("hid", hb.wire(), vocab_mask))
        return self._r.step_with_hidden_host(hb, vocab_mask)

    def step_topk_host(self, hb, k, vocab_mask=None, penalties=None):
        self._chan.broadcast(("stepk", hb.wire(), k, vocab_mask, penalties))
        return self._r.step_topk_host(hb, k, vocab_mask, penalties)

    def score_topk_host(self, hb, targets, k):
        import numpy as np

        targets_np = np.asarray(targets)
        self._chan.broadcast(("scorek", hb.wire(), targets_np, k))
        return self._r.score_topk_host(hb, targets_np, k)

    def read_results(self, toks, lps, want_logprobs: bool = True):
        self._chan.broadcast(("read", len(toks), want_logprobs))
        return self._r.read_results(toks, lps, want_logprobs)

    def encode_step_host(self, hb):
        self._chan.broadcast(("enc", hb.wire()))
        return self._r.encode_step_host(hb)

    def score_step_host(self, hb, targets):
        import numpy as np

        targets_np = np.asarray(targets)
        self._chan.broadcast(("score", hb.wire(), targets_np))
        return self._r.score_step_host(hb, targets_np)

    # -- guarded: dispatching these on node 0 alone would desync or hang the
    # SPMD world (collectives / diverging replicas). ServerArgs validation
    # blocks most at startup; these are the runtime backstops.
    def update_weights(self, weights_iter, partial: bool = False):
        """Mirrored online weight update (reference model_runner.py:733-878:
        weight updates run uniformly on every TP worker). Tensors are HOST
        numpy values by the time they reach the runner, so they ride the
        same channel as every other host input: each tensor streams to the
        followers as it is consumed locally, then a commit message applies
        the update there with identical (name, value) pairs — SPMD symmetry
        shards each one the same way on every process."""
        import numpy as np

        tensors = [(n, np.asarray(v)) for n, v in weights_iter]
        for n, arr in tensors:
            self._chan.broadcast(("wupb", n, arr))
        # commit BEFORE the local update: followers apply concurrently, so
        # the cross-process gathers partial updates need (pulling a
        # globally-sharded leaf to host) line up instead of deadlocking
        self._chan.broadcast(("wupe", partial))
        return self._r.update_weights(tensors, partial=partial)

    def encode_images(self, pixel_values):
        import numpy as np

        px = np.asarray(pixel_values)
        self._chan.broadcast(("img", px))
        return self._r.encode_images(px)

    def encode_images_cross(self, image):
        self._chan.broadcast(("imgx", image))
        return self._r.encode_images_cross(image)

    def encode_images_patches(self, patches, grid):
        import numpy as np

        patches = np.asarray(patches)
        self._chan.broadcast(("imgp", patches, tuple(grid)))
        return self._r.encode_images_patches(patches, grid)

    def eagle_step_host(self, hb, prev_hidden, gamma):
        import numpy as np

        ph = np.asarray(prev_hidden)
        self._chan.broadcast(("eag", hb.wire(), ph, gamma))
        return self._r.eagle_step_host(hb, ph, gamma)

    def eagle_tree_step_host(self, hb, prev_hidden):
        import numpy as np

        ph = np.asarray(prev_hidden)
        self._chan.broadcast(("eagt", hb.wire(), ph))
        return self._r.eagle_tree_step_host(hb, ph)

    def spec_step_host(self, hb, drafts, draft_lens, gamma):
        import numpy as np

        d, dl = np.asarray(drafts), np.asarray(draft_lens)
        self._chan.broadcast(("spec", hb.wire(), d, dl, gamma))
        return self._r.spec_step_host(hb, d, dl, gamma)

    def download_pages_async(self, page_ids):
        import numpy as np

        pages = np.asarray(page_ids)
        self._chan.broadcast(("hdl", pages))
        return self._r.download_pages_async(pages)

    def upload_pages(self, page_ids, bufs):
        import numpy as np

        pages = np.asarray(page_ids)
        self._chan.broadcast(("hup", pages, bufs))
        return self._r.upload_pages(pages, bufs)

    def install_lora(self, lora_host_tree):
        self._chan.broadcast(("lora", lora_host_tree))
        return self._r.install_lora(lora_host_tree)

    def close(self):
        try:
            self._chan.broadcast(("stop",))
        except Exception:  # followers may be gone already
            pass
        self._chan.close()


def follower_main(server_args, model_config=None) -> None:
    """Node rank > 0 entrypoint: build the identical runner over the global
    mesh, then replay node 0's device transactions until a stop message."""
    from semi_pd_tpu.utils.multihost import TickChannel, init_multihost

    init_multihost(server_args)

    from semi_pd_tpu.parallel.mesh import create_mesh
    from semi_pd_tpu.runtime.batch import HostBatch
    from semi_pd_tpu.runtime.model_runner import ModelRunner

    mesh = create_mesh(
        tp_size=server_args.tp_size, dp_size=server_args.dp_size)
    runner = ModelRunner(server_args, model_config=model_config, mesh=mesh)
    chan = TickChannel(server_args)
    logger.info("follower %d ready", server_args.node_rank)

    ring: List[Tuple[Any, Any]] = []
    pending_weights: List[Tuple[str, Any]] = []
    while True:
        msg = chan.recv()
        kind = msg[0]
        if kind == "sp":
            _, packed, chained, is_dec = msg
            ring.append(runner.step_packed_raw(
                *packed, chained=chained, is_decode=is_dec))
        elif kind == "spdp":
            _, (ints, floats, shapes, perm, b2g), chained, is_dec = msg
            ring.append(runner.step_packed_dp_raw(
                ints, floats, shapes, perm, b2g,
                chained=chained, is_decode=is_dec))
        elif kind == "step":
            _, wire, mask, pen, chained = msg
            hb = HostBatch.from_wire(wire)
            ring.append(runner.step_host(hb, mask, pen, chained))
        elif kind == "hid":
            _, wire, mask = msg
            hb = HostBatch.from_wire(wire)
            t, l, _hidden = runner.step_with_hidden_host(hb, mask)
            ring.append((t, l))
        elif kind == "enc":
            runner.encode_step_host(HostBatch.from_wire(msg[1]))
        elif kind == "score":
            runner.score_step_host(HostBatch.from_wire(msg[1]), msg[2])
        elif kind == "stepk":
            # sync path on node 0 (np.asarray blocks there); followers just
            # replay the dispatch — the KV/RNG update is the side effect
            _, wire, k, mask, pen = msg
            runner.step_topk_host(HostBatch.from_wire(wire), k, mask, pen)
        elif kind == "scorek":
            runner.score_topk_host(HostBatch.from_wire(msg[1]), msg[2], msg[3])
        elif kind == "read":
            n = msg[1]
            want = msg[2] if len(msg) > 2 else True
            entries, ring = ring[:n], ring[n:]
            runner.read_results(
                [t for t, _ in entries], [l for _, l in entries], want)
        elif kind == "eag":
            runner.eagle_step_host(HostBatch.from_wire(msg[1]), msg[2], msg[3])
        elif kind == "eagt":
            runner.eagle_tree_step_host(HostBatch.from_wire(msg[1]), msg[2])
        elif kind == "spec":
            runner.spec_step_host(
                HostBatch.from_wire(msg[1]), msg[2], msg[3], msg[4])
        elif kind == "img":
            runner.encode_images(msg[1])
        elif kind == "imgx":
            runner.encode_images_cross(msg[1])
        elif kind == "imgp":
            runner.encode_images_patches(msg[1], msg[2])
        elif kind == "hdl":
            runner.download_pages_async(msg[1])  # lockstep gather; result
            # is node 0's to read — followers just keep dispatch order
        elif kind == "hup":
            runner.upload_pages(msg[1], msg[2])
        elif kind == "lora":
            runner.install_lora(msg[1])
        elif kind == "wupb":
            pending_weights.append((msg[1], msg[2]))
        elif kind == "wupe":
            runner.update_weights(pending_weights, partial=msg[1])
            pending_weights = []
        elif kind == "stop":
            logger.info("follower %d stopping", server_args.node_rank)
            return
        else:  # pragma: no cover
            raise ValueError(f"unknown mirror message {kind!r}")
