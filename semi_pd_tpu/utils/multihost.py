"""Multi-host serving: process bootstrap + the mirror control channel.

Reference: srt/model_runner.py:285-324 + parallel_state.py init a
torch.distributed NCCL/gloo world per node and broadcast every scheduler
decision to TP peers via pickle-over-gloo (utils.py:695 broadcast_pyobj)
and ZMQ (server_args.py:1145-1199 tcp:// channels). TPU-native equivalent:
``jax.distributed.initialize`` gives one GLOBAL device mesh across hosts
(XLA emits ICI/DCN collectives from shardings); the only explicit
transport left is the CONTROL plane — node 0 runs the scheduler/HTTP
server and mirrors each device transaction to follower processes over a
length-prefixed pickle TCP channel so every process issues the identical
jit sequence (the SPMD launch rule).
"""

from __future__ import annotations

import logging
import pickle
import socket
import struct
import time
from typing import Any, Optional

logger = logging.getLogger(__name__)

_initialized = False


def init_multihost(server_args) -> bool:
    """jax.distributed bootstrap when --nnodes > 1. Must run before any
    other jax call so the process joins the global topology."""
    global _initialized
    if server_args.nnodes <= 1 or _initialized:
        return _initialized
    if not server_args.dist_init_addr:
        raise ValueError("--nnodes > 1 requires --dist-init-addr host:port")
    import jax

    kw = {}
    if server_args.dist_timeout is not None:
        # reference --dist-timeout (torch.distributed init timeout)
        kw["initialization_timeout"] = int(server_args.dist_timeout)
    jax.distributed.initialize(
        coordinator_address=server_args.dist_init_addr,
        num_processes=server_args.nnodes,
        process_id=server_args.node_rank,
        **kw,
    )
    _initialized = True
    logger.info(
        "multihost: process %d/%d joined (%d global / %d local devices)",
        server_args.node_rank, server_args.nnodes,
        jax.device_count(), jax.local_device_count(),
    )
    return True


def _mirror_endpoint(server_args) -> tuple:
    """The mirror channel listens next to the jax coordinator port."""
    host, port = server_args.dist_init_addr.rsplit(":", 1)
    return host, int(port) + 1


class TickChannel:
    """Rank-0 fan-out of pickled control messages to follower processes.

    FIFO per follower (TCP); a message is (name, *host_args) where every
    arg must be picklable host data — device arrays never cross this
    channel (each process owns its shards)."""

    def __init__(self, server_args):
        self.rank = server_args.node_rank
        self.world = server_args.nnodes
        host, port = _mirror_endpoint(server_args)
        accept_timeout = (server_args.dist_timeout
                          if server_args.dist_timeout is not None else 300.0)
        if self.rank == 0:
            srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            srv.bind(("0.0.0.0", port))
            srv.listen(self.world - 1)
            # don't hang boot forever on a lost node
            srv.settimeout(accept_timeout)
            self.peers = []
            for _ in range(self.world - 1):
                conn, addr = srv.accept()
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                self.peers.append(conn)
                logger.info("mirror: follower connected from %s", addr)
            srv.close()
            self.sock = None
        else:
            deadline = time.monotonic() + (
                accept_timeout if server_args.dist_timeout is not None
                else 120.0)
            while True:
                try:
                    self.sock = socket.create_connection((host, port), 5.0)
                    break
                except OSError:
                    if time.monotonic() > deadline:
                        raise
                    time.sleep(0.5)
            self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self.peers = []

    def broadcast(self, msg: Any) -> None:
        assert self.rank == 0
        blob = pickle.dumps(msg, protocol=pickle.HIGHEST_PROTOCOL)
        frame = struct.pack("<Q", len(blob)) + blob
        for p in self.peers:
            p.sendall(frame)

    def recv(self) -> Any:
        assert self.rank != 0
        hdr = self._read_exact(8)
        (n,) = struct.unpack("<Q", hdr)
        return pickle.loads(self._read_exact(n))

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("mirror channel closed")
            buf += chunk
        return buf

    def close(self) -> None:
        for p in self.peers:
            try:
                p.close()
            except OSError:
                pass
        if self.sock is not None:
            try:
                self.sock.close()
            except OSError:
                pass
