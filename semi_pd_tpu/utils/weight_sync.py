"""Trainer->server live weight sync over a TCP tensor stream.

TPU-native counterpart of the reference's distributed weight-update path
(srt/model_executor/model_runner.py:845 update_weights_from_distributed +
:1599-era init_weights_update_group): the reference joins a NCCL group with
the RL trainer and receives a `torch.distributed.broadcast` per tensor. On
TPU there is no NCCL process group to join — the idiomatic replacement is a
host-side transport (the trainer pushes raw tensor bytes over TCP, exactly
one transfer per tensor) feeding the existing in-place params update; XLA
re-shards onto the mesh via the normal device_put path.

Framing per tensor (all little-endian):
    [8-byte u64 header_len][header JSON: {name, dtype, shape}]
    [8-byte u64 data_len][raw C-order bytes]

The trainer side (`WeightSyncPublisher`) binds/listens; the server side
(`WeightSyncGroup`) connects — mirroring the reference where the trainer is
rank 0 / master of the update group.
"""

from __future__ import annotations

import json
import logging
import socket
import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_U64 = struct.Struct("<Q")


def _send_frame(sock: socket.socket, payload: bytes) -> None:
    sock.sendall(_U64.pack(len(payload)))
    sock.sendall(payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = sock.recv_into(view[got:], n - got)
        if r == 0:
            raise ConnectionError("weight-sync peer closed mid-frame")
        got += r
    return bytes(buf)


def _recv_frame(sock: socket.socket) -> bytes:
    (n,) = _U64.unpack(_recv_exact(sock, 8))
    return _recv_exact(sock, n)


class WeightSyncGroup:
    """Server side: joins the trainer's update group (connects to master)."""

    def __init__(self, master_address: str, master_port: int,
                 group_name: str = "weight_update_group", timeout: float = 60.0):
        self.group_name = group_name
        self.sock = socket.create_connection(
            (master_address, master_port), timeout=timeout
        )
        self.sock.settimeout(timeout)
        # Hello: announce group membership (role of init_process_group rank join)
        _send_frame(self.sock, json.dumps({"group_name": group_name}).encode())
        logger.info("weight-sync group %r joined %s:%d",
                    group_name, master_address, master_port)

    def recv_tensors(self, names: List[str], dtypes: List[str],
                     shapes: List[List[int]]) -> Iterator[Tuple[str, np.ndarray]]:
        """Receive one tensor per (name, dtype, shape) announcement.

        The announcements arrive via the HTTP request (reference
        io_struct UpdateWeightsFromDistributedReqInput carries name/dtype/
        shape); the bytes arrive on the group socket in the same order.
        """
        for name, dtype, shape in zip(names, dtypes, shapes):
            header = json.loads(_recv_frame(self.sock).decode())
            if header["name"] != name:
                raise ValueError(
                    f"weight-sync order mismatch: expected {name!r}, "
                    f"trainer sent {header['name']!r}"
                )
            data = _recv_frame(self.sock)
            want_dt = np.dtype(_canon_dtype(dtype))
            arr = np.frombuffer(data, dtype=np.dtype(_canon_dtype(header["dtype"])))
            arr = arr.reshape(header["shape"]).astype(want_dt, copy=False)
            if list(arr.shape) != list(shape):
                raise ValueError(
                    f"weight-sync shape mismatch for {name!r}: "
                    f"announced {shape}, received {list(arr.shape)}"
                )
            yield name, arr

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class WeightSyncPublisher:
    """Trainer side: binds the master port and pushes tensors (test/RL-loop
    helper; the reference's analog is the trainer's broadcast rank)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.server.bind((host, port))
        self.server.listen(1)
        self.port = self.server.getsockname()[1]
        self.conn: Optional[socket.socket] = None

    def accept(self, timeout: float = 60.0) -> str:
        self.server.settimeout(timeout)
        self.conn, _ = self.server.accept()
        hello = json.loads(_recv_frame(self.conn).decode())
        return hello["group_name"]

    def send_tensor(self, name: str, arr: np.ndarray) -> None:
        assert self.conn is not None, "accept() first"
        arr = np.ascontiguousarray(arr)
        header = {"name": name, "dtype": str(arr.dtype), "shape": list(arr.shape)}
        _send_frame(self.conn, json.dumps(header).encode())
        _send_frame(self.conn, arr.tobytes())

    def close(self) -> None:
        for s in (self.conn, self.server):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass


def _canon_dtype(dtype: str) -> str:
    """Accept torch-style ('torch.bfloat16') and jax/numpy-style names."""
    d = dtype.split(".")[-1]
    if d == "bfloat16":
        # numpy has no bf16; ml_dtypes registers it under jax
        import ml_dtypes  # noqa: F401

        return "bfloat16"
    return d
