"""Asyncio UDP ingest (host side).

Replaces the reference's Boost.Asio receive loop
(/root/reference/include/udpsocket.hpp) with asyncio datagram endpoints. Same
semantics: per-socket receive buffer size, optional multicast join, optional
broadcast, an error callback, and delivery of each datagram to a user
callback. Optionally tees every datagram into a ReplayWriter for offline
replay. Never on the device critical path.
"""
from __future__ import annotations

import asyncio
import dataclasses
import socket
import struct
from typing import Callable, Optional

from .replay import ReplayWriter


@dataclasses.dataclass
class UdpConfig:
    host: str = "0.0.0.0"
    port: int = 7502
    buffer_size: int = 1 << 20
    multicast_group: Optional[str] = None
    broadcast: bool = False
    reuse_address: bool = True


class _Protocol(asyncio.DatagramProtocol):
    def __init__(self, on_data, on_error, recorder, stream_id, loop):
        self.on_data = on_data
        self.on_error = on_error
        self.recorder = recorder
        self.stream_id = stream_id
        self.loop = loop

    def datagram_received(self, data, addr):
        if self.recorder is not None:
            self.recorder.write(self.stream_id, self.loop.time(), data)
        self.on_data(data)

    def error_received(self, exc):
        if self.on_error:
            self.on_error(exc)


async def open_udp(
    cfg: UdpConfig,
    on_data: Callable[[bytes], None],
    on_error: Optional[Callable[[Exception], None]] = None,
    recorder: Optional[ReplayWriter] = None,
    stream_id: int = 0,
):
    """Open a UDP endpoint; returns the transport (call .close() to stop)."""
    loop = asyncio.get_running_loop()
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    if cfg.reuse_address:
        sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    if cfg.broadcast:
        sock.setsockopt(socket.SOL_SOCKET, socket.SO_BROADCAST, 1)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, cfg.buffer_size)
    sock.bind((cfg.host, cfg.port))
    if cfg.multicast_group:
        mreq = struct.pack(
            "4s4s",
            socket.inet_aton(cfg.multicast_group),
            socket.inet_aton(cfg.host if cfg.host != "0.0.0.0" else "0.0.0.0"),
        )
        sock.setsockopt(socket.IPPROTO_IP, socket.IP_ADD_MEMBERSHIP, mreq)
    sock.setblocking(False)
    transport, _ = await loop.create_datagram_endpoint(
        lambda: _Protocol(on_data, on_error, recorder, stream_id, loop), sock=sock
    )
    return transport
