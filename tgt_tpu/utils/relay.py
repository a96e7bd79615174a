"""TPU-tunnel relay probe shared by bench.py and serving warmup.

The axon tunnel exposes two local relay ports; BOTH must accept
connections — a half-up relay (one port open, the other down) still hangs
`jax.devices()` / dispatch indefinitely (observed 2026-08-18: both ports
connection-refused for hours while the plugin retried internally). One
definition so the port list and the both-must-accept contract cannot
drift between the benchmark driver and production serving (round-5
review finding).
"""
from __future__ import annotations

RELAY_PORTS = (8082, 8083)


def relay_ports_open(timeout: float = 5.0) -> bool:
    """True when every tunnel relay port accepts a TCP connection."""
    import socket
    for port in RELAY_PORTS:
        try:
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=timeout):
                pass
        except OSError:
            return False
    return True
