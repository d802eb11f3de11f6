"""TCP message framing (core/net.py — fyrox-core/src/net.rs parity)."""
import time

import pytest

from fyrox_tpu.core.net import NetListener, NetStream


def _drain(listener, deadline=5.0):
    t0 = time.time()
    while time.time() - t0 < deadline:
        conns = listener.accept_connections()
        if conns:
            return conns
        time.sleep(0.01)
    raise TimeoutError("no connection accepted")


def _pop(stream, deadline=5.0, raw=False):
    t0 = time.time()
    while time.time() - t0 < deadline:
        msg = stream.pop_message(raw=raw)
        if msg is not None:
            return msg
        time.sleep(0.01)
    raise TimeoutError("no message")


class TestNet:
    def test_roundtrip_json_messages(self):
        lst = NetListener.bind(("127.0.0.1", 0))
        try:
            client = NetStream.connect(lst.local_address())
            server = _drain(lst)[0]
            client.send_message({"hello": [1, 2, 3]})
            client.send_message("second")
            assert _pop(server) == {"hello": [1, 2, 3]}
            assert _pop(server) == "second"
        finally:
            lst.close()

    def test_partial_frame_waits(self):
        """A half-delivered frame yields None until the rest arrives
        (net.rs:118 'actual data could be missing')."""
        lst = NetListener.bind(("127.0.0.1", 0))
        try:
            client = NetStream.connect(lst.local_address())
            server = _drain(lst)[0]
            import json
            import struct
            blob = json.dumps({"x": 42}).encode()
            client._sock.sendall(struct.pack("<I", len(blob)) + blob[:2])
            time.sleep(0.1)
            assert server.pop_message() is None
            client._sock.sendall(blob[2:])
            assert _pop(server) == {"x": 42}
        finally:
            lst.close()

    def test_process_input_drains_all(self):
        lst = NetListener.bind(("127.0.0.1", 0))
        try:
            client = NetStream.connect(lst.local_address())
            server = _drain(lst)[0]
            for i in range(5):
                client.send_message(i)
            got = []
            t0 = time.time()
            while len(got) < 5 and time.time() - t0 < 5.0:
                server.process_input(got.append)
                time.sleep(0.01)
            assert got == [0, 1, 2, 3, 4]
        finally:
            lst.close()

    def test_raw_bytes_mode(self):
        lst = NetListener.bind(("127.0.0.1", 0))
        try:
            client = NetStream.connect(lst.local_address())
            server = _drain(lst)[0]
            client.send_message(b"\x00\xffraw")
            assert _pop(server, raw=True) == b"\x00\xffraw"
        finally:
            lst.close()

    def test_peer_address_strings(self):
        lst = NetListener.bind(("127.0.0.1", 0))
        try:
            client = NetStream.connect(lst.local_address())
            server = _drain(lst)[0]
            assert client.string_peer_address().startswith("127.0.0.1:")
            assert server.string_peer_address().startswith("127.0.0.1:")
        finally:
            lst.close()
