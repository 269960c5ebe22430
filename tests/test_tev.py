"""TEV IPC client smoke test against an in-process fake socket server
(VERDICT r4 next #10): asserts the exact byte protocol
([uint32 LE length][uint8 op][payload]) without a live viewer.

reference: the tev_bindings dependency driven from kernelsMod.f90
:1874-1887 (slice updates) and :2294-2299 (create image).
"""

import socket
import struct
import threading

import numpy as np

from rsmcrt_tpu.io.tev import TevIPC, tev_slices


class FakeTevServer:
    """Accepts one connection and records every protocol packet."""

    def __init__(self):
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.packets = []
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        conn, _ = self.sock.accept()
        conn.settimeout(5.0)
        buf = b""
        try:
            while True:
                data = conn.recv(65536)
                if not data:
                    break
                buf += data
                while len(buf) >= 5:
                    (length,) = struct.unpack("<I", buf[:4])
                    if len(buf) < length:
                        break
                    op = buf[4]
                    self.packets.append((op, buf[5:length]))
                    buf = buf[length:]
        except OSError:
            pass
        conn.close()

    def join(self):
        self.thread.join(timeout=5.0)
        self.sock.close()


def _read_str(payload):
    end = payload.index(b"\x00")
    return payload[:end].decode(), payload[end + 1:]


def test_tev_protocol_bytes():
    srv = FakeTevServer()
    tev = TevIPC(port=srv.port)
    assert tev.connected

    tev.close_image("run")
    tev.create_image("run", 8, 6)
    vol = np.arange(8 * 4 * 6, dtype=np.float32).reshape(8, 4, 6)
    tev_slices(tev, "run", vol)
    tev.close()
    srv.join()

    assert [op for op, _ in srv.packets] == [2, 4, 3, 3, 3]

    # op 2 CloseImage: null-terminated name
    _, close_payload = srv.packets[0]
    assert close_payload == b"run\x00"

    # op 4 CreateImage: grabFocus, name, w, h, nchannels, channel names
    _, create = srv.packets[1]
    grab, create = create[0], create[1:]
    assert grab == 1
    name, create = _read_str(create)
    assert name == "run"
    w, h, nch = struct.unpack("<iii", create[:12])
    assert (w, h, nch) == (8, 6, 3)
    rest = create[12:]
    chans = []
    for _ in range(nch):
        ch, rest = _read_str(rest)
        chans.append(ch)
    assert chans == ["I", "J", "K"]

    # op 3 UpdateImage x3: channel I/J/K mid-plane slices, row-major f32
    expected = [vol[:, 2, :], vol[4, :, :], vol[:, :, 3]]
    for (_, upd), chan, ref in zip(srv.packets[2:], "IJK", expected):
        grab, upd = upd[0], upd[1:]
        assert grab == 0
        name, upd = _read_str(upd)
        assert name == "run"
        ch, upd = _read_str(upd)
        assert ch == chan
        x, y, w, h = struct.unpack("<iiii", upd[:16])
        assert (x, y) == (0, 0)
        assert (h, w) == ref.shape
        img = np.frombuffer(upd[16:], np.float32).reshape(h, w)
        np.testing.assert_array_equal(img, ref.astype(np.float32))


def test_tev_absent_is_silent():
    """No listener: the client must disable itself without raising
    (the simulation never dies because the viewer is away)."""
    tev = TevIPC(port=1)  # nothing listens on port 1
    assert not tev.connected
    tev.create_image("x", 4, 4)
    tev.update_image("x", np.zeros((4, 4)))
    tev.close()
