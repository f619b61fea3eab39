"""Live-path e2e over a fake rtl_tcp server (modeled on the reference's
tests/rtl_tcp_serve.py + http-rtltcp-test.sh, SURVEY.md §4.2)."""

import struct
import threading

import numpy as np
import pytest

from rtl_433_tpu.api import RtlTpu
from rtl_433_tpu.io.rtltcp import RtlTcpClient, RtlTcpServer

from synth import synth_ook, ppm_pulses


class FakeRtlTcp(threading.Thread):
    """Serves the rtl_tcp header, drains commands, streams one signal."""

    def __init__(self, iq_blocks):
        super().__init__(daemon=True)
        import socket
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.iq_blocks = iq_blocks
        self.commands = []

    def run(self):
        conn, _ = self.sock.accept()
        conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))

        def drain():
            try:
                while True:
                    buf = b""
                    while len(buf) < 5:
                        chunk = conn.recv(5 - len(buf))
                        if not chunk:
                            return
                        buf += chunk
                    self.commands.append(struct.unpack(">BI", buf))
            except OSError:
                pass

        drainer = threading.Thread(target=drain, daemon=True)
        drainer.start()
        try:
            import socket as _socket
            for blk in self.iq_blocks:
                conn.sendall(np.ascontiguousarray(blk, np.uint8).tobytes())
            conn.shutdown(_socket.SHUT_WR)
            drainer.join(timeout=10)
            conn.close()
        except OSError:
            pass


def _nexus_signal(n=131072):
    """One block of noise with an embedded Nexus PPM burst."""
    word = (0x4C << 28) | (1 << 27) | (215 << 12) | (0xF << 8) | 45
    bits = [(word >> (35 - i)) & 1 for i in range(36)]
    pulses = []
    for _ in range(4):
        pulses += [(500, 2000 if b else 1000) for b in bits]
        pulses.append((500, 4000))
    sig = synth_ook(pulses, rate=250_000)
    rng = np.random.default_rng(1)
    iq = rng.integers(123, 133, size=(n, 2), dtype=np.uint8)
    iq[2000:2000 + sig.shape[0]] = sig[:max(0, n - 2000)]
    return iq


def test_live_rtl_tcp_decode():
    blocks = [_nexus_signal(), np.full((131072, 2), 128, np.uint8)]
    srv = FakeRtlTcp(blocks)
    srv.start()
    rx = RtlTpu(register_all=False)
    rx.registry.register(19)  # nexus
    n = rx.run_live(f"rtl_tcp:127.0.0.1:{srv.port}", max_blocks=2)
    assert n >= 1
    ev = rx.events[-1]
    assert ev.get("model") == "Nexus-TH"
    assert ev.get("id") == 0x4C
    assert ev.get("temperature_C") == pytest.approx(21.5)
    # the client should have sent rate + frequency commands
    import time
    time.sleep(0.2)
    cmds = {c for c, _ in srv.commands}
    assert 0x01 in cmds and 0x02 in cmds


def test_live_rtl_tcp_gain_ppm():
    """-g / -p reach the tuner as rtl_tcp commands (0x04 gain tenth-dB,
    0x05 ppm correction; ref src/sdr.c set_gain / set_freq_correction)."""
    blocks = [np.full((131072, 2), 128, np.uint8)]
    srv = FakeRtlTcp(blocks)
    srv.start()
    rx = RtlTpu(register_all=False, gain_db=28.1, ppm_error=43)
    rx.registry.register(19)
    rx.run_live(f"rtl_tcp:127.0.0.1:{srv.port}", max_blocks=1)
    import time
    time.sleep(0.2)
    cmds = dict((c, v) for c, v in srv.commands)
    assert cmds.get(0x04) == 281
    assert cmds.get(0x05) == 43


def test_rtltcp_passthrough_server():
    srv = RtlTcpServer("127.0.0.1", 0)
    try:
        cli = RtlTcpClient("127.0.0.1", srv.port, block_samples=256)
        cli.connect()
        assert cli.tuner_type == 5
        cli.set_center_freq(433920000)
        got = []
        import time
        for _ in range(50):
            if srv.clients:
                break
            time.sleep(0.05)
        blk = np.arange(512, dtype=np.uint8).reshape(256, 2)
        srv.broadcast(blk)
        cli.run(lambda iq: got.append(iq), max_blocks=1)
        assert len(got) == 1
        np.testing.assert_array_equal(got[0], blk)
    finally:
        srv.close()


class StallingRtlTcp(threading.Thread):
    """Sends a few blocks, then stalls (socket stays open, no data) —
    exercises the watchdog (ref src/rtl_433.c:1352-1425)."""

    def __init__(self, iq_block, n_blocks=2, accepts=1):
        super().__init__(daemon=True)
        import socket
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(2)
        self.port = self.sock.getsockname()[1]
        self.iq_block = iq_block
        self.n_blocks = n_blocks
        self.accepts = accepts
        self.n_connects = 0
        self.stop_evt = threading.Event()

    def run(self):
        import socket as S
        conns = []
        try:
            for _ in range(self.accepts):
                conn, _ = self.sock.accept()
                self.n_connects += 1
                conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
                for _ in range(self.n_blocks):
                    conn.sendall(np.ascontiguousarray(
                        self.iq_block, np.uint8).tobytes())
                conns.append(conn)  # keep open but silent -> stall
            self.stop_evt.wait(30)
        except OSError:
            pass
        for c in conns:
            try:
                c.close()
            except OSError:
                pass


def test_watchdog_stall_quit():
    rng = np.random.default_rng(0)
    blk = rng.integers(120, 136, size=(4096, 2), dtype=np.uint8)
    srv = StallingRtlTcp(blk, n_blocks=2, accepts=1)
    srv.start()
    rx = RtlTpu(register_all=False)
    rx.registry.register(19)
    rx.run_live(f"rtl_tcp:127.0.0.1:{srv.port}", block_samples=4096,
                run_mode="quit", watchdog_interval=0.3)
    srv.stop_evt.set()
    assert rx.exit_code == 3          # stall exit (ref src/rtl_433.c:1412)
    assert rx._dev_state == "stopped"


def test_watchdog_stall_restart_reconnects():
    rng = np.random.default_rng(0)
    blk = rng.integers(120, 136, size=(4096, 2), dtype=np.uint8)
    srv = StallingRtlTcp(blk, n_blocks=1, accepts=2)
    srv.start()
    rx = RtlTpu(register_all=False)
    rx.registry.register(19)
    # restart mode: first stall triggers a reconnect; the second connection
    # also stalls, and with the server then refusing further accepts the
    # loop ends with a failed reconnect (exit_code 3 either way)
    rx.run_live(f"rtl_tcp:127.0.0.1:{srv.port}", block_samples=4096,
                run_mode="restart", watchdog_interval=0.3,
                duration=6.0)
    srv.stop_evt.set()
    assert srv.n_connects >= 2        # the watchdog reconnected


import socket
import struct
import time


class RateLimitedRtlTcp(threading.Thread):
    """Fake rtl_tcp server streaming noise at a fixed sample rate."""

    def __init__(self, rate_sps, seconds, block_samples=131072):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.rate = rate_sps
        self.n_blocks = max(1, int(seconds * rate_sps / block_samples))
        self.block_samples = block_samples

    def run(self):
        conn, _ = self.sock.accept()
        conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
        rng = np.random.default_rng(0)
        blk = rng.integers(123, 133,
                           size=self.block_samples * 2, dtype=np.uint8)
        period = self.block_samples / self.rate
        t_next = time.monotonic()
        try:
            for _ in range(self.n_blocks):
                t_next += period
                conn.sendall(blk.tobytes())
                delay = t_next - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
        except OSError:
            pass
        try:
            conn.close()
            self.sock.close()
        except OSError:
            pass


def test_ring_ingest_sustains_1msps_without_drops():
    """The native-ring live ingest must sustain 1.024 MS/s (ref 15 async
    buffers, include/sdr.h:17-18): consumer busy-time < block period, ring
    absorbs jitter, zero drops (VERDICT r1 item 7)."""
    from rtl_433_tpu.io.rtltcp import RtlTcpClient

    srv = RateLimitedRtlTcp(1_024_000, seconds=2.0)
    srv.start()
    cli = RtlTcpClient("127.0.0.1", srv.port, block_samples=131072)
    cli.connect()
    got = []

    def on_block(iq):
        time.sleep(0.02)  # simulated compute, well under the 128 ms period
        got.append(iq.shape[0])

    cli.run(on_block, use_ring=True)
    assert len(got) == srv.n_blocks
    assert cli.blocks_dropped == 0
