"""Tests for network sinks and the HTTP/WS control plane (SURVEY.md §2
components 18-24)."""

import base64
import hashlib
import json
import socket
import struct
import threading
import urllib.request

import pytest

from rtl_433_tpu.api import RtlTpu
from rtl_433_tpu.output.data_model import Event
from rtl_433_tpu.output.http_server import HttpServerSink, _WS_MAGIC
from rtl_433_tpu.output.network import (DataTagger, InfluxSink, MqttClient,
                                        MqttSink, SyslogSink, expand_topic)


def _ev():
    return Event.make(("model", "Nexus-TH"), ("id", 76), ("channel", 1),
                      ("temperature_C", 21.5))


def test_syslog_datagram():
    rsock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rsock.bind(("127.0.0.1", 0))
    rsock.settimeout(5)
    sink = SyslogSink("127.0.0.1", rsock.getsockname()[1])
    sink(_ev())
    msg = rsock.recv(2048).decode()
    assert msg.startswith("<165>1 ")
    assert "rtl_433 - - - " in msg
    payload = json.loads(msg.split(" - - - ", 1)[1])
    assert payload["model"] == "Nexus-TH"


def test_expand_topic():
    ev = _ev()
    t = expand_topic("rtl_433/host/devices[/model][/id]", ev, "host")
    assert t == "rtl_433/host/devices/Nexus-TH/76"
    t = expand_topic("base[/missing:fallback]", ev, "host")
    assert t == "base/fallback"


class FakeBroker(threading.Thread):
    """Accepts one MQTT connection, records PUBLISH topics/payloads."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.published = []
        self.ready = threading.Event()

    def run(self):
        conn, _ = self.sock.accept()
        buf = b""
        # CONNECT
        while len(buf) < 2:
            buf += conn.recv(4096)
        conn.sendall(bytes([0x20, 2, 0, 0]))  # CONNACK ok
        self.ready.set()
        conn.settimeout(5)
        data = b""
        try:
            while True:
                chunk = conn.recv(4096)
                if not chunk:
                    break
                data += chunk
                while len(data) >= 2:
                    # parse one packet
                    rem, i = 0, 1
                    mult = 1
                    while True:
                        if i >= len(data):
                            return
                        d = data[i]
                        rem += (d & 0x7F) * mult
                        mult *= 128
                        i += 1
                        if not (d & 0x80):
                            break
                    if len(data) < i + rem:
                        break
                    pkt, data = data[:i + rem], data[i + rem:]
                    if (pkt[0] >> 4) == 3:  # PUBLISH
                        tlen = struct.unpack(">H", pkt[i:i + 2])[0]
                        topic = pkt[i + 2:i + 2 + tlen].decode()
                        payload = pkt[i + 2 + tlen:]
                        self.published.append((topic, payload.decode()))
        except OSError:
            pass


def test_mqtt_sink_publishes():
    broker = FakeBroker()
    broker.start()
    client = MqttClient("127.0.0.1", broker.port, client_id="test")
    sink = MqttSink(client=client,
                    events="rtl_433/test/events",
                    devices="rtl_433/test/devices[/model][/id]",
                    availability=None)
    assert broker.ready.wait(5)
    sink(_ev())
    import time
    for _ in range(50):
        if len(broker.published) >= 4:
            break
        time.sleep(0.1)
    topics = [t for t, _ in broker.published]
    assert "rtl_433/test/events" in topics
    assert "rtl_433/test/devices/Nexus-TH/76/temperature_C" in topics
    ev_payload = dict(broker.published)["rtl_433/test/events"]
    assert json.loads(ev_payload)["id"] == 76


def test_influx_line_protocol():
    sink = InfluxSink()
    line = sink.line(_ev())
    assert line.startswith("Nexus-TH,id=76,channel=1 ")
    assert "temperature_C=21.5" in line


def test_data_tagger():
    tagger = DataTagger("key=value,FILE",
                        current_file_fn=lambda: "/tmp/g001_433.92M_250k.cu8")
    ev = tagger(_ev())
    assert ev.get("file") == "g001_433.92M_250k.cu8"
    assert ev.get("key") == "value"


def test_http_server_endpoints():
    rx = RtlTpu(register_all=True)
    sink = HttpServerSink(rx, "127.0.0.1", 0)
    port = sink.server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        sink(_ev())

        # index + metrics
        assert b"rtl_433_tpu" in urllib.request.urlopen(base + "/").read()
        metrics = urllib.request.urlopen(base + "/metrics").read().decode()
        assert "rtl433_events_total 1" in metrics

        # /cmd query + set
        r = json.loads(urllib.request.urlopen(
            base + "/cmd?cmd=settings").read())
        assert r["sample_rate"] == 250_000
        req = urllib.request.Request(
            base + "/cmd", data=json.dumps(
                {"cmd": "sample_rate", "val": 1024000}).encode(),
            method="POST")
        r = json.loads(urllib.request.urlopen(req).read())
        assert r["sample_rate"] == 1024000
        assert rx.sample_rate == 1024000

        # JSON-RPC
        req = urllib.request.Request(
            base + "/jsonrpc", data=json.dumps(
                {"jsonrpc": "2.0", "id": 7,
                 "method": "enabled_protocols"}).encode(), method="POST")
        r = json.loads(urllib.request.urlopen(req).read())
        assert r["id"] == 7 and 1 in r["result"]

        # WebSocket history replay
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        key = base64.b64encode(b"0123456789abcdef").decode()
        s.sendall((f"GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                   f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                   f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
        raw = b""
        while b"\r\n\r\n" not in raw:
            raw += s.recv(4096)
        head, rest = raw.split(b"\r\n\r\n", 1)
        resp = head.decode()
        assert "101" in resp.splitlines()[0]
        accept = base64.b64encode(hashlib.sha1(
            (key + _WS_MAGIC).encode()).digest()).decode()
        assert accept in resp
        # first frame should be the history-replayed event
        while len(rest) < 2:
            rest += s.recv(4096)
        hdr, rest = rest[:2], rest[2:]
        assert hdr[0] == 0x81
        n = hdr[1] & 0x7F
        payload = rest
        while len(payload) < n:
            payload += s.recv(n - len(payload))
        payload = payload[:n]
        assert json.loads(payload)["model"] == "Nexus-TH"
        s.close()
    finally:
        sink.close()


def test_kv_layout_and_colors():
    """-F kv: 26-column alignment, break rules, per-key value colors
    (ref src/output_file.c:326-370, :183-216)."""
    from rtl_433_tpu.output.data_model import Event, event_to_kv
    ev = Event.make(("time", "2026-08-17 00:00:00"), ("model", "Nexus-TH"),
                    ("id", 156, "House Code"), ("channel", 1, "Channel"),
                    ("temperature_C", 21.5, "Temperature", "%.2f C"))
    plain = event_to_kv(ev)
    lines = plain.splitlines()
    assert lines[0].startswith("time      : ")
    assert lines[1].startswith("model     : ")      # break before model
    assert "House Code: 156" in lines[1]            # aligned on same line
    assert lines[2].startswith("Channel")           # break after id
    colored = event_to_kv(ev, color=True)
    assert "\033[31mNexus-TH\033[0m" in colored     # model = red
    assert "\033[34m2026-08-17" in colored          # time = blue


def test_gpsd_tagger_live():
    """-K gpsd live tag: WATCH handshake, TPV filter, include keys
    (ref src/data_tag.c:26-180)."""
    import json as _json
    import socket
    import threading
    import time

    from rtl_433_tpu.output.data_model import Event
    from rtl_433_tpu.output.network import DataTagger

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    got_watch = []

    def serve():
        conn, _ = srv.accept()
        got_watch.append(conn.recv(256))
        conn.sendall(b'{"class":"VERSION","release":"3.0"}\n')
        conn.sendall(b'{"class":"TPV","lat":12.34,"lon":56.78,"alt":9.0}\n')
        time.sleep(1.0)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    tagger = DataTagger(f"gpsd:127.0.0.1:{port},lat,lon")
    try:
        deadline = time.monotonic() + 5
        while not tagger.client.msg and time.monotonic() < deadline:
            time.sleep(0.05)
        assert tagger.client.msg.startswith('{"class":"TPV"')
        assert b"WATCH" in got_watch[0]
        ev = tagger(Event.make(("model", "Test")))
        assert ev.get("lat") == 12.34
        assert ev.get("lon") == 56.78
        assert "alt" not in ev  # not in the include list
    finally:
        tagger.close()
        srv.close()


def test_mqtts_cli_flags():
    """mqtts/tls options reach the client config (no handshake here)."""
    from rtl_433_tpu.output.network import MqttClient
    c = MqttClient("h", 8883, tls=True, tls_insecure=True)
    assert c.tls and c.tls_insecure
    c2 = MqttClient("h", 8883, tls_ca_cert="/tmp/ca.pem")
    assert c2.tls


def test_noise_tracking_and_squelch():
    """r_flow noise EWMA + -Y squelch skip (ref src/r_flow.c:166-194)."""
    import numpy as np
    from rtl_433_tpu.api import RtlTpu
    rx = RtlTpu(register_all=False, squelch=True)
    rx.registry.register(19)
    noise = np.random.default_rng(0).integers(
        123, 133, size=(16384, 2), dtype=np.uint8)
    rx.push_block(noise)
    assert rx.total_frames_squelch == 1
    assert rx.noise_level != 0.0


def test_autolevel_adjusts_min_level(capsys):
    """-Y autolevel: quiet noise frames pull min_level_auto down to
    noise + 3 dB and re-arm the detector (ref src/r_flow.c:179-186)."""
    import numpy as np
    from rtl_433_tpu.api import RtlTpu
    rx = RtlTpu(register_all=False, auto_level=1)
    rx.registry.register(19)
    # very quiet noise: avg level well below the default -12.1 dB floor
    noise = np.random.default_rng(1).integers(
        127, 130, size=(16384, 2), dtype=np.uint8)
    for _ in range(4):
        rx.push_block(noise)
    assert rx.min_level_auto < rx.min_level_db - 3.0
    assert abs(rx.min_level_auto - (rx.noise_level + 3.0)) < 1e-6
    # the traced state carries the new level
    assert rx._params.min_high_level == rx.min_level_auto
    import numpy as _np
    assert _np.asarray(rx._state["min_high"])[0] == \
        rx._params.ook_min_high_level
    assert "adjusting minimum detection level" in capsys.readouterr().err


def test_autolevel_does_not_recompile():
    """A -Y autolevel retune must be a traced-state write, not a re-jit:
    the engine's jit cache stays at one entry across level changes
    (VERDICT r2 weak #4; ref src/pulse_detect.c:86-105 runtime set_levels)."""
    import numpy as np
    from rtl_433_tpu.api import RtlTpu
    rx = RtlTpu(register_all=False)  # autolevel off: we force retunes below
    rx.registry.register(19)
    noise = np.random.default_rng(2).integers(
        127, 130, size=(16384, 2), dtype=np.uint8)
    rx.push_block(noise)
    jit_fn = rx._jit
    n0 = jit_fn._cache_size()
    for lvl in (-15.0, -18.5, -21.2):  # arbitrary EWMA outputs, no 1 dB grid
        rx.min_level_auto = lvl
        rx._relevel()
        rx.push_block(noise)
        assert rx._params.min_high_level == lvl
    assert rx._jit is jit_fn, "engine was re-jitted on retune"
    assert jit_fn._cache_size() == n0, "level change caused a recompilation"
