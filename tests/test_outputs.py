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
