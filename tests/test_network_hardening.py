"""Network sink hardening: MQTT TLS handshake, reconnect-after-drop, and
malformed WebSocket clients (ref src/output_mqtt.c:160-161 tls opts,
src/http_server.c websocket path).

Uses in-process stub servers — no external broker; certificates are
generated on the fly with the `cryptography` package.
"""

import json
import socket
import ssl
import struct
import threading
import time
import urllib.request

import pytest


# ---------------------------------------------------------------------------
# stub MQTT broker

class StubBroker:
    """Accepts MQTT CONNECT, answers CONNACK, records PUBLISH packets.
    Optionally drops the connection after CONNACK or after N publishes."""

    def __init__(self, tls_ctx=None, drop_after_publishes=None):
        self.srv = socket.socket()
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(4)
        self.port = self.srv.getsockname()[1]
        self.tls_ctx = tls_ctx
        self.drop_after = drop_after_publishes
        self.publishes = []
        self.connects = 0
        self.lock = threading.Lock()
        self.alive = True
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        while self.alive:
            try:
                self.srv.settimeout(0.2)
                conn, _ = self.srv.accept()
            except TimeoutError:
                continue
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    def _read_packet(self, conn):
        h = conn.recv(1)
        if not h:
            return None, None
        mult, rem = 1, 0
        while True:
            b = conn.recv(1)
            if not b:
                return None, None
            rem += (b[0] & 0x7F) * mult
            if not b[0] & 0x80:
                break
            mult *= 128
        body = b""
        while len(body) < rem:
            chunk = conn.recv(rem - len(body))
            if not chunk:
                return None, None
            body += chunk
        return h[0], body

    def _serve(self, conn):
        try:
            if self.tls_ctx:
                conn = self.tls_ctx.wrap_socket(conn, server_side=True)
            typ, body = self._read_packet(conn)
            if typ is None or (typ >> 4) != 1:  # CONNECT
                conn.close()
                return
            with self.lock:
                self.connects += 1
            conn.sendall(bytes([0x20, 2, 0, 0]))  # CONNACK ok
            n_pub = 0
            while True:
                typ, body = self._read_packet(conn)
                if typ is None:
                    return
                if (typ >> 4) == 3:  # PUBLISH
                    tlen = struct.unpack(">H", body[:2])[0]
                    topic = body[2:2 + tlen].decode()
                    rest = body[2 + tlen:]
                    qos = (typ >> 1) & 3
                    if qos:
                        mid = struct.unpack(">H", rest[:2])[0]
                        rest = rest[2:]
                        conn.sendall(bytes([0x40, 2]) +
                                     struct.pack(">H", mid))
                    with self.lock:
                        self.publishes.append((topic, rest.decode()))
                        n_pub += 1
                    if self.drop_after is not None and \
                            n_pub >= self.drop_after:
                        conn.close()
                        return
                elif (typ >> 4) == 14:  # DISCONNECT
                    conn.close()
                    return
        except (OSError, ssl.SSLError):
            pass

    def close(self):
        self.alive = False
        try:
            self.srv.close()
        except OSError:
            pass


def _make_cert(tmp_path):
    """Self-signed localhost certificate via `cryptography`."""
    import datetime
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(minutes=5))
            .not_valid_after(now + datetime.timedelta(days=1))
            .add_extension(x509.SubjectAlternativeName(
                [x509.IPAddress(__import__("ipaddress")
                                .ip_address("127.0.0.1"))]), critical=False)
            .sign(key, hashes.SHA256()))
    cert_pem = tmp_path / "cert.pem"
    key_pem = tmp_path / "key.pem"
    cert_pem.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_pem.write_bytes(key.private_bytes(
        serialization.Encoding.PEM, serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption()))
    return str(cert_pem), str(key_pem)


def _wait(cond, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.02)
    return False


def test_mqtt_tls_handshake_and_publish(tmp_path):
    """mqtts:// with a CA-verified self-signed broker certificate."""
    from rtl_433_tpu.output.network import MqttClient

    cert, key = _make_cert(tmp_path)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)
    broker = StubBroker(tls_ctx=ctx)
    try:
        cli = MqttClient("127.0.0.1", broker.port, tls=True,
                         tls_ca_cert=cert)
        cli.connect()
        cli.publish("rtl_433/test", '{"model":"TLS-Test"}')
        assert _wait(lambda: broker.publishes)
        assert broker.publishes[0] == ("rtl_433/test",
                                       '{"model":"TLS-Test"}')
        cli.close()
    finally:
        broker.close()


def test_mqtt_tls_rejects_untrusted_cert(tmp_path):
    """Without the CA the handshake must fail — no silent insecure send."""
    from rtl_433_tpu.output.network import MqttClient

    cert, key = _make_cert(tmp_path)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)
    broker = StubBroker(tls_ctx=ctx)
    try:
        cli = MqttClient("127.0.0.1", broker.port, tls=True)
        with pytest.raises((ssl.SSLError, ConnectionError, OSError)):
            cli.connect()
    finally:
        broker.close()


def test_mqtt_tls_insecure_allows_selfsigned(tmp_path):
    from rtl_433_tpu.output.network import MqttClient

    cert, key = _make_cert(tmp_path)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)
    broker = StubBroker(tls_ctx=ctx)
    try:
        cli = MqttClient("127.0.0.1", broker.port, tls=True,
                         tls_insecure=True)
        cli.connect()
        cli.publish("t", "x")
        assert _wait(lambda: broker.publishes)
        cli.close()
    finally:
        broker.close()


def test_mqtt_reconnects_after_broker_drop():
    """The broker drops the TCP connection after the first publish; the
    next publish must transparently reconnect and deliver."""
    from rtl_433_tpu.output.network import MqttClient

    broker = StubBroker(drop_after_publishes=1)
    try:
        cli = MqttClient("127.0.0.1", broker.port)
        cli.connect()
        cli.publish("a", "1")
        assert _wait(lambda: len(broker.publishes) >= 1)
        # wait for the drop to land client-side, then publish twice: the
        # first send may die on the dead socket (detected, socket reset),
        # the next must reconnect and deliver
        time.sleep(0.2)
        cli.publish("b", "2")
        cli.publish("b", "2")
        cli.publish("b", "2")
        assert _wait(lambda: any(t == "b" for t, _ in broker.publishes)), \
            broker.publishes
        assert broker.connects >= 2
        cli.close()
    finally:
        broker.close()


# ---------------------------------------------------------------------------
# HTTP/WS server hardening

def _read_some(port, request, wait=0.6):
    """Send a raw HTTP request, collect whatever arrives within ``wait``."""
    s = socket.create_connection(("127.0.0.1", port), timeout=2)
    s.sendall(request)
    s.settimeout(wait)
    buf = b""
    try:
        while True:
            chunk = s.recv(4096)
            if not chunk:
                break
            buf += chunk
    except TimeoutError:
        pass
    finally:
        s.close()
    return buf.decode(errors="replace")


def _events_snapshot(port):
    return _read_some(
        port, b"GET /events HTTP/1.1\r\nHost: x\r\n\r\n")


def test_ws_malformed_client_does_not_kill_server():
    from rtl_433_tpu.output.http_server import HttpServerSink
    from rtl_433_tpu.output.data_model import Event

    srv = HttpServerSink(host="127.0.0.1", port=0)
    port = srv.server.server_address[1]
    try:
        srv(Event.make(("model", "WS-Test"), ("id", 7)))
        assert "WS-Test" in _events_snapshot(port)

        # 1: garbage instead of an HTTP request
        s = socket.create_connection(("127.0.0.1", port), timeout=2)
        s.sendall(b"\x00\xff\x13\x37 not http at all\r\n\r\n")
        s.close()

        ws_upgrade = (b"GET /ws HTTP/1.1\r\nHost: x\r\n"
                      b"Connection: Upgrade\r\nUpgrade: websocket\r\n"
                      b"Sec-WebSocket-Key: AAAAAAAAAAAAAAAAAAAAAA==\r\n"
                      b"Sec-WebSocket-Version: 13\r\n\r\n")

        # 2: a WS upgrade missing its key header
        bad = _read_some(port, b"GET /ws HTTP/1.1\r\nHost: x\r\n"
                               b"Connection: Upgrade\r\n"
                               b"Upgrade: websocket\r\n\r\n")
        assert "400" in bad.splitlines()[0]

        # 3: a good upgrade followed by a truncated frame header
        s = socket.create_connection(("127.0.0.1", port), timeout=2)
        s.sendall(ws_upgrade)
        s.settimeout(2)
        assert b"101" in s.recv(1024)
        s.sendall(b"\x81")  # truncated frame header
        s.close()

        # 4: a good upgrade then a frame with an absurd declared length
        s = socket.create_connection(("127.0.0.1", port), timeout=2)
        s.sendall(ws_upgrade)
        s.settimeout(2)
        assert b"101" in s.recv(1024)
        s.sendall(b"\x81\xFF" + b"\xff" * 8)  # 64-bit len, no payload
        s.close()

        # the server must still answer normal requests with history intact
        time.sleep(0.3)
        assert "WS-Test" in _events_snapshot(port)
        srv(Event.make(("model", "After-Malformed"), ("id", 8)))
        assert "After-Malformed" in _events_snapshot(port)
    finally:
        srv.close()
