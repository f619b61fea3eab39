"""Differential tests: native batch slicer bank vs the Python slicers.

The native library (native/slicers.cpp) must reproduce the exact-semantics
Python slicers (rtl_433_tpu/pulse/slicers.py) bit-for-bit, and the fast
registry dispatch (_run_fast) must produce identical events, in identical
order, to the per-decoder host dispatch (_run_host) — including the decode
dedup and gate layers.
"""

import numpy as np
import pytest

from rtl_433_tpu.decoders import Registry
from rtl_433_tpu.decoders.gates import GATES
from rtl_433_tpu.bits.bitbuffer import BitBuffer
from rtl_433_tpu.output.data_model import event_to_json
from rtl_433_tpu.pulse import native_slicers, slicers
from rtl_433_tpu.pulse.data import PulseData

pytestmark = pytest.mark.skipif(not native_slicers.available(),
                                reason="native slicer library unavailable")


def _key(bits):
    return (bits.num_rows, tuple(bits.bits_per_row[:bits.num_rows]),
            tuple(bits.syncs_before_row[:bits.num_rows]),
            tuple(bits.row_bytes(r).tobytes() for r in range(bits.num_rows)))


def _packages(seed=0):
    rng = np.random.default_rng(seed)
    pkgs = []
    # PPM-ish repeated burst with per-segment resets
    P, G = [], []
    for rep in range(6):
        for _ in range(36):
            P.append(125)
            G.append(250 if rng.integers(2) == 0 else 500)
        G[-1] = 1200
    pkgs.append((P, G, 250_000))
    # PWM-ish
    P = [int(rng.choice([120, 350])) for _ in range(60)]
    G = [150] * 60
    G[-1] = 30000
    pkgs.append((P, G, 250_000))
    # FSK PCM uniform
    pkgs.append(([52] * 80, [52] * 79 + [60000], 1_024_000))
    # random garbage (small, keeps the host oracle fast)
    for _ in range(4):
        n = int(rng.integers(5, 60))
        pkgs.append((rng.integers(5, 3000, n).tolist(),
                     rng.integers(5, 6000, n).tolist(), 250_000))
    # degenerate
    pkgs.append(([10], [10], 250_000))
    return pkgs


def test_native_slicers_match_python():
    """Every (device, package) slicing must be bit-identical."""
    reg = Registry()
    reg.register_all()
    for P, G, rate in _packages():
        pd = PulseData(pulse=P, gap=G, sample_rate=rate)
        for want_fsk in (False, True):
            devs = [d for d in reg.active if d.is_fsk == want_fsk]
            bank = native_slicers.SlicerBank(devs, rate)
            summary, _ = bank.slice(np.asarray(P, np.int32),
                                    np.asarray(G, np.int32))
            nat = [(int(s[0]), _key(bank.materialize(int(s[1]))))
                   for s in summary]
            py = []
            for i, d in enumerate(devs):
                for bits in slicers.slice_pulses(pd, d):
                    py.append((i, _key(bits)))
            assert nat == py


def test_fast_dispatch_matches_host():
    """_run_fast == _run_host: events, order, and success counters."""
    r1 = Registry(); r1.register_all()
    r2 = Registry(); r2.register_all()
    for P, G, rate in _packages(seed=3):
        pd = PulseData(pulse=P, gap=G, sample_rate=rate)
        for want_fsk in (False, True):
            e1, e2 = [], []
            n1 = r1._run_fast(pd, want_fsk,
                              lambda d, e: e1.append((d.num, event_to_json(e))))
            n2 = r2._run_host(pd, want_fsk,
                              lambda d, e: e2.append((d.num, event_to_json(e))))
            assert n1 == n2
            assert e1 == e2
    s1 = {d.symbol: (d.decode_ok, d.decode_messages)
          for d in r1.active if d.decode_ok}
    s2 = {d.symbol: (d.decode_ok, d.decode_messages)
          for d in r2.active if d.decode_ok}
    assert s1 == s2


def test_fast_dispatch_decodes_real_signal():
    """A valid Nexus PPM package must decode identically on both paths."""
    # nexus: 36-bit rows = 9C 80 D7 F2 D (id=156, ch1, 21.5C, 45%),
    # gap 1000us->0 / 2000us->1, pulse 500us, row gap 4000us, reset end
    code_bits = "100111001000000011010111111100101101"
    P, G = [], []
    for rep in range(12):
        for b in code_bits:
            P.append(125)            # 500us @ 250k
            G.append(250 if b == "0" else 500)
        P.append(125)                # trailing pulse; its gap separates rows
        G.append(1000)
    G[-1] = 50000
    pd = PulseData(pulse=P, gap=G, sample_rate=250_000)
    r1 = Registry(); r1.register_all()
    r2 = Registry(); r2.register_all()
    e1, e2 = [], []
    r1._run_fast(pd, False, lambda d, e: e1.append(event_to_json(e)))
    r2._run_host(pd, False, lambda d, e: e2.append(event_to_json(e)))
    assert e1 == e2
    assert any("Nexus" in e for e in e1)


def test_gates_pass_all_oracle_vectors():
    """A gate must never exclude a bitbuffer its decoder can decode."""
    from test_decoder_oracle import VECTORS
    reg = Registry()
    for num, code, _ in VECTORS:
        arg = None
        if isinstance(num, str) and ":" in num:
            n, arg = num.split(":", 1)
            num = int(n)
        dev = reg.get(num)
        if dev is None or not dev.decode_fn:
            continue
        dev.arg = arg
        gate = GATES.get(dev.symbol)
        if not gate:
            continue
        for part in code.split("|"):
            bits = BitBuffer.parse(part)
            ret = dev.decode_fn(bits.clone(), dev)
            if isinstance(ret, list) and ret:
                maxb = max(bits.bits_per_row[:bits.num_rows] or [0])
                assert bits.num_rows >= gate[0], (dev.symbol, gate)
                assert maxb >= gate[1], (dev.symbol, gate)
                if len(gate) > 2:
                    assert bits.num_rows <= gate[2], (dev.symbol, gate)


def test_gates_subthreshold_never_decode():
    """Random bitbuffers below a decoder's gate must produce no events."""
    rng = np.random.default_rng(5)
    reg = Registry()
    devs = [d for d in reg.slots
            if d is not None and d.decode_fn and d.symbol in GATES]
    buffers = []
    for _ in range(12):
        bits = BitBuffer()
        nrows = int(rng.integers(1, 5))
        for r in range(nrows):
            for _ in range(int(rng.integers(0, 30))):
                bits.add_bit(int(rng.integers(2)))
            if r < nrows - 1:
                bits.add_row()
        buffers.append(bits)
    for d in devs:
        g = GATES[d.symbol]
        mr, mb = g[0], g[1]
        xr = g[2] if len(g) > 2 else 10**9
        for bits in buffers:
            maxb = max(bits.bits_per_row[:bits.num_rows] or [0])
            if mr <= bits.num_rows <= xr and maxb >= mb:
                continue  # gate passes; decoder may do anything
            ret = d.decode_fn(bits.clone(), d)
            assert not (isinstance(ret, list) and ret), \
                f"{d.symbol} decoded below its gate {GATES[d.symbol]}"


def test_gates_cross_vector_soundness():
    """Adversarial gate check with REAL frame content: every oracle
    vector (a realistic sliced bitbuffer) is fed to every decoder whose
    gate rejects it — any event emitted means that gate excludes a
    decodable input (e.g. an alternate frame length the hand-derived
    bound missed)."""
    from test_decoder_oracle import VECTORS
    reg = Registry()
    devs = [d for d in reg.slots
            if d is not None and d.decode_fn and d.symbol in GATES]
    buffers = []
    seen = set()
    for num, code, _ in VECTORS:
        for part in code.split("|"):
            if part in seen or part.strip().upper().startswith("AAB"):
                continue
            seen.add(part)
            buffers.append(BitBuffer.parse(part))
    assert len(buffers) > 300
    hits = []
    for bits in buffers:
        maxb = max(bits.bits_per_row[:bits.num_rows] or [0])
        nr = bits.num_rows
        for d in devs:
            g = GATES[d.symbol]
            xr = g[2] if len(g) > 2 else 10**9
            if g[0] <= nr <= xr and maxb >= g[1]:
                continue  # gate passes; decoder may do anything
            try:
                ret = d.decode_fn(bits.clone(), d)
            except Exception:
                continue  # dispatch guards decoder crashes separately
            if isinstance(ret, list) and ret:
                hits.append((d.symbol, g, nr, maxb))
    assert not hits, f"gates excluded decodable inputs: {hits[:10]}"


def test_mic_gates_pass_all_oracle_vectors():
    """A MIC gate must never exclude a bitbuffer its decoder can decode."""
    from test_decoder_oracle import VECTORS
    from rtl_433_tpu.decoders.mic_gates import MIC_GATES, gate_bits
    reg = Registry()
    checked = 0
    for num, code, _ in VECTORS:
        arg = None
        if isinstance(num, str) and ":" in num:
            n, arg = num.split(":", 1)
            num = int(n)
        dev = reg.get(num)
        if dev is None or not dev.decode_fn:
            continue
        dev.arg = arg
        spec = MIC_GATES.get(dev.symbol)
        if not spec:
            continue
        for part in code.split("|"):
            bits = BitBuffer.parse(part)
            ret = dev.decode_fn(bits.clone(), dev)
            if isinstance(ret, list) and ret:
                assert gate_bits(bits.clone(), spec), \
                    f"{dev.symbol} decoded but its MIC gate vetoes it"
                checked += 1
    assert checked >= 5, "too few MIC-gated decoders exercised"


def test_mic_gate_fail_never_decodes():
    """Random bitbuffers failing a decoder's MIC gate must produce no
    events (the gate is a necessary condition)."""
    from rtl_433_tpu.decoders.mic_gates import MIC_GATES, gate_bits
    rng = np.random.default_rng(7)
    reg = Registry()
    devs = [d for d in reg.slots
            if d is not None and d.decode_fn and d.symbol in MIC_GATES]
    assert devs
    buffers = []
    for _ in range(60):
        bits = BitBuffer()
        nrows = int(rng.integers(1, 4))
        for r in range(nrows):
            for _ in range(int(rng.integers(8, 100))):
                bits.add_bit(int(rng.integers(2)))
            if r < nrows - 1:
                bits.add_row()
        buffers.append(bits)
    vetoed = 0
    for d in devs:
        spec = MIC_GATES[d.symbol]
        for bits in buffers:
            if gate_bits(bits.clone(), spec):
                continue  # gate passes; decoder may do anything
            vetoed += 1
            ret = d.decode_fn(bits.clone(), d)
            assert not (isinstance(ret, list) and ret), \
                f"{d.symbol} decoded a bitbuffer its MIC gate vetoes"
    assert vetoed > 100
