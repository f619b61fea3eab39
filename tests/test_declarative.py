"""Declarative decode bank vs the Python decoders (differential).

Every symbol in decoders/declarative.py DECL shadows a registered Python
decoder; this suite enforces byte-identical EVENTS between the two on:
  - every oracle vector of that decoder (tests/test_decoder_oracle.py),
  - mutation fuzz around each vector (bit flips, truncations, bit
    insertions) — positives AND negatives must agree,
  - and identical results between the NumPy and jax.numpy backends of the
    shared kernel (ops/decode_bank.py), which is the jit/device path.
"""

import numpy as np
import pytest

from rtl_433_tpu.bits.bitbuffer import BitBuffer
from rtl_433_tpu.decoders import Registry
from rtl_433_tpu.decoders.declarative import DECL, FALLBACK, DeclRunner
from rtl_433_tpu.output.data_model import event_to_json

from test_decoder_oracle import VECTORS


def _sym_vectors():
    reg = Registry()
    by_num = {}
    for num, code, _min in VECTORS:
        if isinstance(num, int):
            by_num.setdefault(num, []).append(code)
    out = {}
    for dev in reg.slots:
        if dev is not None and dev.symbol in DECL and dev.num in by_num:
            out[dev.symbol] = (dev, by_num[dev.num])
    return out


SYM_VECTORS = _sym_vectors()


def _events_json(ret):
    if not isinstance(ret, list):
        return ret
    return [event_to_json(e) for e in ret]


def _python_ret(dev, bits):
    return dev.decode_fn(bits.clone(), dev)


def _norm(ret):
    """Compare events exactly; collapse all failure codes (the fast path
    only approximates failure NAMES, ref decoders/mic_gates.py)."""
    if isinstance(ret, list) and ret:
        return _events_json(ret)
    return "fail"


@pytest.mark.parametrize("symbol", sorted(DECL))
def test_decl_has_vectors(symbol):
    assert symbol in SYM_VECTORS, f"no oracle vector covers {symbol}"


@pytest.mark.parametrize("symbol", sorted(SYM_VECTORS))
def test_decl_matches_python_on_vectors(symbol):
    dev, codes = SYM_VECTORS[symbol]
    runner = DeclRunner([DECL[symbol]])
    for code in codes:
        bits = BitBuffer.parse(code)
        ret = runner.decode_many([(symbol, bits)])[0]
        assert ret is not FALLBACK
        py = _python_ret(dev, bits)
        assert isinstance(py, list) and py, f"vector no longer decodes {code}"
        assert _events_json(ret) == _events_json(py), (
            f"{symbol} {code}\n decl={_events_json(ret)}\n "
            f"py={_events_json(py)}")


@pytest.mark.parametrize("symbol", sorted(SYM_VECTORS))
def test_decl_matches_python_under_mutation(symbol):
    """Bit flips / truncations around each vector: both paths must agree
    on decode vs no-decode, and on the events whenever both decode."""
    dev, codes = SYM_VECTORS[symbol]
    runner = DeclRunner([DECL[symbol]])
    rng = np.random.default_rng(1234)
    cases = []
    for code in codes:
        base = BitBuffer.parse(code)
        cases.append(base)
        nbits = int(base.bits_per_row[0]) if base.num_rows else 0
        for _ in range(200):
            m = BitBuffer.parse(code)
            k = int(rng.integers(1, 4))
            for _ in range(k):
                r = int(rng.integers(0, max(m.num_rows, 1)))
                n = int(m.bits_per_row[r])
                if n == 0:
                    continue
                j = int(rng.integers(0, n))
                m.bb[r + j // (m.bb.shape[1] * 8),
                     (j // 8) % m.bb.shape[1]] ^= 0x80 >> (j & 7)
            cases.append(m)
        # truncations of the first row
        for cut in (1, 2, 5, 17):
            m = BitBuffer.parse(code)
            if m.num_rows and m.bits_per_row[0] > cut:
                m.bits_per_row[0] -= cut
                cases.append(m)
    agree_pos = 0
    for bits in cases:
        ret = runner.decode_many([(symbol, bits.clone())])[0]
        if ret is FALLBACK:
            continue
        py = _python_ret(dev, bits)
        assert _norm(ret) == _norm(py), (
            f"{symbol}: decl={_norm(ret)} py={_norm(py)}")
        if isinstance(py, list) and py:
            agree_pos += 1
    assert agree_pos >= len(codes)  # at least the base vectors decode


def test_decl_numpy_jax_backends_identical():
    """The same candidate batch through xp=numpy and xp=jax.numpy."""
    import jax.numpy as jnp
    from rtl_433_tpu.ops import decode_bank as dbk
    from rtl_433_tpu.decoders.declarative import _lower

    specs = [DECL[s] for s in sorted(DECL)]
    bank = dbk.CompiledBank([_lower(s) for s in specs])
    rng = np.random.default_rng(7)
    B = 64
    bits = (rng.integers(0, 2, (B, bank.in_bits))).astype(np.uint8)
    n = rng.integers(8, bank.in_bits + 1, B).astype(np.int32)
    for b in range(B):
        bits[b, n[b]:] = 0
    sid = rng.integers(0, len(specs), B).astype(np.int32)
    c_np, r_np = dbk.run(bank, bits, n, sid, xp=np)
    c_j, r_j = dbk.run(bank, jnp.asarray(bits), jnp.asarray(n),
                       jnp.asarray(sid), xp=jnp)
    assert np.array_equal(np.asarray(c_np), np.asarray(c_j))
    assert np.array_equal(np.asarray(r_np), np.asarray(r_j))


def test_decl_jit_compiles():
    """The kernel jit-compiles (static bank closed over) and matches."""
    import jax
    import jax.numpy as jnp
    from rtl_433_tpu.ops import decode_bank as dbk
    from rtl_433_tpu.decoders.declarative import _lower

    specs = [DECL[s] for s in sorted(DECL)]
    bank = dbk.CompiledBank([_lower(s) for s in specs])
    fn = jax.jit(lambda b, n, s: dbk.run(bank, b, n, s, xp=jnp))
    rng = np.random.default_rng(11)
    B = 16
    bits = (rng.integers(0, 2, (B, bank.in_bits))).astype(np.uint8)
    n = np.full(B, bank.in_bits, np.int32)
    sid = rng.integers(0, len(specs), B).astype(np.int32)
    c1, r1 = fn(bits, n, sid)
    c0, r0 = dbk.run(bank, bits, n, sid, xp=np)
    assert np.array_equal(np.asarray(c1), c0)
    assert np.array_equal(np.asarray(r1), r0)
