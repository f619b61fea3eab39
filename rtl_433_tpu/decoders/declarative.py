"""Declarative decoder specs: protocols as data, decoded by one batched
kernel (ops/decode_bank.py) instead of per-protocol Python.

Each entry in DECL describes a protocol's decode as row selection +
length window + preamble + transform + affine MIC checks + linear field
extraction + an event template — the SURVEY §2 row-12 "jit-compatible
pure function over bitbuffer arrays" plan: the spec lowers to weight
tables, the shared kernel evaluates any batch of (row, protocol)
candidates in one pass (NumPy host / jit device), and the host formats
events only for the survivors.

The Python decode functions remain registered and authoritative: a
declarative spec SHADOWS its decoder and must produce byte-identical
events (and compatible failure accounting) — enforced for every oracle
vector and under mutation fuzz by tests/test_declarative.py. Rows too
long for the bank fall back to the Python decoder per candidate.

Semantics are cited per spec against the reference decoder source.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops import decode_bank as dbk
from ..output.data_model import Event
from .base import (DECODE_ABORT_EARLY, DECODE_ABORT_LENGTH,
                   DECODE_FAIL_SANITY)

# sentinel: candidate must run the Python decoder (row too long etc.)
FALLBACK = object()


@dataclass(frozen=True)
class Check:
    """One MIC check (see ops/decode_bank.py lowering)."""
    algo: str
    off: int = 0                # frame-bit offset of the digest window
    nbytes: int = 0
    p1: int = 0
    p2: int = 0
    xor_out: int = 0
    mask: Optional[int] = None
    cmp_off: int = -1           # frame-bit offset of the expected value
    cmp_width: int = 0
    cmp_const: int = 0
    reflect: bool = False
    negated: bool = False
    add_const: int = 0
    # explicit window-bit -> frame-bit map for scrambled windows
    # (entries of -1 feed constant 0)
    bit_map: Optional[Tuple[int, ...]] = None


@dataclass(frozen=True)
class Raw:
    """One extracted field (unsigned, <= 32 bits)."""
    off: int = 0
    width: int = 0
    rev_bytes: bool = False
    bit_order: Optional[Tuple[int, ...]] = None  # explicit bits, MSB first


@dataclass(frozen=True)
class San:
    """Sanity predicate over a raw: fails with DECODE_FAIL_SANITY."""
    raw: int
    op: str                     # eq ne le ge lt gt
    val: int
    mask: Optional[int] = None


@dataclass(frozen=True)
class F:
    """Event field template. kinds:
    const        -> value
    int          -> sum(term values) + add
    float        -> (sum(term values) + add) * mul
    bool         -> int(bool(int value))
    eq           -> int((raw & mask) == val)
    enum         -> map[int value] (KeyError -> default or drop event)
    terms: ((raw_idx, coef, signed_bits),...) — signed_bits 0 = unsigned.
    cond: San-style predicate; field dropped when false (DATA_COND)."""
    key: str
    kind: str = "int"
    value: object = None
    terms: Tuple = ()
    add: float = 0
    mul: float = 1.0
    mask: int = 0xFFFFFFFF
    val: int = 0
    map: Optional[Dict] = None
    default: object = None
    pretty: Optional[str] = None
    fmt: Optional[str] = None
    cond: Optional[San] = None


@dataclass(frozen=True)
class Variant:
    """Event template variant: first variant whose cond holds formats the
    event (cond None = always)."""
    fields: Tuple[F, ...]
    cond: Optional[San] = None


@dataclass(frozen=True)
class DeclSpec:
    symbol: str
    min_bits: int
    max_bits: int = 1 << 20
    row_mode: str = "any"       # any | row0 | repeat | all
    min_repeats: int = 1
    repeat_min_bits: int = 0
    in_bits: int = 0            # bank input width (0 = auto)
    frame_bits: int = 64
    preamble: Optional[str] = None   # bit string, 'x' = don't care
    pre_start: int = 0
    align_off: int = 0
    need_bits: int = 0
    transform: str = "none"     # none | invert | manchester
    mc_min: int = 0
    checks: Tuple[Check, ...] = ()
    sanity: Tuple[San, ...] = ()
    raws: Tuple[Raw, ...] = ()
    variants: Tuple[Variant, ...] = ()


_OPS = {
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
    "le": lambda a, b: a <= b,
    "ge": lambda a, b: a >= b,
    "lt": lambda a, b: a < b,
    "gt": lambda a, b: a > b,
}


def _lower(spec: DeclSpec) -> dbk.LoweredSpec:
    fb = spec.frame_bits
    gf2 = []
    add = []
    for c in spec.checks:
        if c.algo in dbk._ADD_ALGOS:
            w, mod, tc, neq = dbk.make_add_check(
                c.algo, c.off, c.nbytes, mask=c.mask, cmp_off=c.cmp_off,
                cmp_width=c.cmp_width, cmp_const=c.cmp_const,
                reflect=c.reflect, negated=c.negated, frame_bits=fb,
                add_const=c.add_const)
            if c.bit_map is not None:
                w = _remap(w, c, fb).astype(np.int32)
            add.append((_pad(w, fb), mod, tc, neq))
        else:
            tab, tc, neq = dbk.make_gf2_check(
                c.algo, c.off, c.nbytes, c.p1, c.p2, xor_out=c.xor_out,
                mask=c.mask, cmp_off=c.cmp_off, cmp_width=c.cmp_width,
                cmp_const=c.cmp_const, reflect=c.reflect,
                negated=c.negated, frame_bits=fb)
            if c.bit_map is not None:
                tab = _remap(tab, c, fb)
            gf2.append((_pad(tab, fb), tc, neq))
    raws = np.zeros((len(spec.raws), fb), np.uint32)
    for i, r in enumerate(spec.raws):
        raws[i] = dbk.make_raw(r.off, r.width, fb, bit_order=r.bit_order,
                               rev_bytes=r.rev_bytes)
    pat_bits: List[int] = []
    pat_mask: List[int] = []
    if spec.preamble:
        for ch in spec.preamble:
            pat_bits.append(1 if ch == "1" else 0)
            pat_mask.append(0 if ch in "xX" else 1)
    tf = {"none": dbk.TF_NONE, "invert": dbk.TF_INVERT,
          "manchester": dbk.TF_MANCHESTER}[spec.transform]
    in_bits = spec.in_bits or max(
        spec.min_bits, spec.pre_start + len(pat_bits) + spec.align_off
        + (fb * 2 if tf == dbk.TF_MANCHESTER else fb), 64)
    return dbk.LoweredSpec(
        min_bits=spec.min_bits, max_bits=spec.max_bits, in_bits=in_bits,
        frame_bits=fb, pat_bits=pat_bits, pat_mask=pat_mask,
        pre_start=spec.pre_start, align_off=spec.align_off,
        need_bits=spec.need_bits, transform=tf, mc_min=spec.mc_min,
        gf2_tabs=gf2, add_tabs=add, raw_tabs=raws)


def _remap(tab: np.ndarray, c: Check, fb: int) -> np.ndarray:
    """Apply an explicit window-bit -> frame-bit map: the digest window
    bits were lowered at contiguous offsets off..; redistribute them."""
    assert len(c.bit_map) == c.nbytes * 8, "bit_map must cover the window"
    out = np.zeros(fb, tab.dtype)
    win = tab[c.off:c.off + c.nbytes * 8]
    for k, dst in enumerate(c.bit_map):
        if dst >= 0:
            if tab.dtype == np.uint32:
                out[dst] ^= win[k]
            else:
                out[dst] += win[k]
    # keep expected-value folds that live outside the window
    keep = tab.copy()
    keep[c.off:c.off + c.nbytes * 8] = 0
    if tab.dtype == np.uint32:
        out[:keep.shape[0]] ^= keep
    else:
        out[:keep.shape[0]] += keep
    return out


def _pad(a: np.ndarray, fb: int) -> np.ndarray:
    if a.shape[-1] == fb:
        return a
    out = np.zeros(a.shape[:-1] + (fb,), a.dtype)
    out[..., :a.shape[-1]] = a
    return out


def _sex(v: int, bits: int) -> int:
    if bits and v & (1 << (bits - 1)):
        return v - (1 << bits)
    return v


class DeclRunner:
    """Batched declarative decode over a set of symbols."""

    def __init__(self, specs: Sequence[DeclSpec]):
        self.specs = list(specs)
        self.by_symbol = {s.symbol: i for i, s in enumerate(self.specs)}
        self.bank = dbk.CompiledBank([_lower(s) for s in self.specs])

    # -- candidate building --------------------------------------------------

    def _rows_for(self, spec: DeclSpec, bits) -> object:
        """Row indices the spec inspects, or a direct int ret code."""
        if spec.row_mode == "repeat":
            r = bits.find_repeated_row(spec.min_repeats,
                                       spec.repeat_min_bits)
            if r < 0:
                return DECODE_ABORT_EARLY
            return [r]
        if spec.row_mode == "row0":
            return [0]
        return list(range(bits.num_rows))

    def _row_bits(self, bits, row: int) -> Optional[np.ndarray]:
        n = int(bits.bits_per_row[row])
        if n > self.bank.in_bits:
            return None
        raw = bits.bb[row:].reshape(-1)
        nb = (n + 7) // 8
        ba = np.unpackbits(raw[:nb])[:n]
        out = np.zeros(self.bank.in_bits, np.uint8)
        out[:n] = ba
        return out

    def decode_many(self, items: Sequence[Tuple[str, object]],
                    xp=np) -> List[object]:
        """items: (symbol, BitBuffer) pairs. Returns per item: a list of
        Events, a negative DECODE_* code, or FALLBACK (row too long —
        caller must run the Python decoder)."""
        rets: List[object] = [None] * len(items)
        cand_bits: List[np.ndarray] = []
        cand_n: List[int] = []
        cand_sid: List[int] = []
        cand_item: List[int] = []
        for ix, (symbol, bits) in enumerate(items):
            si = self.by_symbol[symbol]
            spec = self.specs[si]
            rows = self._rows_for(spec, bits)
            if isinstance(rows, int):
                rets[ix] = rows
                continue
            any_row = False
            for r in rows:
                ba = self._row_bits(bits, r)
                if ba is None:
                    rets[ix] = FALLBACK
                    any_row = False
                    break
                cand_bits.append(ba)
                cand_n.append(int(bits.bits_per_row[r]))
                cand_sid.append(si)
                cand_item.append(ix)
                any_row = True
            if not any_row and rets[ix] is None:
                rets[ix] = DECODE_ABORT_EARLY
        if not cand_bits:
            return rets
        code, raws = dbk.run(self.bank, np.stack(cand_bits),
                             np.asarray(cand_n, np.int32),
                             np.asarray(cand_sid, np.int32), xp=xp)
        code = np.asarray(code)
        raws = np.asarray(raws)
        # group candidate rows back to items, in row order
        for k in range(len(cand_bits)):
            ix = cand_item[k]
            if rets[ix] is FALLBACK:
                continue
            spec = self.specs[cand_sid[k]]
            c = int(code[k])
            if c == 0:
                c, ev = self._format(spec, raws[k])
            else:
                ev = None
            prev = rets[ix]
            if ev is not None:
                if isinstance(prev, list):
                    prev.extend(ev)
                else:
                    rets[ix] = ev
            elif not isinstance(prev, list):
                # keep the most-progressed failure code
                rets[ix] = c if prev is None else min(prev, c)
        return rets

    # -- event formatting ----------------------------------------------------

    def _format(self, spec: DeclSpec, raw: np.ndarray):
        vals = [int(v) for v in raw]
        for s in spec.sanity:
            v = vals[s.raw] & s.mask if s.mask is not None else vals[s.raw]
            if not _OPS[s.op](v, s.val):
                return DECODE_FAIL_SANITY, None
        var = None
        for v in spec.variants:
            if v.cond is None or _OPS[v.cond.op](
                    (vals[v.cond.raw] & v.cond.mask)
                    if v.cond.mask is not None else vals[v.cond.raw],
                    v.cond.val):
                var = v
                break
        if var is None:
            return DECODE_FAIL_SANITY, None
        fields = []
        for f in var.fields:
            if f.cond is not None:
                cv = (vals[f.cond.raw] & f.cond.mask) \
                    if f.cond.mask is not None else vals[f.cond.raw]
                if not _OPS[f.cond.op](cv, f.cond.val):
                    continue
            val = self._fval(f, vals)
            item = [f.key, val]
            if f.pretty is not None or f.fmt is not None:
                item.append(f.pretty if f.pretty is not None else f.key)
            if f.fmt is not None:
                item.append(f.fmt)
            fields.append(tuple(item))
        return 0, [Event.make(*fields)]

    def _fval(self, f: F, vals: List[int]):
        if f.kind == "const":
            return f.value
        acc = 0
        for t in f.terms:
            ri, coef, sbits = (t + (0,))[:3] if len(t) < 3 else t
            acc += _sex(vals[ri], sbits) * coef
        if f.kind == "int":
            return int(acc + f.add)
        if f.kind == "float":
            return float((acc + f.add) * f.mul)
        if f.kind == "bool":
            return int(bool(int(acc + f.add)))
        if f.kind == "eq":
            return int((int(acc) & f.mask) == f.val)
        if f.kind == "enum":
            return f.map.get(int(acc), f.default)
        raise ValueError(f.kind)


# ---------------------------------------------------------------------------
# Spec table. Each spec cites the reference decoder it mirrors; the Python
# twin in this package stays registered and is the differential oracle.
# ---------------------------------------------------------------------------

DECL: Dict[str, DeclSpec] = {}

_RUNNER: Optional[DeclRunner] = None


def get_runner() -> DeclRunner:
    """Process-wide runner over the full DECL table (static; the lowered
    weight tables compile once)."""
    global _RUNNER
    if _RUNNER is None:
        _RUNNER = DeclRunner(list(DECL.values()))
    return _RUNNER


def _spec(s: DeclSpec):
    DECL[s.symbol] = s
    return s


_spec(DeclSpec(
    # Nexus-TH/T (ref src/devices/nexus.c:44-140; decoders/protocols.py
    # _nexus_like): 36-bit row repeated 3x, type nibble F, 12-bit signed
    # temperature, humidity 0 = Nexus-T
    symbol="nexus",
    min_bits=36, max_bits=37, row_mode="repeat", min_repeats=3,
    repeat_min_bits=36, frame_bits=40, in_bits=296,
    # reject the Rubicson CRC coincidence (ref src/devices/nexus.c:77-88):
    # crc8(poly 0x31, init 0x6C) over the 40-bit window
    # [b0, b1, b2, b3&F0, (b3&0F)<<4 | (b4&F0)>>4] must be NONZERO
    checks=(Check("crc8", off=0, nbytes=5, p1=0x31, p2=0x6C,
                  cmp_const=0, negated=True,
                  bit_map=tuple(range(28)) + (-1,) * 4
                  + tuple(range(28, 36))),),
    raws=(Raw(0, 8),          # 0 id
          Raw(8, 1),          # 1 battery
          Raw(10, 2),         # 2 channel-1 (and the != 3 guard)
          Raw(12, 12),        # 3 temperature raw (signed 12)
          Raw(28, 8),         # 4 humidity
          Raw(9, 1),          # 5 test
          Raw(24, 4),         # 6 type nibble (must be F)
          # 7: b0|b2|b3 combined — the all-0 / all-FF guards
          Raw(0, 24, bit_order=tuple(range(0, 8)) + tuple(range(16, 32)))),
    sanity=(San(6, "eq", 0xF),
            San(2, "ne", 0x3),
            San(7, "ne", 0x000000),
            San(7, "ne", 0xFFFFFF),
            San(4, "le", 100),),
    variants=(
        Variant(cond=San(4, "eq", 0), fields=(
            F("model", "const", value="Nexus-T"),
            F("id", terms=((0, 1, 0),), pretty="House Code"),
            F("channel", terms=((2, 1, 0),), add=1, pretty="Channel"),
            F("battery_ok", kind="bool", terms=((1, 1, 0),),
              pretty="Battery"),
            F("temperature_C", kind="float", terms=((3, 1, 12),),
              mul=0.1, pretty="Temperature", fmt="%.2f C"),
            F("test", kind="bool", terms=((5, 1, 0),), pretty="Test?",
              cond=San(5, "ne", 0)),
        )),
        Variant(fields=(
            F("model", "const", value="Nexus-TH"),
            F("id", terms=((0, 1, 0),), pretty="House Code"),
            F("channel", terms=((2, 1, 0),), add=1, pretty="Channel"),
            F("battery_ok", kind="bool", terms=((1, 1, 0),),
              pretty="Battery"),
            F("temperature_C", kind="float", terms=((3, 1, 12),),
              mul=0.1, pretty="Temperature", fmt="%.2f C"),
            F("humidity", terms=((4, 1, 0),), pretty="Humidity",
              fmt="%u %%"),
            F("test", kind="bool", terms=((5, 1, 0),), pretty="Test?",
              cond=San(5, "ne", 0)),
        )),
    ),
))


_spec(DeclSpec(
    # Jasco-Security (ref src/devices/jasco.c; decoders/misc_a.py jasco):
    # fc0c preamble, Manchester, 4-byte XOR checksum
    symbol="jasco",
    min_bits=80, max_bits=87, row_mode="row0",
    preamble="1111110000001100", need_bits=64,
    # frame_bits covers the RAW window; Manchester halves it, so checks
    # and raws below address DECODED bit positions (0..31)
    transform="manchester", mc_min=32, frame_bits=64, in_bits=160,
    checks=(Check("xor_bytes", off=0, nbytes=4, cmp_const=0),),
    raws=(Raw(0, 16),         # 0 id
          Raw(16, 8)),        # 1 b2 (status source)
    variants=(Variant(fields=(
        F("model", "const", value="Jasco-Security"),
        F("id", terms=((0, 1, 0),), pretty="Id"),
        F("status", kind="eq", terms=((1, 1, 0),), mask=0xEF, val=0xEF,
          pretty="Closed"),
        F("mic", "const", value="CHECKSUM", pretty="Integrity"),
    )),),
))
