"""Declarative decoder spec table.

Each spec cites the reference decoder it mirrors; the Python twin in this
package stays registered and is the differential oracle
(tests/test_declarative.py fuzzes every spec against it). See
decoders/declarative.py for the IR and ops/decode_bank.py for the kernel.
"""

from .declarative import (Check, DeclSpec, F, Raw, San, Variant, _spec)
from .base import DECODE_ABORT_EARLY


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

# ---------------------------------------------------------------------------
# OOK PPM/PWM sensor family
# ---------------------------------------------------------------------------

_spec(DeclSpec(
    # Silvercrest remote (ref src/devices/silvercrest.c:19-49;
    # decoders/protocols.py silvercrest): row 1 is 33 bits, 7c26 prefix,
    # button nibble validated via a lookup pair table
    symbol="silvercrest",
    min_bits=33, max_bits=33, row_mode="fixed", fixed_row=1,
    exact_lens=(33,), frame_bits=33, in_bits=64,
    raws=(Raw(0, 16),                                  # 0 prefix
          Raw(20, 4),                                  # 1 cmd
          # 2: (cmd << 4) | check nibble
          Raw(0, 8, bit_order=tuple(range(20, 24)) + tuple(range(28, 32)))),
    sanity=(San(0, "eq", 0x7C26),
            San(2, "in", (0x02, 0x13, 0x20, 0x31, 0x44, 0x55, 0x67, 0x76,
                          0x8C, 0x9D, 0xAF, 0xBE, 0xC8, 0xD9, 0xEB, 0xFA)),),
    variants=(Variant(fields=(
        F("model", "const", value="Silvercrest-Remote"),
        F("button", terms=((1, 1, 0),)),
    )),),
))


_RUBICSON_CRC = Check(
    # crc8(0x31, 0x6c) over [b0, b1, b2, b3&F0, (b3&0F)<<4 | (b4&F0)>>4]
    # (ref src/devices/rubicson.c)
    "crc8", off=0, nbytes=5, p1=0x31, p2=0x6C, cmp_const=0,
    bit_map=tuple(range(28)) + (-1,) * 4 + tuple(range(28, 36)))

_spec(DeclSpec(
    # Rubicson temperature (ref src/devices/rubicson.c; protocols.py)
    symbol="rubicson",
    min_bits=36, max_bits=38, row_mode="repeat", min_repeats=3,
    repeat_min_bits=36, frame_bits=40, in_bits=296,
    checks=(_RUBICSON_CRC,),
    raws=(Raw(0, 8), Raw(8, 1), Raw(10, 2), Raw(12, 12), Raw(24, 4)),
    sanity=(San(4, "eq", 0xF),),
    variants=(Variant(fields=(
        F("model", "const", value="Rubicson-Temperature"),
        F("id", terms=((0, 1, 0),), pretty="House Code"),
        F("channel", terms=((2, 1, 0),), add=1, pretty="Channel"),
        F("battery_ok", kind="bool", terms=((1, 1, 0),), pretty="Battery"),
        F("temperature_C", kind="float", terms=((3, 1, 12),), mul=0.1,
          pretty="Temperature", fmt="%.1f C"),
        F("mic", "const", value="CRC", pretty="Integrity"),
    )),),
))


def _prologue_guard(bits):
    # short noise row 0 aborts the whole package (ref src/devices/prologue.c)
    if 0 < bits.bits_per_row[0] <= 8:
        return DECODE_ABORT_EARLY
    return None


_spec(DeclSpec(
    # Prologue/ThermoPro-TX2 (ref src/devices/prologue.c; protocols.py)
    symbol="prologue",
    min_bits=36, max_bits=37, row_mode="repeat", min_repeats=4,
    repeat_min_bits=36, host_guard=_prologue_guard,
    frame_bits=40, in_bits=296,
    raws=(Raw(0, 4),          # 0 type
          Raw(4, 8),          # 1 id
          Raw(12, 1),         # 2 battery
          Raw(13, 1),         # 3 button
          Raw(14, 2),         # 4 channel-1
          Raw(16, 12),        # 5 temp (signed 12)
          Raw(28, 8)),        # 6 humidity
    sanity=(San(0, "in", (0x9, 0x5)),),
    variants=(Variant(fields=(
        F("model", "const", value="Prologue-TH"),
        F("subtype", terms=((0, 1, 0),)),
        F("id", terms=((1, 1, 0),)),
        F("channel", terms=((4, 1, 0),), add=1, pretty="Channel"),
        F("battery_ok", kind="bool", terms=((2, 1, 0),), pretty="Battery"),
        F("temperature_C", kind="float", terms=((5, 1, 12),), mul=0.1,
          pretty="Temperature", fmt="%.2f C"),
        F("humidity", terms=((6, 1, 0),), pretty="Humidity", fmt="%u %%",
          cond=San(6, "ne", 0xCC)),
        F("button", terms=((3, 1, 0),), pretty="Button"),
    )),),
))


_spec(DeclSpec(
    # Waveman switch (ref src/devices/waveman.c:26-85; protocols.py):
    # 25-bit row, every even bit set, pair-coded inverted nibbles
    symbol="waveman",
    min_bits=25, max_bits=25, row_mode="row0", exact_lens=(25,),
    frame_bits=25, in_bits=64,
    raws=(Raw(0, 24),                                        # 0 all-FF guard
          Raw(0, 12, bit_order=tuple(j for j in range(24)   # 1 even bits
                                     if j % 2 == 0)),
          Raw(0, 4, bit_order=(7, 5, 3, 1)),                 # 2 ~nb0
          Raw(0, 2, bit_order=(15, 13)),                     # 3 ~nb1 hi
          Raw(0, 2, bit_order=(11, 9)),                      # 4 ~nb1 lo
          Raw(0, 4, bit_order=(23, 21, 19, 17))),            # 5 ~nb2
    sanity=(San(0, "ne", 0xFFFFFF),
            San(1, "eq", 0xFFF),
            # nb2 = 0xF - raw in {0xE, 0x6} -> raw in {1, 9}
            San(5, "in", (1, 9)),),
    variants=(Variant(fields=(
        F("model", "const", value="Waveman-Switch"),
        F("id", kind="enum", terms=((2, -1, 0),), add=0xF,
          map={i: chr(ord("A") + i) for i in range(16)}),
        # nb1 = 0xF - (4*hi + lo): (nb1 >> 2) + 1 = (3 - hi) + 1,
        # (nb1 & 3) + 1 = (3 - lo) + 1
        F("channel", kind="int", terms=((3, -1, 0),), add=4),
        F("button", kind="int", terms=((4, -1, 0),), add=4),
        F("state", kind="enum", terms=((5, -1, 0),), add=0xF,
          map={0xE: "ON", 0x6: "OFF"}),
    )),),
))


def _min_rows_guard(n):
    def guard(bits):
        if bits.num_rows < n:
            return DECODE_ABORT_EARLY
        return None
    return guard


_spec(DeclSpec(
    # GT-WT-02 (ref src/devices/gt_wt_02.c:44-141; temperature.py):
    # 37-bit rows (39 = 2 lead bits), nibble-sum-mod-64 checksum,
    # first decodable row wins
    symbol="gt_wt_02",
    min_bits=37, max_bits=39, exact_lens=(37, 39),
    len_aligns=((39, 2),), row_mode="any",
    host_guard=_min_rows_guard(2),
    frame_bits=40, in_bits=296,
    checks=(Check("add_nibbles", off=0, nbytes=4, mask=0x3F,
                  cmp_off=31, cmp_width=6,
                  bit_map=tuple(range(31)) + (-1,)),),
    raws=(Raw(0, 8),          # 0 id
          Raw(8, 1),          # 1 battery_low
          Raw(9, 1),          # 2 button
          Raw(10, 2),         # 3 channel
          Raw(12, 12),        # 4 temp signed
          Raw(24, 7),         # 5 hum_raw
          Raw(0, 32),         # 6 nonzero guard (b0..b3)
          Raw(32, 8)),        # 7 nonzero guard (b4)
    sanity=((San(6, "ne", 0), San(7, "ne", 0)),   # OR-group: any(b[:5])
            San(3, "le", 2),
            San(4, "ge", -20.0, signed_bits=12, fmul=0.1),
            San(4, "le", 60.0, signed_bits=12, fmul=0.1),
            San(5, "in", (10, 110) + tuple(range(20, 91))),),
    variants=(Variant(fields=(
        F("model", "const", value="GT-WT02"),
        F("id", terms=((0, 1, 0),), pretty="ID Code"),
        F("channel", terms=((3, 1, 0),), add=1, pretty="Channel"),
        F("battery_ok", terms=((1, -1, 0),), add=1, pretty="Battery"),
        F("temperature_C", kind="float", terms=((4, 1, 12),), mul=0.1,
          pretty="Temperature", fmt="%.1f C"),
        F("humidity", kind="mapf", terms=((5, 1, 0),),
          map={10: 0, 110: 100}, pretty="Humidity", fmt="%.0f %%"),
        F("button", terms=((2, 1, 0),), pretty="Button "),
        F("mic", "const", value="CHECKSUM", pretty="Integrity"),
    )),),
))


# CRC-4(0x3) xor-folded check shared by s3318p / kedsum / esperanza_ews
# (ref src/devices/s3318p.c:85-88): crc4(b[:4]) ^ (b4 >> 4) == b4 & 0xF
_S3318_CRC = Check(
    "crc4", off=0, nbytes=4, p1=0x3, p2=0x0, cmp_off=36, cmp_width=4,
    xor_bits=tuple((32 + j, 1 << (3 - j)) for j in range(4)))


def _s3318p_guard(bits):
    if bits.bits_per_row[0] == 0 and bits.num_rows > 1 \
            and bits.bits_per_row[1] == 0:
        return DECODE_ABORT_EARLY
    return None


_spec(DeclSpec(
    # Conrad S3318P (ref src/devices/s3318p.c:60-116; temperature.py):
    # 42-bit rows x4, 2 lead bits, CRC-4, tenth-degrees F offset 90
    symbol="s3318p",
    min_bits=42, max_bits=42, exact_lens=(42,), row_mode="repeat",
    min_repeats=4, repeat_min_bits=42, host_guard=_s3318p_guard,
    align_off=2, frame_bits=40, in_bits=296,
    checks=(_S3318_CRC,),
    raws=(Raw(0, 8),                                    # 0 id
          Raw(10, 2),                                   # 1 channel-1
          Raw(0, 12,                                    # 2 temp raw
              bit_order=tuple(range(20, 24)) + tuple(range(16, 20))
              + tuple(range(12, 16))),
          Raw(0, 8,                                     # 3 humidity
              bit_order=tuple(range(28, 32)) + tuple(range(24, 28))),
          Raw(33, 1),                                   # 4 battery flag
          Raw(32, 1),                                   # 5 button
          Raw(0, 32)),                                  # 6 nonzero guard
    sanity=(San(6, "ne", 0),),
    variants=(Variant(fields=(
        F("model", "const", value="Conrad-S3318P"),
        F("id", terms=((0, 1, 0),), pretty="ID"),
        F("channel", terms=((1, 1, 0),), add=1, pretty="Channel"),
        F("battery_ok", terms=((4, -1, 0),), add=1, pretty="Battery"),
        F("temperature_F", kind="float", terms=((2, 1, 0),), add=-900,
          mul=0.1, pretty="Temperature", fmt="%.2f F"),
        F("humidity", terms=((3, 1, 0),), pretty="Humidity", fmt="%u %%",
          cond=San(3, "ne", 0)),
        F("button", terms=((5, 1, 0),), pretty="Button"),
        F("mic", "const", value="CRC", pretty="Integrity"),
    )),),
))


def _kedsum_guard(bits):
    if bits.num_rows < 5 or any(bits.bits_per_row[i] != 0
                                for i in range(5)):
        return DECODE_ABORT_EARLY
    return None


_spec(DeclSpec(
    # Kedsum-TH (ref src/devices/kedsum.c:36-95; temperature.py): 5 empty
    # sync rows, 42-bit rows x4, CRC-4, battery level enum
    symbol="kedsum",
    min_bits=42, max_bits=42, exact_lens=(42,), row_mode="repeat",
    min_repeats=4, repeat_min_bits=42, host_guard=_kedsum_guard,
    align_off=2, frame_bits=40, in_bits=296,
    checks=(_S3318_CRC,),
    raws=(Raw(0, 8),                                    # 0 id
          Raw(10, 2),                                   # 1 channel-1
          Raw(8, 2),                                    # 2 battery code
          Raw(0, 12,                                    # 3 temp raw
              bit_order=tuple(range(20, 24)) + tuple(range(16, 20))
              + tuple(range(12, 16))),
          Raw(0, 8,                                     # 4 humidity
              bit_order=tuple(range(28, 32)) + tuple(range(24, 28))),
          Raw(0, 8,                                     # 5 flags:
              bit_order=(8, 9, -1, -1, 32, 33, 34, 35))),  # (b1&C0)|(b4>>4)
    variants=(Variant(fields=(
        F("model", "const", value="Kedsum-TH"),
        F("id", terms=((0, 1, 0),), pretty="ID"),
        F("channel", terms=((1, 1, 0),), add=1, pretty="Channel"),
        F("battery_ok", kind="enumf", terms=((2, 1, 0),), mul=0.01,
          map={0: 0, 1: 10, 2: 100, 3: 30}, pretty="Battery level"),
        F("flags", terms=((5, 1, 0),), pretty="Flags2"),
        F("temperature_F", kind="float", terms=((3, 1, 0),), add=-900,
          mul=0.1, pretty="Temperature", fmt="%.2f F"),
        F("humidity", terms=((4, 1, 0),), pretty="Humidity", fmt="%u %%"),
        F("mic", "const", value="CRC", pretty="Integrity"),
    )),),
))


def _esperanza_guard(bits):
    # exactly 14 rows alternating empty / identical 42-bit payloads
    # (ref src/devices/esperanza_ews.c:62-110)
    from .base import DECODE_ABORT_LENGTH, DECODE_FAIL_SANITY
    if bits.bits_per_row[0] != 0 or bits.num_rows < 2 \
            or bits.bits_per_row[1] != 0:
        return DECODE_FAIL_SANITY
    if bits.num_rows != 14:
        return DECODE_ABORT_LENGTH
    for row in range(2, bits.num_rows - 3, 2):
        if bits.bits_per_row[row] != 42 \
                or not (bits.bb[row] == bits.bb[row + 2]).all():
            return DECODE_FAIL_SANITY
    return [2]


_spec(DeclSpec(
    # Esperanza EWS (ref src/devices/esperanza_ews.c:62-110;
    # temperature.py): row pattern validated host-side, CRC-4 on row 2
    symbol="esperanza_ews",
    min_bits=42, max_bits=42, exact_lens=(42,), row_mode="any",
    host_guard=_esperanza_guard, align_off=2, frame_bits=40, in_bits=296,
    checks=(_S3318_CRC,),
    raws=(Raw(0, 8),                                    # 0 id
          Raw(10, 2),                                   # 1 channel-1
          Raw(0, 12,                                    # 2 temp raw
              bit_order=tuple(range(20, 24)) + tuple(range(16, 20))
              + tuple(range(12, 16))),
          Raw(0, 8,                                     # 3 humidity
              bit_order=tuple(range(28, 32)) + tuple(range(24, 28))),
          Raw(33, 1)),                                  # 4 battery flag
    variants=(Variant(fields=(
        F("model", "const", value="Esperanza-EWS"),
        F("id", terms=((0, 1, 0),), pretty="ID"),
        F("channel", terms=((1, 1, 0),), add=1, pretty="Channel"),
        F("battery_ok", terms=((4, -1, 0),), add=1, pretty="Battery"),
        F("temperature_F", kind="float", terms=((2, 1, 0),), add=-900,
          mul=0.1, pretty="Temperature", fmt="%.2f F"),
        F("humidity", terms=((3, 1, 0),), pretty="Humidity", fmt="%u %%"),
        F("mic", "const", value="CRC", pretty="Integrity"),
    )),),
))


_spec(DeclSpec(
    # Solight TE44 (ref src/devices/solight_te44.c:41-91; temperature.py):
    # Rubicson layout, battery unused
    symbol="solight_te44",
    min_bits=36, max_bits=37, exact_lens=(37,), row_mode="repeat",
    min_repeats=3, repeat_min_bits=36, frame_bits=40, in_bits=296,
    checks=(_RUBICSON_CRC,),
    raws=(Raw(0, 8), Raw(10, 2), Raw(12, 12), Raw(24, 4)),
    sanity=(San(3, "eq", 0xF),),
    variants=(Variant(fields=(
        F("model", "const", value="Solight-TE44"),
        F("id", terms=((0, 1, 0),), pretty="Id"),
        F("channel", terms=((1, 1, 0),), add=1, pretty="Channel"),
        F("temperature_C", kind="float", terms=((2, 1, 12),), mul=0.1,
          pretty="Temperature", fmt="%.2f C"),
        F("mic", "const", value="CRC", pretty="Integrity"),
    )),),
))


_spec(DeclSpec(
    # Auriol AFW2A1 (ref src/devices/auriol_afw2a1.c:55-115;
    # temperature.py): fixed 0xA nibble, range sanity only
    symbol="auriol_afw2a1",
    min_bits=36, row_mode="repeat", min_repeats=12, repeat_min_bits=36,
    frame_bits=40, in_bits=296,
    raws=(Raw(0, 8),          # 0 id
          Raw(10, 2),         # 1 channel-1
          Raw(8, 1),          # 2 battery_ok
          Raw(9, 1),          # 3 button
          Raw(12, 12),        # 4 temp signed
          Raw(24, 4),         # 5 const 0xA nibble
          Raw(28, 8)),        # 6 humidity
    sanity=(San(5, "eq", 0xA),
            San(6, "le", 0x64),
            San(4, "ge", -51.1, signed_bits=12, fmul=0.1),
            San(4, "le", 76.7, signed_bits=12, fmul=0.1),),
    variants=(Variant(fields=(
        F("model", "const", value="Auriol-AFW2A1"),
        F("id", terms=((0, 1, 0),)),
        F("channel", terms=((1, 1, 0),), add=1, pretty="Channel"),
        F("battery_ok", terms=((2, 1, 0),), pretty="Battery"),
        F("button", terms=((3, 1, 0),), pretty="Button"),
        F("temperature_C", kind="float", terms=((4, 1, 12),), mul=0.1,
          pretty="Temperature", fmt="%.1f C"),
        F("humidity", kind="float", terms=((6, 1, 0),),
          pretty="Humidity", fmt="%.0f %%"),
    )),),
))


_spec(DeclSpec(
    # Auriol AHFL (ref src/devices/auriol_ahfl.c:30-100; temperature.py):
    # 42-bit rows x2, fixed 0x4 nibble, 6-bit nibble-sum checksum
    symbol="auriol_ahfl",
    min_bits=42, max_bits=42, exact_lens=(42,), row_mode="repeat",
    min_repeats=2, repeat_min_bits=42, frame_bits=48, in_bits=296,
    checks=(Check("add_nibbles", off=0, nbytes=5, mask=0x3F,
                  cmp_off=36, cmp_width=6,
                  bit_map=tuple(range(32)) + tuple(range(32, 36))
                  + (-1,) * 4),),
    raws=(Raw(0, 8),          # 0 id
          Raw(10, 2),         # 1 channel-1
          Raw(8, 1),          # 2 battery_ok
          Raw(9, 1),          # 3 button
          Raw(12, 12),        # 4 temp signed
          Raw(32, 4),         # 5 const 0x4 nibble
          Raw(31, 1),         # 6 zero bit (b3 & 1)
          Raw(24, 7)),        # 7 humidity
    sanity=(San(5, "eq", 0x4),
            San(6, "eq", 0x0),),
    variants=(Variant(fields=(
        F("model", "const", value="Auriol-AHFL"),
        F("id", terms=((0, 1, 0),)),
        F("channel", terms=((1, 1, 0),), add=1, pretty="Channel"),
        F("battery_ok", terms=((2, 1, 0),), pretty="Battery"),
        F("button", terms=((3, 1, 0),), pretty="Button"),
        F("temperature_C", kind="float", terms=((4, 1, 12),), mul=0.1,
          pretty="Temperature", fmt="%.1f C"),
        F("humidity", terms=((7, 1, 0),), pretty="Humidity", fmt="%d %%"),
        F("mic", "const", value="CHECKSUM", pretty="Integrity"),
    )),),
))


_spec(DeclSpec(
    # inFactory-TH (ref src/devices/infactory.c:55-116; temperature.py):
    # CRC-4 poly 0x13 with channel/CRC nibble swap, BCD humidity
    symbol="infactory",
    min_bits=40, max_bits=42, exact_lens=(40, 41, 42), row_mode="row0",
    frame_bits=40, in_bits=64,
    checks=(
        # crc4(0x13) over [b0, (b1&0F)|((b4&0F)<<4), b2, b3]
        # ^ (b4>>4) == (b1>>4)
        Check("crc4", off=0, nbytes=4, p1=0x13, p2=0x0,
              cmp_off=8, cmp_width=4,
              bit_map=tuple(range(0, 8)) + tuple(range(36, 40))
              + tuple(range(12, 16)) + tuple(range(16, 24))
              + tuple(range(24, 32)),
              xor_bits=tuple((32 + j, 1 << (3 - j)) for j in range(4))),),
    raws=(Raw(0, 8),          # 0 id
          Raw(38, 2),         # 1 channel
          Raw(13, 1),         # 2 battery flag
          Raw(12, 1),         # 3 button
          Raw(16, 12),        # 4 temp raw
          Raw(28, 4),         # 5 humidity tens (BCD)
          Raw(32, 4)),        # 6 humidity ones (BCD)
    sanity=(San(1, "ne", 0),
            San(0, "le", 100, terms=((5, 10, 0), (6, 1, 0))),),
    variants=(Variant(fields=(
        F("model", "const", value="inFactory-TH"),
        F("id", terms=((0, 1, 0),), pretty="ID"),
        F("channel", terms=((1, 1, 0),), pretty="Channel"),
        F("battery_ok", terms=((2, -1, 0),), add=1, pretty="Battery"),
        F("button", terms=((3, 1, 0),), pretty="Button"),
        F("temperature_F", kind="float", terms=((4, 1, 0),), add=-900,
          mul=0.1, pretty="Temperature", fmt="%.2f F"),
        F("humidity", terms=((5, 10, 0), (6, 1, 0)), pretty="Humidity",
          fmt="%u %%"),
        F("mic", "const", value="CRC", pretty="Integrity"),
    )),),
))


_spec(DeclSpec(
    # Springfield-Soil (ref src/devices/springfield.c:33-107;
    # temperature.py): XOR nibble-folded checksum, moisture level
    symbol="springfield",
    min_bits=36, max_bits=37, exact_lens=(36, 37), row_mode="repeat",
    min_repeats=3, repeat_min_bits=36, frame_bits=40, in_bits=296,
    # xor_bytes(b[:4]) hi nibble ^ lo nibble == 0: pure xor_bits check
    # (each frame bit k of bytes 0..3 contributes 1 << (3 - (k%8)%4))
    checks=(Check("xor_bytes", off=0, nbytes=0, cmp_const=0, mask=0xF,
                  xor_bits=tuple((k, 1 << (3 - (k % 8) % 4))
                                 for k in range(32))),),
    raws=(Raw(0, 32),         # 0 word guard
          Raw(0, 8),          # 1 id
          Raw(8, 1),          # 2 battery
          Raw(9, 1),          # 3 button
          Raw(10, 2),         # 4 channel-1
          Raw(12, 12),        # 5 temp signed
          Raw(24, 4)),        # 6 moisture level
    sanity=(San(0, "ne", 0),
            San(0, "ne", 0xFFFFFFFF),
            San(5, "ge", -30, signed_bits=12, fmul=0.1),
            San(5, "le", 70, signed_bits=12, fmul=0.1),
            San(6, "le", 10),),
    variants=(Variant(fields=(
        F("model", "const", value="Springfield-Soil"),
        F("id", terms=((1, 1, 0),), pretty="SID"),
        F("channel", terms=((4, 1, 0),), add=1, pretty="Channel"),
        F("battery_ok", terms=((2, -1, 0),), add=1, pretty="Battery"),
        F("transmit", kind="enum", terms=((3, 1, 0),),
          map={1: "MANUAL", 0: "AUTO"}, pretty="Transmit"),
        F("temperature_C", kind="float", terms=((5, 1, 12),), mul=0.1,
          pretty="Temperature", fmt="%.1f C"),
        F("moisture", terms=((6, 10, 0),), pretty="Moisture", fmt="%d %%"),
        F("button", terms=((3, 1, 0),), pretty="Button"),
        F("mic", "const", value="CHECKSUM", pretty="Integrity"),
    )),),
))


_spec(DeclSpec(
    # TFA-Pool (ref src/devices/tfa_pool_thermometer.c:30-80;
    # temperature.py): nibble-sum-minus-1 checksum in the first nibble
    symbol="tfa_pool_thermometer",
    min_bits=28, max_bits=28, exact_lens=(28,), row_mode="repeat",
    min_repeats=7, repeat_min_bits=28, frame_bits=28, in_bits=296,
    checks=(Check("add_nibbles", off=0, nbytes=3, add_const=-1, mask=0xF,
                  cmp_off=0, cmp_width=4,
                  bit_map=tuple(range(4, 28))),),
    raws=(Raw(4, 8),          # 0 device id
          Raw(12, 12),        # 1 temp raw
          Raw(24, 2),         # 2 channel
          Raw(26, 1)),        # 3 battery
    variants=(Variant(fields=(
        F("model", "const", value="TFA-Pool"),
        F("id", terms=((0, 1, 0),), pretty="Id"),
        F("channel", terms=((2, 1, 0),), pretty="Channel"),
        F("battery_ok", terms=((3, 1, 0),), pretty="Battery"),
        # (raw - 4096 if raw > 2048 else raw) * 0.1 — note: NOT plain
        # two's complement (2048 itself stays positive)
        F("temperature_C", kind="float",
          terms=((1, 1, 0, (2048, 4096)),), mul=0.1,
          pretty="Temperature", fmt="%.1f C"),
        F("mic", "const", value="CHECKSUM", pretty="Integrity"),
    )),),
))


_spec(DeclSpec(
    # Thermopro-TP11 (ref src/devices/thermopro_tp11.c:22-60;
    # temperature.py): reflected LFSR-8 digest gen 0x51 key 0x04
    symbol="thermopro_tp11",
    min_bits=32, max_bits=33, row_mode="repeat", min_repeats=2,
    repeat_min_bits=32, frame_bits=32, in_bits=296,
    checks=(Check("lfsr_digest8_reflect", off=0, nbytes=3, p1=0x51,
                  p2=0x04, cmp_off=24, cmp_width=8),),
    raws=(Raw(0, 12),         # 0 device id
          Raw(12, 12),        # 1 temp raw
          Raw(0, 32)),        # 2 all-0/all-FF guard
    sanity=(San(2, "ne", 0),
            San(2, "ne", 0xFFFFFFFF),),
    variants=(Variant(fields=(
        F("model", "const", value="Thermopro-TP11"),
        F("id", terms=((0, 1, 0),), pretty="Id"),
        F("temperature_C", kind="float", terms=((1, 1, 0),), add=-200,
          mul=0.1, pretty="Temperature", fmt="%.1f C"),
        F("mic", "const", value="CRC", pretty="Integrity"),
    )),),
))


def _tp12_rows(bits):
    # repeated-prefix row selection with a data-dependent repeat count
    # (ref src/devices/thermopro_tp12.c:46-106)
    row = bits.find_repeated_prefix(5 if bits.num_rows > 5 else 2, 40)
    if row < 0:
        return DECODE_ABORT_EARLY
    return [row]


_spec(DeclSpec(
    # Thermopro-TP12 (ref src/devices/thermopro_tp12.c:46-106;
    # temperature.py): two probe temperatures, reflected LFSR-8
    symbol="thermopro_tp12",
    min_bits=41, max_bits=41, exact_lens=(41,), row_mode="any",
    host_guard=_tp12_rows, frame_bits=40, in_bits=296,
    checks=(Check("lfsr_digest8_reflect", off=0, nbytes=4, p1=0x51,
                  p2=0x04, cmp_off=32, cmp_width=8),),
    raws=(Raw(0, 8),          # 0 id
          Raw(0, 12,          # 1 temp1: ((b2 & F0) << 4) | b1
              bit_order=tuple(range(16, 20)) + tuple(range(8, 16))),
          Raw(0, 12,          # 2 temp2: ((b2 & 0F) << 8) | b3
              bit_order=tuple(range(20, 24)) + tuple(range(24, 32))),
          Raw(0, 32)),        # 3 nonzero guard
    sanity=(San(3, "ne", 0),),
    variants=(Variant(fields=(
        F("model", "const", value="Thermopro-TP12"),
        F("id", terms=((0, 1, 0),), pretty="Id"),
        F("temperature_1_C", kind="float", terms=((1, 1, 0),), add=-200,
          mul=0.1, pretty="Temperature 1 (Food)", fmt="%.1f C"),
        F("temperature_2_C", kind="float", terms=((2, 1, 0),), add=-200,
          mul=0.1, pretty="Temperature 2 (Barbecue)", fmt="%.1f C"),
        F("mic", "const", value="CRC", pretty="Integrity"),
    )),),
))


_spec(DeclSpec(
    # Hyundai-WS (ref src/devices/wssensor.c:30-92; temperature.py):
    # 24-bit rows x4, no MIC, signed temperature
    symbol="wssensor",
    min_bits=24, max_bits=24, exact_lens=(24,), row_mode="repeat",
    min_repeats=4, repeat_min_bits=23, frame_bits=24, in_bits=296,
    raws=(Raw(0, 12),         # 0 temp signed
          Raw(16, 8),         # 1 id (byte 2)
          Raw(14, 2),         # 2 channel-1
          Raw(12, 1),         # 3 battery
          Raw(13, 1),         # 4 button
          Raw(0, 24)),        # 5 guard
    sanity=(San(5, "ne", 0),
            San(5, "ne", 0xFFFFFF),),
    variants=(Variant(fields=(
        F("model", "const", value="Hyundai-WS"),
        F("id", terms=((1, 1, 0),), pretty="House Code"),
        F("channel", terms=((2, 1, 0),), add=1, pretty="Channel"),
        F("battery_ok", terms=((3, 1, 0),), pretty="Battery"),
        F("temperature_C", kind="float", terms=((0, 1, 12),), mul=0.1,
          pretty="Temperature", fmt="%.2f C"),
        F("button", terms=((4, 1, 0),), pretty="Button"),
    )),),
))


def _generic_temp_guard(bits):
    from .base import DECODE_ABORT_LENGTH
    for i in range(1, 10):
        if i >= bits.num_rows or bits.bits_per_row[i] != 24:
            return DECODE_ABORT_LENGTH
    return [1]


_spec(DeclSpec(
    # Generic-Temperature (ref src/devices/generic_temperature_sensor.c:
    # 22-62; temperature.py): rows 1-9 all 24 bits, no MIC
    symbol="generic_temperature_sensor",
    min_bits=24, max_bits=24, row_mode="any",
    host_guard=_generic_temp_guard, frame_bits=24, in_bits=64,
    raws=(Raw(0, 8),          # 0 id
          Raw(8, 2),          # 1 battery bits
          Raw(10, 14),        # 2 temp raw (signed 14, then >> 2)
          Raw(0, 24)),        # 3 guard
    sanity=(San(3, "ne", 0),
            San(3, "ne", 0xFFFFFF),),
    variants=(Variant(fields=(
        F("model", "const", value="Generic-Temperature"),
        F("id", terms=((0, 1, 0),), pretty="Id"),
        F("battery_ok", terms=((1, 1, 0),), pretty="Battery?"),
        F("temperature_C", kind="float", terms=((2, 1, 14),), shr=2,
          mul=0.1, pretty="Temperature", fmt="%.2f C"),
    )),),
))


# ---------------------------------------------------------------------------
# FSK PCM family
# ---------------------------------------------------------------------------

def _lacrosse_it_spec(symbol, model):
    # LaCrosse TX29/TX35 IT (ref src/devices/lacrosse_tx35.c:76-180;
    # protocols.py _lacrosse_it): a2dd49 preamble, frame at match+20,
    # crc8(0x31) over 4 bytes, BCD temperature, humidity 106=none
    # 125=probe (+0x40 on id), events for EVERY matching row
    return DeclSpec(
        symbol=symbol,
        min_bits=24, row_mode="all",
        preamble="101000101101110101001001",   # a2dd49
        align_off=-4,                          # frame starts at match+20
        frame_bits=40, in_bits=512,
        checks=(Check("crc8", off=0, nbytes=4, p1=0x31, p2=0x00,
                      cmp_off=32, cmp_width=8),),
        raws=(Raw(4, 6),        # 0 sensor id
              Raw(12, 4),       # 1 temp tens (BCD)
              Raw(16, 4),       # 2 temp ones
              Raw(20, 4),       # 3 temp tenths
              Raw(10, 1),       # 4 new battery
              Raw(24, 1),       # 5 battery low
              Raw(25, 7)),      # 6 humidity
        variants=(
            Variant(cond=San(6, "eq", 125), fields=(
                F("model", "const", value=model),
                F("id", terms=((0, 1, 0),), add=0x40),
                F("battery_ok", terms=((5, -1, 0),), add=1,
                  pretty="Battery"),
                F("newbattery", terms=((4, 1, 0),), pretty="NewBattery"),
                F("temperature_C", kind="fsum",
                  terms=((1, 10, 0), (2, 1, 0), (3, 0.1, 0)), add=-40.0,
                  pretty="Temperature", fmt="%.1f C"),
                F("mic", "const", value="CRC", pretty="Integrity"),
            )),
            Variant(cond=San(6, "eq", 106), fields=(
                F("model", "const", value=model),
                F("id", terms=((0, 1, 0),)),
                F("battery_ok", terms=((5, -1, 0),), add=1,
                  pretty="Battery"),
                F("newbattery", terms=((4, 1, 0),), pretty="NewBattery"),
                F("temperature_C", kind="fsum",
                  terms=((1, 10, 0), (2, 1, 0), (3, 0.1, 0)), add=-40.0,
                  pretty="Temperature", fmt="%.1f C"),
                F("mic", "const", value="CRC", pretty="Integrity"),
            )),
            Variant(fields=(
                F("model", "const", value=model),
                F("id", terms=((0, 1, 0),)),
                F("battery_ok", terms=((5, -1, 0),), add=1,
                  pretty="Battery"),
                F("newbattery", terms=((4, 1, 0),), pretty="NewBattery"),
                F("temperature_C", kind="fsum",
                  terms=((1, 10, 0), (2, 1, 0), (3, 0.1, 0)), add=-40.0,
                  pretty="Temperature", fmt="%.1f C"),
                F("humidity", terms=((6, 1, 0),), pretty="Humidity",
                  fmt="%u %%"),
                F("mic", "const", value="CRC", pretty="Integrity"),
            )),
        ),
    )


_spec(_lacrosse_it_spec("lacrosse_tx35", "LaCrosse-TX35DTHIT"))
_spec(_lacrosse_it_spec("lacrosse_tx29", "LaCrosse-TX29IT"))


# ---------------------------------------------------------------------------
# Doorbells / remotes / rain gauges batch
# ---------------------------------------------------------------------------

_spec(DeclSpec(
    # Elro-DB286A doorbell (ref src/devices/elro_db286a.c:20-40;
    # remotes.py): 33-bit code repeated 5x, no MIC
    symbol="elro_db286a",
    min_bits=33, max_bits=33, exact_lens=(33,), row_mode="repeat",
    min_repeats=5, repeat_min_bits=33, frame_bits=33, in_bits=296,
    raws=(Raw(0, 32),),
    variants=(Variant(fields=(
        F("model", "const", value="Elro-DB286A"),
        F("id", kind="hexs", terms=((0, 1, 0),), val=8, pretty="ID"),
    )),),
))


from .remotes2 import _DISH_BUTTONS  # noqa: E402  (data table)

_spec(DeclSpec(
    # Dish Network remote 6.3 (ref src/devices/dish_remote_6_3.c;
    # remotes2.py): 16-bit rows x3, fixed framing bits, button table
    symbol="dish_remote_6_3",
    min_bits=16, max_bits=16, row_mode="repeat", min_repeats=3,
    repeat_min_bits=16, frame_bits=16, in_bits=296,
    raws=(Raw(0, 6),                                    # 0 button code
          Raw(6, 2),                                    # 1 must be 2
          Raw(0, 4, bit_order=(8, 9, 10, 12))),         # 2 framing 0xB
    sanity=(San(1, "eq", 0x2),
            San(2, "eq", 0xB),),
    variants=(Variant(fields=(
        F("model", "const", value="Dish-RC63"),
        F("button", kind="enum", terms=((0, 1, 0),),
          map={i: s for i, s in enumerate(_DISH_BUTTONS)}),
    )),),
))


_spec(DeclSpec(
    # Blyss-DC5ukwh (ref src/devices/blyss.c:18-48; remotes.py): two
    # fixed 33-bit codes (both end in 0x80)
    symbol="blyss",
    min_bits=33, max_bits=33, exact_lens=(33,), row_mode="any",
    frame_bits=40, in_bits=296,
    raws=(Raw(0, 32), Raw(32, 8)),
    sanity=(San(0, "in", (0xCE8E2A6C, 0xE7377A2C)),
            San(1, "eq", 0x80),),
    variants=(Variant(fields=(
        F("model", "const", value="Blyss-DC5ukwh"),
        F("id", kind="hexs", terms=((0, 1, 0),), val=8),
    )),),
))


def _acurite_rain_guard(bits):
    if bits.num_rows < 12 and bits.bits_per_row[0] >= 24:
        return DECODE_ABORT_EARLY
    return None


_spec(DeclSpec(
    # Acurite-Rain 896 (ref src/devices/acurite.c:151-185; weather
    # family): 24-bit row 0, >= 12 rows, stale bytes 3/4 must be zero
    symbol="acurite_rain_896",
    min_bits=24, row_mode="row0", host_guard=_acurite_rain_guard,
    frame_bits=40, in_bits=296,
    raws=(Raw(0, 8),          # 0 id
          Raw(8, 8),          # 1 b1
          Raw(16, 8),         # 2 b2
          Raw(24, 8),         # 3 b3 (stale, must be 0)
          Raw(32, 8),         # 4 b4 (stale, must be 0)
          Raw(12, 12)),       # 5 rain counter
    sanity=(San(0, "ne", 0), San(1, "ne", 0), San(2, "ne", 0),
            San(3, "eq", 0), San(4, "eq", 0),),
    variants=(Variant(fields=(
        F("model", "const", value="Acurite-Rain"),
        F("id", terms=((0, 1, 0),)),
        F("rain_mm", kind="float", terms=((5, 1, 0),), mul=0.5,
          pretty="Total Rain", fmt="%.1f mm"),
    )),),
))


_spec(DeclSpec(
    # Quhwa-Doorbell (ref src/devices/quhwa.c:16-48; remotes.py):
    # inverted 18-bit code repeated 5x
    symbol="quhwa",
    min_bits=18, max_bits=18, exact_lens=(18,), row_mode="repeat",
    min_repeats=5, repeat_min_bits=18, frame_bits=24, in_bits=296,
    raws=(Raw(0, 24),         # 0 nonzero guard (pre-inversion, stale ok)
          Raw(14, 2),         # 1 must be 0 (inverted 0x03)
          Raw(16, 2),         # 2 must be 0 (inverted 0xC0)
          Raw(0, 16)),        # 3 id source
    sanity=(San(0, "ne", 0),
            San(1, "eq", 0),
            San(2, "eq", 0),),
    variants=(Variant(fields=(
        F("model", "const", value="Quhwa-Doorbell"),
        F("id", terms=((3, -1, 0),), add=0xFFFF, pretty="ID"),
    )),),
))


_spec(DeclSpec(
    # RF-tech / INFRA 217S34 (ref src/devices/rftech.c; temperature
    # family): sign-magnitude temperature, no MIC
    symbol="rftech",
    min_bits=24, max_bits=24, exact_lens=(24,), row_mode="repeat",
    min_repeats=3, repeat_min_bits=24, frame_bits=24, in_bits=296,
    raws=(Raw(0, 8),          # 0 id
          Raw(8, 1),          # 1 sign
          Raw(9, 7),          # 2 integer degrees
          Raw(20, 4),         # 3 tenths
          Raw(16, 1),         # 4 battery
          Raw(17, 2)),        # 5 button bits
    variants=(
        Variant(cond=San(1, "eq", 1), fields=(
            F("model", "const", value="RF-tech"),
            F("id", terms=((0, 1, 0),), pretty="Id"),
            F("battery_ok", terms=((4, 1, 0),), pretty="Battery"),
            # -(a + 0.1*b): IEEE negation distributes over the sum
            F("temperature_C", kind="fsum",
              terms=((2, -1, 0), (3, -0.1, 0)), pretty="Temperature",
              fmt="%.1f C"),
            F("button", kind="bool", terms=((5, 1, 0),), pretty="Button"),
        )),
        Variant(fields=(
            F("model", "const", value="RF-tech"),
            F("id", terms=((0, 1, 0),), pretty="Id"),
            F("battery_ok", terms=((4, 1, 0),), pretty="Battery"),
            F("temperature_C", kind="fsum",
              terms=((2, 1, 0), (3, 0.1, 0)), pretty="Temperature",
              fmt="%.1f C"),
            F("button", kind="bool", terms=((5, 1, 0),), pretty="Button"),
        )),
    ),
))


_spec(DeclSpec(
    # Eurochron-TH (ref src/devices/eurochron.c; temperature.py)
    symbol="eurochron",
    min_bits=36, max_bits=36, row_mode="repeat", min_repeats=3,
    repeat_min_bits=36, frame_bits=40, in_bits=296,
    raws=(Raw(0, 8),          # 0 id
          Raw(12, 4),         # 1 must be 0
          Raw(8, 1),          # 2 battery-low flag
          Raw(11, 1),         # 3 button
          Raw(16, 8),         # 4 humidity
          Raw(24, 12)),       # 5 temp signed 12
    sanity=(San(1, "eq", 0),),
    variants=(Variant(fields=(
        F("model", "const", value="Eurochron-TH"),
        F("id", terms=((0, 1, 0),)),
        F("battery_ok", terms=((2, -1, 0),), add=1, pretty="Battery"),
        F("temperature_C", kind="float", terms=((5, 1, 12),), mul=0.1,
          pretty="Temperature", fmt="%.1f C"),
        F("humidity", terms=((4, 1, 0),), pretty="Humidity"),
        F("button", terms=((3, 1, 0),), pretty="Button"),
    )),),
))


_spec(DeclSpec(
    # Maverick-ET73 BBQ (ref src/devices/maverick_et73.c; temperature.py)
    symbol="maverick_et73",
    min_bits=48, max_bits=48, exact_lens=(48,), row_mode="repeat",
    min_repeats=3, repeat_min_bits=48, frame_bits=48, in_bits=296,
    raws=(Raw(0, 8),          # 0 id
          Raw(8, 12),         # 1 temp1 signed 12
          Raw(20, 12),        # 2 temp2 signed 12
          Raw(0, 32)),        # 3 all-0/all-FF guard
    sanity=(San(3, "ne", 0),
            San(3, "ne", 0xFFFFFFFF),),
    variants=(Variant(fields=(
        F("model", "const", value="Maverick-ET73"),
        F("id", terms=((0, 1, 0),), pretty="Random Id"),
        F("temperature_1_C", kind="float", terms=((1, 1, 12),), mul=0.1,
          pretty="Temperature 1", fmt="%.1f C"),
        F("temperature_2_C", kind="float", terms=((2, 1, 12),), mul=0.1,
          pretty="Temperature 2", fmt="%.1f C"),
    )),),
))


def _rfxmeter_rows(bits):
    from .base import DECODE_ABORT_LENGTH
    if bits.num_rows not in (1, 2):
        return DECODE_ABORT_LENGTH
    return [bits.num_rows - 1]


_spec(DeclSpec(
    # RFXMeter / RFXPower (ref src/devices/rfxmeter.c; meters family):
    # id ^ 0xF0 == next byte, nibble-sum == 0x0F
    symbol="rfxmeter",
    min_bits=48, max_bits=48, exact_lens=(48,), row_mode="any",
    host_guard=_rfxmeter_rows, frame_bits=48, in_bits=296,
    checks=(
        Check("xor_bytes", off=0, nbytes=2, cmp_const=0xF0),
        Check("add_nibbles", off=0, nbytes=6, mask=0xF, cmp_const=0x0F),),
    raws=(Raw(0, 8),          # 0 id
          Raw(40, 4),         # 1 msg type
          # 2 msg value: (b4 << 16) | (b2 << 8) | b3
          Raw(0, 24, bit_order=tuple(range(32, 40)) + tuple(range(16, 24))
              + tuple(range(24, 32)))),
    variants=(Variant(fields=(
        F("model", "const", value="RfxMeter"),
        F("id", terms=((0, 1, 0),), pretty="Id"),
        F("msg_type", terms=((1, 1, 0),), pretty="Msg Type"),
        F("msg_value", terms=((2, 1, 0),), pretty="Msg Value"),
        F("mic", "const", value="CHECKSUM", pretty="Integrity"),
    )),),
))


_spec(DeclSpec(
    # TFA Drop 30.3233.01 rain gauge (ref src/devices/tfa_drop_30.3233.c;
    # weather family): inverted, reflected LFSR-8 gen 0x31 key 0xF4
    symbol="tfa_drop_303233",
    min_bits=66, max_bits=82, row_mode="repeat", min_repeats=2,
    repeat_min_bits=66, transform="invert", frame_bits=66, in_bits=296,
    checks=(Check("lfsr_digest8_reflect", off=0, nbytes=7, p1=0x31,
                  p2=0xF4, cmp_off=56, cmp_width=8),),
    raws=(Raw(0, 4),          # 0 type nibble (0x3)
          Raw(4, 20),         # 1 id
          Raw(24, 1),         # 2 battery-low
          # 3 rain counter: (b6 << 8) | b4
          Raw(0, 16, bit_order=tuple(range(48, 56)) + tuple(range(32, 40))),
          ),
    sanity=(San(0, "eq", 0x3),),
    variants=(Variant(fields=(
        F("model", "const", value="TFA-Drop"),
        F("id", terms=((1, 1, 0),), pretty="", fmt="%5x"),
        F("battery_ok", terms=((2, -1, 0),), add=1, pretty="Battery"),
        F("rain_mm", kind="float", terms=((3, 1, 0),), add=10,
          modulo=0x10000, mul=0.254, pretty="Rain total", fmt="%.1f mm"),
        F("mic", "const", value="CHECKSUM", pretty="Integrity"),
    )),),
))


_spec(DeclSpec(
    # Akhan-100F14 RKE (ref src/devices/akhan_100F14.c:19-59;
    # remotes.py): inverted 25-bit code, command nibble lookup
    symbol="akhan_100F14",
    min_bits=25, max_bits=25, exact_lens=(25,), row_mode="row0",
    frame_bits=25, in_bits=64,
    raws=(Raw(0, 20),         # 0 ~id source
          Raw(20, 4)),        # 1 ~cmd source
    sanity=(San(1, "in", (14, 13, 11, 7)),),   # ~cmd in {1,2,4,8}
    variants=(Variant(fields=(
        F("model", "const", value="Akhan-100F14"),
        F("id", terms=((0, -1, 0),), add=0xFFFFF, pretty="ID (20bit)",
          fmt="0x%x"),
        F("data", kind="enum", terms=((1, -1, 0),), add=0xF,
          map={0x1: "0x1 (Lock)", 0x2: "0x2 (Unlock)",
               0x4: "0x4 (Mute)", 0x8: "0x8 (Alarm)"},
          pretty="Data (4bit)"),
    )),),
))


def _generic_motion_rows(bits):
    rows = [i for i in range(bits.num_rows) if bits.count_repeats(i) >= 3]
    if not rows:
        return DECODE_ABORT_EARLY
    return rows


_spec(DeclSpec(
    # Generic-Motion (ref src/devices/generic_motion.c:33-60; misc):
    # 20-bit rows repeated >= 3x (any row), no checksum
    symbol="generic_motion",
    min_bits=20, max_bits=20, exact_lens=(20,), row_mode="any",
    host_guard=_generic_motion_rows, frame_bits=24, in_bits=64,
    raws=(Raw(0, 20),         # 0 code
          Raw(8, 16)),        # 1 b1|b2 guard (stale tail read)
    sanity=(San(1, "ne", 0x0000),
            San(1, "ne", 0xFFF0),),
    variants=(Variant(fields=(
        F("model", "const", value="Generic-Motion"),
        F("code", kind="hexs", terms=((0, 1, 0),), val=5),
    )),),
))


# ---------------------------------------------------------------------------
# Temperature / rain PPM+PWM batch 5 (round-5 session 2)
# ---------------------------------------------------------------------------

_spec(DeclSpec(
    # Acurite-606TX (ref src/devices/acurite.c:1904-1958; acurite.py
    # acurite_606): 32/33-bit rows x3, LFSR-8 digest gen 0x98 key 0xF1
    symbol="acurite_606",
    min_bits=32, max_bits=33, row_mode="repeat", min_repeats=3,
    repeat_min_bits=32, frame_bits=32, in_bits=296,
    checks=(Check("lfsr_digest8", off=0, nbytes=3, p1=0x98, p2=0xF1,
                  cmp_off=24, cmp_width=8),),
    raws=(Raw(0, 8),          # 0 id
          Raw(12, 12),        # 1 temperature (signed 12)
          Raw(10, 2),         # 2 channel
          Raw(8, 1),          # 3 battery
          Raw(9, 1),          # 4 button
          Raw(0, 32)),        # 5 all-zero guard
    sanity=(San(5, "ne", 0),),
    variants=(Variant(fields=(
        F("model", "const", value="Acurite-606TX"),
        F("id", terms=((0, 1, 0),)),
        F("channel", terms=((2, 1, 0),), add=1, pretty="Channel"),
        F("battery_ok", terms=((3, 1, 0),), pretty="Battery"),
        F("button", terms=((4, 1, 0),), pretty="Button"),
        F("temperature_C", kind="float", terms=((1, 1, 12),), mul=0.1,
          pretty="Temperature", fmt="%.1f C"),
        F("mic", "const", value="CHECKSUM", pretty="Integrity"),
    )),),
))


_spec(DeclSpec(
    # Globaltronics Quigg GT-TMBBQ-05 (ref src/devices/gt_tmbbq05.c;
    # bbq.py gt_tmbbq05): 33-bit rows x5, frame at bit 1, even parity
    # over [b0,b1,b2,b3&F0] plus nibble-sum == low nibble of b3
    symbol="gt_tmbbq05",
    min_bits=33, max_bits=33, exact_lens=(33,), row_mode="repeat",
    min_repeats=5, repeat_min_bits=33, align_off=1,
    frame_bits=32, in_bits=296,
    checks=(Check("parity_bytes", off=0, nbytes=4, cmp_const=0,
                  bit_map=tuple(range(28)) + (-1,) * 4),
            Check("add_nibbles", off=0, nbytes=4, mask=0xF,
                  cmp_off=28, cmp_width=4,
                  bit_map=tuple(range(28)) + (-1,) * 4),),
    raws=(Raw(0, 16,          # 0 id: (b0 << 8) | b2
              bit_order=tuple(range(0, 8)) + tuple(range(16, 24))),
          Raw(0, 10,          # 1 temp: ((b3 & C0) << 2) | b1
              bit_order=(24, 25) + tuple(range(8, 16))),
          Raw(0, 32)),        # 2 all-zero guard
    sanity=(San(2, "ne", 0),),
    variants=(Variant(fields=(
        F("model", "const", value="GT-TMBBQ05"),
        F("id", terms=((0, 1, 0),), pretty="ID Code"),
        F("temperature_F", kind="float", terms=((1, 1, 0),), add=-90,
          pretty="Temperature", fmt="%.2f F"),
        F("mic", "const", value="CHECKSUM", pretty="Integrity"),
    )),),
))


_spec(DeclSpec(
    # Rubicson 48659 meat thermometer (ref src/devices/rubicson_48659.c;
    # bbq.py rubicson_48659): (sum(b0..b2) - b3) & FF == A6; a set sign
    # bit yields temperature -1.0 (reference operator-precedence quirk)
    symbol="rubicson_48659",
    min_bits=10, max_bits=33, row_mode="repeat", min_repeats=10,
    repeat_min_bits=32, frame_bits=32, in_bits=296,
    checks=(Check("add_bytes", off=0, nbytes=3, cmp_off=24, cmp_width=8,
                  add_const=-0xA6),),
    raws=(Raw(0, 8),          # 0 id
          Raw(13, 1),         # 1 sign-bit quirk (b1 & 0x04)
          Raw(14, 10)),       # 2 temperature: ((b1 & 3) << 8) | b2
    variants=(
        Variant(cond=San(1, "eq", 1), fields=(
            F("model", "const", value="Rubicson-48659"),
            F("id", terms=((0, 1, 0),), pretty="Id"),
            F("temperature_F", "const", value=-1.0,
              pretty="Temperature", fmt="%.1f F"),
            F("mic", "const", value="CHECKSUM", pretty="Integrity"),
        )),
        Variant(fields=(
            F("model", "const", value="Rubicson-48659"),
            F("id", terms=((0, 1, 0),), pretty="Id"),
            F("temperature_F", kind="float", terms=((2, 1, 0),),
              pretty="Temperature", fmt="%.1f F"),
            F("mic", "const", value="CHECKSUM", pretty="Integrity"),
        )),
    ),
))


_spec(DeclSpec(
    # Baldr / RainPoint rain gauge (ref src/devices/baldr_rain.c;
    # meters.py baldr_rain): 36-bit rows x3, no MIC, all-0/all-F guards
    # over bytes 0/2/3
    symbol="baldr_rain",
    min_bits=36, max_bits=37, row_mode="repeat", min_repeats=3,
    repeat_min_bits=36, frame_bits=40, in_bits=296,
    raws=(Raw(0, 12),         # 0 id
          Raw(12, 4),         # 1 flags
          Raw(16, 20),        # 2 rain
          # 3: b0|b2|b3 combined guard
          Raw(0, 24, bit_order=tuple(range(0, 8)) + tuple(range(16, 32)))),
    sanity=(San(3, "ne", 0x000000),
            San(3, "ne", 0xFFFFFF),),
    variants=(Variant(fields=(
        F("model", "const", value="Baldr-Rain"),
        F("id", terms=((0, 1, 0),), pretty="", fmt="%03x"),
        F("flags", terms=((1, 1, 0),), pretty="Flags", fmt="%x"),
        F("rain_in", kind="float", terms=((2, 1, 0),), mul=0.001,
          pretty="Rain", fmt="%.3f in"),
    )),),
))


_spec(DeclSpec(
    # Baldr-E0666TH (ref src/devices/baldr_therm.c; temperature.py
    # baldr_therm): 64-bit rows x8, fixed-zero guard fields, no MIC
    symbol="baldr_therm",
    min_bits=64, max_bits=65, row_mode="repeat", min_repeats=8,
    repeat_min_bits=64, frame_bits=64, in_bits=296,
    raws=(Raw(0, 16,          # 0 id: (b0 << 8) | b7
              bit_order=tuple(range(0, 8)) + tuple(range(56, 64))),
          Raw(10, 2),         # 1 channel
          Raw(8, 1),          # 2 battery
          Raw(12, 12),        # 3 temperature (signed 12)
          Raw(28, 8),         # 4 humidity: ((b3 << 4) | (b4 >> 4)) & FF
          Raw(52, 1),         # 5 startup (b6 & 0x08)
          Raw(9, 1),          # 6 guard (b1 & 0x40)
          Raw(24, 4),         # 7 guard (b3 & 0xF0)
          Raw(36, 4),         # 8 guard (b4 & 0x0F)
          Raw(40, 8),         # 9 guard b5
          Raw(0, 7,           # 10 guard (b6 & 0xF7)
              bit_order=(48, 49, 50, 51, 53, 54, 55))),
    sanity=(San(6, "eq", 0), San(7, "eq", 0xF), San(8, "eq", 0),
            San(9, "eq", 0), San(10, "eq", 0)),
    variants=(Variant(fields=(
        F("model", "const", value="Baldr-E0666TH"),
        F("id", terms=((0, 1, 0),), pretty="ID"),
        F("channel", terms=((1, 1, 0),), add=1, pretty="Channel"),
        F("battery_ok", kind="bool", terms=((2, 1, 0),),
          pretty="Battery"),
        F("temperature_C", kind="float", terms=((3, 1, 12),), mul=0.1,
          pretty="Temperature", fmt="%.1f C"),
        F("humidity", terms=((4, 1, 0),), pretty="Humidity", fmt="%u %%"),
        F("startup", kind="bool", terms=((5, 1, 0),), pretty="Startup"),
    )),),
))


def _single_row_guard(bits):
    if bits.num_rows != 1:
        return DECODE_ABORT_LENGTH
    return None


_spec(DeclSpec(
    # Gasmate-BA1008 meat thermometer (ref src/devices/gasmate_ba1008.c;
    # bbq.py gasmate_ba1008): single 32-bit row, nibble sum == 0x0C,
    # sign-magnitude BCD temperature
    symbol="gasmate_ba1008",
    min_bits=32, max_bits=32, exact_lens=(32,), row_mode="row0",
    host_guard=_single_row_guard, frame_bits=32, in_bits=64,
    checks=(Check("add_nibbles", off=0, nbytes=4, mask=0xF,
                  cmp_const=0x0C),),
    raws=(Raw(0, 5),          # 0 preamble guard (b0 & 0xF8) >> 3
          Raw(5, 1),          # 1 sign
          Raw(6, 2),          # 2 hundreds
          Raw(8, 4),          # 3 tens (BCD)
          Raw(12, 4),         # 4 ones (BCD)
          Raw(16, 12)),       # 5 unknown_1
    sanity=(San(0, "eq", 0x1E),),
    variants=(
        Variant(cond=San(1, "eq", 1), fields=(
            F("model", "const", value="Gasmate-BA1008"),
            F("temperature_C",
              terms=((2, -100, 0), (3, -10, 0), (4, -1, 0)),
              pretty="Temperature_C", fmt="%d C"),
            F("unknown_1", terms=((5, 1, 0),), pretty="Unknown Value",
              fmt="%03x"),
            F("mic", "const", value="CHECKSUM", pretty="Integrity"),
        )),
        Variant(fields=(
            F("model", "const", value="Gasmate-BA1008"),
            F("temperature_C",
              terms=((2, 100, 0), (3, 10, 0), (4, 1, 0)),
              pretty="Temperature_C", fmt="%d C"),
            F("unknown_1", terms=((5, 1, 0),), pretty="Unknown Value",
              fmt="%03x"),
            F("mic", "const", value="CHECKSUM", pretty="Integrity"),
        )),
    ),
))


_spec(DeclSpec(
    # Auriol 4-LD5661 rain gauge (ref src/devices/auriol_4ld5661.c;
    # meters.py auriol_4ld5661): any 52-bit row, b3 == F0 and
    # (b1 & 0x40) == 0 gates, first decodable row wins
    symbol="auriol_4ld5661",
    min_bits=52, max_bits=52, exact_lens=(52,), row_mode="any",
    frame_bits=56, in_bits=296,
    raws=(Raw(0, 8),          # 0 id
          Raw(8, 1),          # 1 battery
          Raw(12, 12),        # 2 temperature (signed 12)
          Raw(32, 20),        # 3 rain
          Raw(24, 8),         # 4 guard b3
          Raw(9, 1)),         # 5 guard (b1 & 0x40)
    sanity=(San(4, "eq", 0xF0), San(5, "eq", 0)),
    variants=(Variant(fields=(
        F("model", "const", value="Auriol-4LD5661", pretty="Model"),
        F("id", terms=((0, 1, 0),), pretty="ID", fmt="%02x"),
        F("battery_ok", terms=((1, 1, 0),), pretty="Battery OK"),
        F("temperature_C", kind="float", terms=((2, 1, 12),), mul=0.1,
          pretty="Temperature", fmt="%.1f C"),
        F("rain_mm", kind="float", terms=((3, 1, 0),),
          pretty="Rain", fmt="%.1f mm"),
        F("rain", terms=((3, 1, 0),), pretty="Rain tips"),
    )),),
))


_spec(DeclSpec(
    # Florabest-FBTH1 (ref src/devices/florabest.c; temperature.py
    # florabest): 30-bit rows x3, odd parity over the 30 bits
    symbol="florabest",
    min_bits=30, max_bits=30, exact_lens=(30,), row_mode="repeat",
    min_repeats=3, repeat_min_bits=30, frame_bits=32, in_bits=296,
    checks=(Check("parity_bytes", off=0, nbytes=4, cmp_const=1,
                  bit_map=tuple(range(30)) + (-1,) * 2),),
    raws=(Raw(0, 16),         # 0 id
          Raw(0, 8),          # 1 b0 guard
          Raw(16, 13)),       # 2 temp: (b2 << 5) | (b3 >> 3)
    sanity=(San(1, "eq", 0x49),),
    variants=(Variant(fields=(
        F("model", "const", value="Florabest-FBTH1"),
        F("id", terms=((0, 1, 0),), pretty="Id", fmt="%04x"),
        F("temperature_F", kind="fsum", terms=((2, 0.1),), add=-90.0,
          pretty="Temperature", fmt="%.1f F"),
        F("mic", "const", value="PARITY", pretty="Integrity"),
    )),),
))


_spec(DeclSpec(
    # LaCrosse-TX34IT rain gauge (ref src/devices/lacrosse_tx34.c;
    # lacrosse.py lacrosse_tx34): a2dd4 20-bit preamble, crc8(0x31) over
    # 4 bytes, type nibble 5, events for EVERY matching row
    symbol="lacrosse_tx34",
    min_bits=24, row_mode="all",
    preamble="10100010110111010100",          # a2dd4
    need_bits=40, frame_bits=40, in_bits=512,
    checks=(Check("crc8", off=0, nbytes=4, p1=0x31, p2=0x00,
                  cmp_off=32, cmp_width=8),),
    raws=(Raw(0, 4),          # 0 type nibble
          Raw(4, 6),          # 1 id
          Raw(11, 1),         # 2 battery low
          Raw(10, 1),         # 3 new battery
          Raw(16, 16)),       # 4 rain ticks
    sanity=(San(0, "eq", 5),),
    variants=(Variant(fields=(
        F("model", "const", value="LaCrosse-TX34IT"),
        F("id", terms=((1, 1, 0),)),
        F("battery_ok", terms=((2, -1, 0),), add=1, pretty="Battery"),
        F("newbattery", terms=((3, 1, 0),), pretty="New battery"),
        F("rain_mm", kind="float", terms=((4, 1, 0),), mul=0.222,
          pretty="Total rain", fmt="%.1f mm"),
        F("rain_raw", terms=((4, 1, 0),), pretty="Raw rain"),
        F("mic", "const", value="CRC", pretty="Integrity"),
    )),),
))
