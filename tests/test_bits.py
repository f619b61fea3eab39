"""Bit utility + bitbuffer tests.

Test vectors mirror the reference's embedded unit tests
(ref src/bit_util.c:614-674, src/bitbuffer.c _TEST main) plus independent
cross-checks.
"""

import numpy as np
import pytest

from rtl_433_tpu.bits import BitBuffer, util


def test_reverse8():
    assert util.reverse8(0x80) == 0x01
    assert util.reverse8(0x01) == 0x80
    assert util.reverse8(0xCC) == 0x33
    assert util.reverse8(0xA5) == 0xA5
    for x in range(256):
        assert util.reverse8(util.reverse8(x)) == x


def test_reverse32():
    assert util.reverse32(0x00000001) == 0x80000000
    # identity: double application
    for x in (0x12345678, 0xDEADBEEF, 0):
        assert util.reverse32(util.reverse32(x)) == x


def test_crc8_parity_vectors():
    # ref src/bit_util.c:620-626
    msg = bytes([0x08, 0x0A, 0xE8, 0x80])
    assert util.crc8(msg, 3, 0x80, 0x00) == 0x80
    assert util.crc8(msg, 4, 0x80, 0x00) == 0x00


def test_crc16_standard_check():
    # CRC-16/CCITT-FALSE of "123456789" is 0x29B1 (public check value)
    assert util.crc16(b"123456789", 9, 0x1021, 0xFFFF) == 0x29B1
    # CRC-16/IBM (ARC, reflected) of "123456789" is 0xBB3D
    assert util.crc16lsb(b"123456789", 9, 0xA001, 0x0000) == 0xBB3D


def test_crc8_smbus_check():
    # CRC-8 (poly 0x07, init 0) of "123456789" is 0xF4 (public check value)
    assert util.crc8(b"123456789", 9, 0x07, 0x00) == 0xF4


def test_crc4():
    # 4-bit CRC over one byte: remainder of x^8*m(x) mod poly
    assert util.crc4(b"\x00", 1, 0x3, 0x0) == 0
    assert isinstance(util.crc4(b"\x5a", 1, 0x3, 0x5), int)


def test_uart_8n1():
    # ref src/bit_util.c:629-645
    uart = bytes([0x7F, 0xD9, 0x90])
    out = util.extract_bytes_uart_8n1(uart, 0, 24)
    assert out == [0xFF, 0x33]
    uart123 = bytes([0x07, 0xFD, 0x99, 0x40, 0x48, 0x16, 0x04, 0x00])
    out = util.extract_bytes_uart_8n1(uart123, 4, 60)
    assert out == [0xFF, 0x33, 0x01, 0x02, 0x03]


def test_uart_8n2():
    # ref src/bit_util.c:647-655
    uart8n2 = bytes([0x45, 0xE8, 0x8D, 0x65, 0x9D, 0xF0])
    out = util.extract_bytes_uart_8n2(uart8n2, 0, 44)
    assert out == [0xD1, 0x11, 0x4D, 0xEE]


def test_whitening():
    # ref src/bit_util.c:657-667
    chk1 = bytes([0xFF, 0x87, 0xB8, 0x59, 0xB7, 0xA1, 0xCC, 0x24,
                  0x57, 0x5E, 0x4B, 0x9C, 0x0E, 0xE9, 0xEA, 0x50])
    assert bytes(util.ccitt_whitening(bytes(16))) == chk1
    chk2 = bytes([0xFF, 0xE1, 0x1D, 0x9A, 0xED, 0x85, 0x33, 0x24,
                  0xEA, 0x7A, 0xD2, 0x39, 0x70, 0x97, 0x57, 0x0A])
    assert bytes(util.ibm_whitening(bytes(16))) == chk2


def test_parity():
    assert util.parity8(0x00) == 0
    assert util.parity8(0x01) == 1
    assert util.parity8(0x03) == 0
    assert util.parity8(0xFF) == 0
    assert util.parity_bytes(b"\x01\x01") == 0
    assert util.xor_bytes(b"\x0f\xf0") == 0xFF
    assert util.add_bytes(b"\x01\x02\x03") == 6
    assert util.add_nibbles(b"\x12\x34") == 1 + 2 + 3 + 4


def test_lfsr_digest16():
    # fineoffset WH2-style digest is computed with gen 0x8810, key 0xabf9;
    # verify the defining property: digest of zero message is 0, linearity.
    assert util.lfsr_digest16(bytes(4), 4, 0x8810, 0xABF9) == 0
    d1 = util.lfsr_digest16(b"\x01\x00", 2, 0x8810, 0xABF9)
    d2 = util.lfsr_digest16(b"\x00\x80", 2, 0x8810, 0xABF9)
    d12 = util.lfsr_digest16(b"\x01\x80", 2, 0x8810, 0xABF9)
    assert d1 ^ d2 == d12  # GF(2)-linear


# ---------------------------------------------------------------------------
# bitbuffer


def test_add_bit_msb_first():
    b = BitBuffer()
    for bit in (1, 0, 1, 1):
        b.add_bit(bit)
    assert b.num_rows == 1
    assert b.bits_per_row[0] == 4
    assert b.bb[0, 0] == 0b10110000


def test_add_row_and_sync():
    b = BitBuffer()
    b.add_bit(1)
    b.add_row()
    b.add_bit(0)
    b.add_bit(1)
    assert b.num_rows == 2
    assert b.bits_per_row[:2] == [1, 2]
    b.add_sync()
    assert b.num_rows == 3
    assert b.syncs_before_row[2] == 1
    # sync on empty row does not add a row
    b.add_sync()
    assert b.num_rows == 3
    assert b.syncs_before_row[2] == 2


def test_parse_hex():
    b = BitBuffer.parse("{25}fb2dd58")
    assert b.num_rows == 1
    assert b.bits_per_row[0] == 25
    assert b.row_hex(0) == "fb2dd580"

    b = BitBuffer.parse("0xfb2dd58")
    assert b.bits_per_row[0] == 28

    # '/' adds a row, then '{' adds another (C parser semantics,
    # ref src/bitbuffer.c:433-440): middle row stays empty.
    b = BitBuffer.parse("{3}7/{11}f0d")
    assert b.num_rows == 3
    assert b.bits_per_row[0] == 3
    assert b.bits_per_row[1] == 0
    assert b.bits_per_row[2] == 11
    assert b.row_hex(0) == "60"  # {3} truncates 0111 -> 011 -> 0110_0000

    b = BitBuffer.parse("aa/bb")
    assert b.num_rows == 2
    assert b.row_hex(0) == "aa"
    assert b.row_hex(1) == "bb"


def test_invert_value():
    # {12}ff0 = bits 1111 1111 0000 -> inverted 0000 0000 1111, pad cleared
    b = BitBuffer.parse("{12}ff0")
    b.invert()
    assert b.bits_per_row[0] == 12
    assert b.row_bytes(0).tolist() == [0x00, 0xF0]
    b2 = BitBuffer.parse("{12}a50")
    b2.invert()
    assert b2.row_bytes(0).tolist() == [0x5A, 0xF0]


def test_extract_bytes():
    b = BitBuffer.parse("{24}123456")
    assert b.extract_bytes(0, 0, 24).tolist() == [0x12, 0x34, 0x56]
    assert b.extract_bytes(0, 4, 16).tolist() == [0x23, 0x45]
    assert b.extract_bytes(0, 4, 12).tolist() == [0x23, 0x40]


def test_search():
    b = BitBuffer.parse("{16}0af0")
    # search for 1010 (0xA0 pattern, 4 bits) -> at position 4
    assert b.search(0, 0, b"\xa0", 4) == 4
    assert b.search(0, 5, b"\xa0", 4) == 16  # not found -> len
    # pattern at 0
    assert b.search(0, 0, b"\x0a", 8) == 0


def test_manchester_decode():
    # 01 -> 1, 10 -> 0 (IEEE 802.3: bit = second half)
    b = BitBuffer.parse("{8}66")  # 0110 0110 -> pairs 01,10,01,10 -> 1,0,1,0
    out = BitBuffer()
    pos = b.manchester_decode(0, 0, out, 0)
    assert pos == 8
    assert out.bits_per_row[0] == 4
    assert out.bb[0, 0] == 0b10100000


def test_differential_manchester_decode():
    b = BitBuffer.parse("{8}69")  # 0110 1001
    out = BitBuffer()
    b.differential_manchester_decode(0, 0, out, 0)
    assert out.bits_per_row[0] >= 1


def test_repeated_rows():
    b = BitBuffer.parse("{8}aa/{8}aa/{8}ab")
    assert b.find_repeated_row(2, 8) == 0
    assert b.find_repeated_row(3, 8) == -1
    assert b.count_repeats(0) == 2


def test_nrzs_decode():
    b = BitBuffer.parse("{8}ff")  # no transitions -> NRZS gives 1s after first
    b.nrzs_decode()
    assert b.bits_per_row[0] == 8


def test_row_spill():
    b = BitBuffer()
    for _ in range(BitBuffer.parse("{8}00").bb.shape[1] * 8 + 16):  # 1040 bits
        b.add_bit(1)
    assert b.num_rows == 1
    assert b.bits_per_row[0] == 128 * 8 + 16
    assert b.free_row == 2
    assert b.bb[1, 0] == 0xFF  # spilled
