"""Batched MIC kernels (ops/mic.py) vs the scalar host library (bits/util.py).

Each kernel must be bit-exact with its host twin (which is itself pinned
against the reference C, ref src/bit_util.c:240-556) for every byte
pattern — fuzzed over random messages and the poly/init/gen/key values the
decoders actually use.
"""

import numpy as np
import pytest

from rtl_433_tpu.bits import util
from rtl_433_tpu.ops import mic

RNG = np.random.default_rng(42)


def _msgs(n, nbytes):
    return RNG.integers(0, 256, size=(n, nbytes), dtype=np.uint8)


CRC_CASES = [
    (4, 0x31, 0x00), (7, 0x31, 0x00), (2, 0x07, 0x00), (14, 0x2F, 0x00),
    (8, 0x131 & 0xFF, 0xFF), (6, 0x81, 0x00), (5, 0x9C, 0x3D),
]


@pytest.mark.parametrize("nbytes,poly,init", CRC_CASES)
def test_crc8(nbytes, poly, init):
    msgs = _msgs(64, nbytes + 2)
    got = np.asarray(mic.crc8(msgs, nbytes, poly, init))
    want = [util.crc8(bytes(m), nbytes, poly, init) for m in msgs]
    assert got.tolist() == want


@pytest.mark.parametrize("nbytes,poly,init", CRC_CASES)
def test_crc8le(nbytes, poly, init):
    msgs = _msgs(64, nbytes + 2)
    got = np.asarray(mic.crc8le(msgs, nbytes, poly, init))
    want = [util.crc8le(bytes(m), nbytes, poly, init) for m in msgs]
    assert got.tolist() == want


CRC16_CASES = [
    (10, 0x8005, 0xFFFF), (14, 0x8005, 0xFFFF), (6, 0x1021, 0x0000),
    (9, 0x1021, 0xFFFF), (4, 0x8810, 0x0000),
]


@pytest.mark.parametrize("nbytes,poly,init", CRC16_CASES)
def test_crc16(nbytes, poly, init):
    msgs = _msgs(64, nbytes + 1)
    got = np.asarray(mic.crc16(msgs, nbytes, poly, init))
    want = [util.crc16(bytes(m), nbytes, poly, init) for m in msgs]
    assert got.tolist() == want


@pytest.mark.parametrize("nbytes,poly,init", CRC16_CASES)
def test_crc16lsb(nbytes, poly, init):
    msgs = _msgs(64, nbytes + 1)
    got = np.asarray(mic.crc16lsb(msgs, nbytes, poly, init))
    want = [util.crc16lsb(bytes(m), nbytes, poly, init) for m in msgs]
    assert got.tolist() == want


LFSR_CASES = [(5, 0x98, 0xF1), (7, 0x83, 0x7A), (9, 0x31, 0xF4)]


@pytest.mark.parametrize("nbytes,gen,key", LFSR_CASES)
def test_lfsr_digest8(nbytes, gen, key):
    msgs = _msgs(64, nbytes + 1)
    got = np.asarray(mic.lfsr_digest8(msgs, nbytes, gen, key))
    want = [util.lfsr_digest8(bytes(m), nbytes, gen, key) for m in msgs]
    assert got.tolist() == want


@pytest.mark.parametrize("nbytes,gen,key", LFSR_CASES)
def test_lfsr_digest8_reverse(nbytes, gen, key):
    msgs = _msgs(64, nbytes + 1)
    got = np.asarray(mic.lfsr_digest8_reverse(msgs, nbytes, gen, key))
    want = [util.lfsr_digest8_reverse(bytes(m), nbytes, gen, key)
            for m in msgs]
    assert got.tolist() == want


@pytest.mark.parametrize("nbytes,gen,key", LFSR_CASES)
def test_lfsr_digest8_reflect(nbytes, gen, key):
    msgs = _msgs(64, nbytes + 1)
    got = np.asarray(mic.lfsr_digest8_reflect(msgs, nbytes, gen, key))
    want = [util.lfsr_digest8_reflect(bytes(m), nbytes, gen, key)
            for m in msgs]
    assert got.tolist() == want


@pytest.mark.parametrize("nbytes,gen,key", [
    (5, 0x8810, 0xABF9), (9, 0x8810, 0x5412), (11, 0x8810, 0x0ACC)])
def test_lfsr_digest16(nbytes, gen, key):
    msgs = _msgs(64, nbytes + 1)
    got = np.asarray(mic.lfsr_digest16(msgs, nbytes, gen, key))
    want = [util.lfsr_digest16(bytes(m), nbytes, gen, key) for m in msgs]
    assert got.tolist() == want


def test_reductions():
    msgs = _msgs(64, 13)
    for n in (1, 7, 13):
        assert np.asarray(mic.xor_bytes(msgs, n)).tolist() == \
            [util.xor_bytes(bytes(m), n) for m in msgs]
        assert np.asarray(mic.add_bytes(msgs, n)).tolist() == \
            [util.add_bytes(bytes(m), n) for m in msgs]
        assert np.asarray(mic.add_nibbles(msgs, n)).tolist() == \
            [util.add_nibbles(bytes(m), n) for m in msgs]
        assert np.asarray(mic.parity_bytes(msgs, n)).tolist() == \
            [util.parity_bytes(bytes(m), n) for m in msgs]


def test_batch_shapes():
    """Any-leading-shape batching: [P, R, B] rows in one call."""
    msgs = _msgs(6 * 4, 8).reshape(6, 4, 8)
    got = np.asarray(mic.crc8(msgs, 7, 0x31, 0x00))
    assert got.shape == (6, 4)
    for i in range(6):
        for j in range(4):
            assert got[i, j] == util.crc8(bytes(msgs[i, j]), 7, 0x31, 0x00)
