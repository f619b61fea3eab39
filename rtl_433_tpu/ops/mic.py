"""Batched message-integrity-check (MIC) kernels.

The device-side counterpart of the scalar host library in
``bits/util.py`` (ref src/bit_util.c:240-352): every digest is computed
over a *batch* of byte rows at once — ``msg`` is any-shape ``[..., B]``
uint8/int32 array and the result has shape ``[...]`` — so checksum
plausibility for thousands of (package, decoder) candidate pairs costs one
fused XLA call instead of thousands of Python loops.  Used by the decode
dispatch MIC gates (decoders/mic_gates.py) to skip Python decoder calls
that provably end in DECODE_FAIL_MIC, and usable on-device (jit/vmap/TPU)
because everything is shape-static ``lax``/``jnp`` code.

Bit-exactness: each kernel mirrors its host twin statement for statement
(tests/test_mic_kernels.py fuzzes them against bits/util.py); the LFSR
digests exploit that the key schedule is data-independent — the rolling
key sequence is precomputed host-side and the digest becomes one masked
XOR-reduction over bits, which is the TPU-friendly formulation.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _u8(msg):
    return jnp.asarray(msg).astype(jnp.int32) & 0xFF


def crc8(msg, nbytes: int, poly: int, init: int):
    """MSB-first CRC-8 over msg[..., :nbytes]. Ref src/bit_util.c:278."""
    msg = _u8(msg)
    rem = jnp.full(msg.shape[:-1], init & 0xFF, jnp.int32)
    for k in range(nbytes):
        rem = rem ^ msg[..., k]
        for _ in range(8):
            hit = (rem & 0x80) != 0
            rem = jnp.where(hit, ((rem << 1) ^ poly) & 0xFF,
                            (rem << 1) & 0xFF)
    return rem


def crc8le(msg, nbytes: int, poly: int, init: int):
    """LSB-first (reflected) CRC-8. Ref src/bit_util.c:296."""
    from ..bits.util import reverse8
    msg = _u8(msg)
    rem = jnp.full(msg.shape[:-1], reverse8(init), jnp.int32)
    rpoly = reverse8(poly)
    for k in range(nbytes):
        rem = rem ^ msg[..., k]
        for _ in range(8):
            hit = (rem & 1) != 0
            rem = jnp.where(hit, (rem >> 1) ^ rpoly, rem >> 1)
    return rem & 0xFF


def crc16(msg, nbytes: int, poly: int, init: int):
    """MSB-first CRC-16. Ref src/bit_util.c:334."""
    msg = _u8(msg)
    rem = jnp.full(msg.shape[:-1], init & 0xFFFF, jnp.int32)
    for k in range(nbytes):
        rem = (rem ^ (msg[..., k] << 8)) & 0xFFFF
        for _ in range(8):
            hit = (rem & 0x8000) != 0
            rem = jnp.where(hit, ((rem << 1) ^ poly) & 0xFFFF,
                            (rem << 1) & 0xFFFF)
    return rem


def crc16lsb(msg, nbytes: int, poly: int, init: int):
    """LSB-first CRC-16. Ref src/bit_util.c:315."""
    msg = _u8(msg)
    rem = jnp.full(msg.shape[:-1], init & 0xFFFF, jnp.int32)
    for k in range(nbytes):
        rem = rem ^ msg[..., k]
        for _ in range(8):
            hit = (rem & 1) != 0
            rem = jnp.where(hit, ((rem >> 1) ^ poly) & 0xFFFF, rem >> 1)
    return rem


@functools.lru_cache(maxsize=None)
def _lfsr_keys(nbits: int, gen: int, key: int, width_mask: int,
               roll_left: bool):
    """Data-independent rolling-key schedule for the Galois LFSR digests
    (host-precomputed constants; ref src/bit_util.c:353-434)."""
    keys = np.zeros(nbits, np.int32)
    key &= width_mask
    msb = (width_mask + 1) >> 1
    for i in range(nbits):
        keys[i] = key
        if roll_left:
            key = ((key << 1) ^ gen) & width_mask if key & msb \
                else (key << 1) & width_mask
        else:
            key = ((key >> 1) ^ gen) & width_mask if key & 1 else key >> 1
    return keys


def _bits_msb_first(msg, nbytes: int):
    """[..., nbytes] bytes -> [..., nbytes*8] bits, each byte MSB first."""
    msg = _u8(msg)[..., :nbytes]
    shifts = jnp.arange(7, -1, -1, dtype=jnp.int32)
    return ((msg[..., :, None] >> shifts) & 1).reshape(
        msg.shape[:-1] + (nbytes * 8,))


def lfsr_digest8(msg, nbytes: int, gen: int, key: int):
    """Ref src/bit_util.c:353: bytes first→last, bits MSB→LSB."""
    bits = _bits_msb_first(msg, nbytes)
    keys = jnp.asarray(_lfsr_keys(nbytes * 8, gen, key, 0xFF, False))
    return jnp.bitwise_xor.reduce(jnp.where(bits != 0, keys, 0), axis=-1) \
        & 0xFF


def lfsr_digest8_reverse(msg, nbytes: int, gen: int, key: int):
    """Ref src/bit_util.c:380: bytes last→first, bits MSB→LSB."""
    bits = _bits_msb_first(msg, nbytes)
    # byte k processed at position (nbytes-1-k): flip byte order of keys
    keys = np.asarray(_lfsr_keys(nbytes * 8, gen, key, 0xFF, False))
    keys = keys.reshape(nbytes, 8)[::-1].reshape(-1)
    return jnp.bitwise_xor.reduce(
        jnp.where(bits != 0, jnp.asarray(keys), 0), axis=-1) & 0xFF


def lfsr_digest8_reflect(msg, nbytes: int, gen: int, key: int):
    """Ref src/bit_util.c:407: bytes last→first, bits LSB→MSB, key rolls
    left."""
    bits = _bits_msb_first(msg, nbytes)
    keys = np.asarray(_lfsr_keys(nbytes * 8, gen, key, 0xFF, True))
    # schedule order: k-th processed bit is (byte nbytes-1-floor(k/8),
    # bit k%8 LSB-first); map onto the MSB-first bit layout
    keys = keys.reshape(nbytes, 8)[::-1, ::-1]     # byte asc, bit MSB-first
    return jnp.bitwise_xor.reduce(
        jnp.where(bits != 0, jnp.asarray(keys.reshape(-1)), 0), axis=-1) \
        & 0xFF


def lfsr_digest16(msg, nbytes: int, gen: int, key: int):
    """Ref src/bit_util.c:434."""
    bits = _bits_msb_first(msg, nbytes)
    keys = jnp.asarray(_lfsr_keys(nbytes * 8, gen, key, 0xFFFF, False))
    return jnp.bitwise_xor.reduce(jnp.where(bits != 0, keys, 0), axis=-1) \
        & 0xFFFF


def xor_bytes(msg, nbytes: int):
    msg = _u8(msg)
    return jnp.bitwise_xor.reduce(msg[..., :nbytes], axis=-1)


def add_bytes(msg, nbytes: int):
    msg = _u8(msg)
    return jnp.sum(msg[..., :nbytes], axis=-1)


def add_nibbles(msg, nbytes: int):
    msg = _u8(msg)[..., :nbytes]
    return jnp.sum((msg >> 4) + (msg & 0x0F), axis=-1)


def parity_bytes(msg, nbytes: int):
    """XOR parity of all bits. Ref src/bit_util.c:542-556."""
    x = xor_bytes(msg, nbytes)
    x = x ^ (x >> 4)
    x = x & 0xF
    return (0x6996 >> x) & 1
