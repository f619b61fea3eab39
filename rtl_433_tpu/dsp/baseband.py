"""Baseband DSP ops: AM estimators, integer atan2, FM discriminator, IIR coeffs.

Bit-exact re-implementations (vectorized over ``[..., N]`` sample arrays) of
the reference per-sample loops (ref src/baseband.c): envelope via
``(127-i)^2`` squares (:36), 122/128-51/128 magnitude estimators (:65, :96),
true magnitudes (:82, :113), the Q0.15 order-1 Butterworth low-pass (:145),
and the FM phase-difference discriminator with ``atan2_int16`` (:181-272).

All integer ops use C semantics: int32 arithmetic, truncating division
(``lax.div``), arithmetic right shifts, int16 store-truncation.
Everything here is jit-compatible and shape-polymorphic over leading axes.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# full scale of all AM estimators (ref src/baseband.c:57 "fs 16384")
FS_AMP = 16384

# Q0.15 fixed point (ref src/baseband.c:132-134)
F_SCALE = 15
S_CONST = 1 << F_SCALE


def _fix(x: float) -> int:
    """FIX(x) = (int)(x * 2^15). Ref src/baseband.c:134."""
    return int(x * S_CONST)


# AM low-pass coefficients: butter(1, 0.05), prescaled by /2
# (ref src/baseband.c:151-152)
AM_LP_A1 = _fix(0.85408) >> 1
AM_LP_B = _fix(0.07296) >> 1


# ---------------------------------------------------------------------------
# dB scaling (ref include/baseband.h:36-46)

def amp_to_db(x):
    x = jnp.asarray(x, jnp.float32)
    return 10.0 * jnp.where(x > 0, jnp.log10(x), 0.0) - 42.1442


def mag_to_db(x):
    x = jnp.asarray(x, jnp.float32)
    return 20.0 * jnp.where(x > 0, jnp.log10(x), 0.0) - 84.2884


def db_to_amp(x: float) -> int:
    return int(10.0 ** ((x + 42.1442) / 10.0))


def db_to_mag(x: float) -> int:
    return int(10.0 ** ((x + 84.2884) / 20.0))


def db_to_amp_f(x: float) -> int:
    return int(0.5 + 10.0 ** (x / 10.0))


def db_to_mag_f(x: float) -> int:
    return int(0.5 + 10.0 ** (x / 20.0))


# ---------------------------------------------------------------------------
# AM estimators. Input: interleaved IQ as uint8 [..., N, 2] (cu8) or
# int16 [..., N, 2] (cs16). Output: int32 envelope [..., N] (value range
# fits uint16) plus the block-average dB per batch element.

def envelope_detect_cu8(iq):
    """y = (127-I)^2 + (127-Q)^2, fs 16384. Ref src/baseband.c:36-45."""
    x = 127 - iq[..., 0].astype(jnp.int32)
    y = 127 - iq[..., 1].astype(jnp.int32)
    env = x * x + y * y
    n = env.shape[-1]
    s = jnp.sum(env.astype(jnp.uint32), axis=-1, dtype=jnp.uint32)
    avg_db = jnp.where((n > 0) & (s >= n),
                       amp_to_db(s.astype(jnp.float32) / n), amp_to_db(1))
    return env, avg_db


def magnitude_est_cu8(iq):
    """y = 122*max(|I|,|Q|) + 51*min(|I|,|Q|), fs 16384. Ref src/baseband.c:65-79."""
    x = jnp.abs(iq[..., 0].astype(jnp.int32) - 128)
    y = jnp.abs(iq[..., 1].astype(jnp.int32) - 128)
    mi = jnp.minimum(x, y)
    mx = jnp.maximum(x, y)
    mag = 122 * mx + 51 * mi
    n = mag.shape[-1]
    s = jnp.sum(mag.astype(jnp.uint32), axis=-1, dtype=jnp.uint32)
    avg_db = jnp.where((n > 0) & (s >= n),
                       mag_to_db(s.astype(jnp.float32) / n), mag_to_db(1))
    return mag, avg_db


def magnitude_true_cu8(iq):
    """y = sqrt(I^2+Q^2)*128 truncated to uint16. Ref src/baseband.c:82-93."""
    x = iq[..., 0].astype(jnp.int32) - 128
    y = iq[..., 1].astype(jnp.int32) - 128
    mag = (jnp.sqrt((x * x + y * y).astype(jnp.float32)) * 128.0).astype(jnp.int32)
    mag = mag.astype(jnp.uint16).astype(jnp.int32)
    n = mag.shape[-1]
    s = jnp.sum(mag.astype(jnp.uint32), axis=-1, dtype=jnp.uint32)
    avg_db = jnp.where((n > 0) & (s >= n),
                       mag_to_db(s.astype(jnp.float32) / n), mag_to_db(1))
    return mag, avg_db


def magnitude_est_cs16(iq):
    """(122*max+51*min)>>8 of |I|,|Q| int16. Ref src/baseband.c:96-110."""
    x = jnp.abs(iq[..., 0].astype(jnp.int32))
    y = jnp.abs(iq[..., 1].astype(jnp.int32))
    mi = jnp.minimum(x, y)
    mx = jnp.maximum(x, y)
    mag = (122 * mx + 51 * mi) >> 8
    n = mag.shape[-1]
    s = jnp.sum(mag.astype(jnp.uint32), axis=-1, dtype=jnp.uint32)
    avg_db = jnp.where((n > 0) & (s >= n),
                       mag_to_db(s.astype(jnp.float32) / n), mag_to_db(1))
    return mag, avg_db


def magnitude_true_cs16(iq):
    """sqrt(I^2+Q^2)>>1. Ref src/baseband.c:113-124."""
    x = iq[..., 0].astype(jnp.int64)
    y = iq[..., 1].astype(jnp.int64)
    mag = (jnp.sqrt((x * x + y * y).astype(jnp.float32)).astype(jnp.int32)) >> 1
    n = mag.shape[-1]
    s = jnp.sum(mag.astype(jnp.uint32), axis=-1, dtype=jnp.uint32)
    avg_db = jnp.where((n > 0) & (s >= n),
                       mag_to_db(s.astype(jnp.float32) / n), mag_to_db(1))
    return mag, avg_db


# ---------------------------------------------------------------------------
# integer atan2

def atan2_int16(y, x):
    """Self-normalizing integer atan2, pi == INT16_MAX. Ref src/baseband.c:181-202.

    Vectorized with C truncating division (lax.div on int32).
    """
    y = jnp.asarray(y, jnp.int32)
    x = jnp.asarray(x, jnp.int32)
    I_PI_4 = 32767 // 4       # 8191
    I_3_PI_4 = 3 * 32767 // 4  # 24575
    abs_y = jnp.abs(y)

    denom_i = abs_y + x
    denom_i = jnp.where(denom_i == 0, 1, denom_i)
    angle_i = I_PI_4 - lax.div(I_PI_4 * (x - abs_y), denom_i)

    denom_ii = abs_y - x
    denom_ii = jnp.where(denom_ii == 0, 1, denom_ii)
    angle_ii = I_3_PI_4 - lax.div(I_PI_4 * (x + abs_y), denom_ii)

    angle = jnp.where(x >= 0, angle_i, angle_ii)
    angle = jnp.where(y < 0, -angle, angle)
    angle = jnp.where((x == 0) & (y == 0), 0, angle)
    return angle.astype(jnp.int16)


def atan2_int32(y, x):
    """Q0.30 variant used by the CS16 path. Ref src/baseband.c:281-300."""
    y = jnp.asarray(y, jnp.int64)
    x = jnp.asarray(x, jnp.int64)
    INT32_MAX = 2147483647
    I_PI_4 = INT32_MAX // 4
    I_3_PI_4 = 3 * INT32_MAX // 4
    abs_y = jnp.abs(y)

    denom_i = abs_y + x
    denom_i = jnp.where(denom_i == 0, 1, denom_i)
    angle_i = I_PI_4 - lax.div(I_PI_4 * (x - abs_y), denom_i)

    denom_ii = abs_y - x
    denom_ii = jnp.where(denom_ii == 0, 1, denom_ii)
    angle_ii = I_3_PI_4 - lax.div(I_PI_4 * (x + abs_y), denom_ii)

    angle = jnp.where(x >= 0, angle_i, angle_ii)
    angle = jnp.where(y < 0, -angle, angle)
    return angle.astype(jnp.int32)


# ---------------------------------------------------------------------------
# FM discriminator (phase difference), vectorized part.
# The IIR low-pass that follows is a sequential recurrence computed in the
# engine scan; here we produce the instantaneous-frequency series.

def fm_coeffs(samp_rate: int, low_pass: float, fsk_minmax: bool):
    """Python-side coefficient computation. Ref src/baseband.c:217-231.

    ``low_pass``: >1e4 = Hz, >=1.0 = us, else ratio of fs; 0 selects the
    default 0.2 (minmax) / 0.1 (classic) (ref src/r_flow.c:204).
    Returns (alp1, blp) prescaled-by-2 Q0.15 ints.
    """
    if low_pass == 0.0:
        low_pass = 0.2 if fsk_minmax else 0.1
    # reproduce C float32 unit auto-detect
    if low_pass > 1e4:
        low_pass = low_pass / samp_rate
    elif low_pass >= 1.0:
        low_pass = 1e6 / low_pass / samp_rate
    ita = 1.0 / math.tan(math.pi / 2 * low_pass)
    gain = 1.0 / (1.0 + ita) / 2  # prescaled by div 2
    alp1 = _fix((ita - 1.0) * gain)  # scaled by -1 in the recurrence's name only
    blp = _fix(gain)
    return alp1, blp


def fm_discriminate_cu8(iq, prev_r, prev_i):
    """Instantaneous frequency of CU8 IQ via x[n]*conj(x[n-1]) + atan2_int16.

    Ref src/baseband.c:242-259. ``prev_r/prev_i`` are the last sample of the
    previous block (int32 [...]), returns (phi int16 [..., N], last_r, last_i).
    """
    xr = iq[..., 0].astype(jnp.int32) - 128
    xi = iq[..., 1].astype(jnp.int32) - 128
    x1r = jnp.concatenate([prev_r[..., None], xr[..., :-1]], axis=-1)
    x1i = jnp.concatenate([prev_i[..., None], xi[..., :-1]], axis=-1)
    pr = xr * x1r + xi * x1i
    pi = xi * x1r - xr * x1i
    phi = atan2_int16(pi, pr)
    return phi, xr[..., -1], xi[..., -1]


def fm_discriminate_cs16(iq, prev_r, prev_i):
    """CS16 variant with atan2_int32, output >>16 later. Ref src/baseband.c:335-359."""
    xr = iq[..., 0].astype(jnp.int64)
    xi = iq[..., 1].astype(jnp.int64)
    x1r = jnp.concatenate([prev_r[..., None].astype(jnp.int64), xr[..., :-1]], axis=-1)
    x1i = jnp.concatenate([prev_i[..., None].astype(jnp.int64), xi[..., :-1]], axis=-1)
    pr = xr * x1r + xi * x1i
    pi = xi * x1r - xr * x1i
    phi = atan2_int32(pi, pr)
    return phi, xr[..., -1].astype(jnp.int32), xi[..., -1].astype(jnp.int32)


def fm_coeffs32(samp_rate: int, low_pass: float, fsk_minmax: bool):
    """Q0.30 coefficients for the CS16 path. Ref src/baseband.c:310-324."""
    if low_pass == 0.0:
        low_pass = 0.2 if fsk_minmax else 0.1
    if low_pass > 1e4:
        low_pass = low_pass / samp_rate
    elif low_pass >= 1.0:
        low_pass = 1e6 / low_pass / samp_rate
    ita = 1.0 / math.tan(math.pi / 2 * low_pass)
    gain = 1.0 / (1.0 + ita)
    alp1 = int((ita - 1.0) * gain * (1 << 30))
    blp = int(gain * (1 << 30))
    return alp1, blp


# ---------------------------------------------------------------------------
# host-side sequential filters for the -w stream dumpers (single channel,
# offline; the hot path computes these on device in the engine/kernel)

def am_lowpass_np(am_raw, y0=0, x0=0):
    """AM low-pass over a [N] int stream (ref src/baseband.c:161-168).
    Returns (filtered int16-truncated array, (y, x) carry)."""
    import numpy as np
    am_raw = np.asarray(am_raw, np.int64)
    out = np.empty_like(am_raw)
    y, x = int(y0), int(x0)
    for n in range(am_raw.shape[0]):
        v = (AM_LP_A1 * y + AM_LP_B * (am_raw[n] + x)) >> 14
        v = ((int(v) & 0xFFFF) ^ 0x8000) - 0x8000
        out[n] = v
        y, x = v, int(am_raw[n])
    return out, (y, x)


def fm_lowpass_np(phi, alp1, blp, y0=0, p0=0):
    """FM low-pass over a [N] int stream (ref src/baseband.c:263-271)."""
    import numpy as np
    phi = np.asarray(phi, np.int64)
    out = np.empty_like(phi)
    y, p = int(y0), int(p0)
    for n in range(phi.shape[0]):
        v = (alp1 * y + blp * (phi[n] + p)) >> 14
        v = ((int(v) & 0xFFFF) ^ 0x8000) - 0x8000
        out[n] = v
        y, p = v, int(phi[n])
    return out, (y, p)
