"""Fused baseband front-end as a Pallas TPU kernel.

One kernel pass computes, bit-exactly vs the reference C per-sample loops:

- AM estimator: CU8 envelope ``(127-I)^2 + (127-Q)^2`` or the 122/128-51/128
  magnitude approximation (ref src/baseband.c:36-79),
- AM low-pass: order-1 Butterworth IIR in Q0.15 with int16 store-truncation
  (ref src/baseband.c:145-169),
- FM discriminator: ``x[n]*conj(x[n-1])`` + integer ``atan2_int16``
  (ref src/baseband.c:181-259),
- FM low-pass: order-1 IIR with runtime cutoff (ref src/baseband.c:263-271),
- per-channel envelope sum for the block-mean dB (ref src/baseband.c:41-44).

Layout: channels ride the VPU lanes. The wrapper reshapes ``[C, N]`` streams
to time-major ``[N, C/128, 128]``; the kernel grid is ``(channel_tiles,
time_blocks)`` with the time dimension innermost so the IIR carries live in
VMEM scratch across grid steps of one channel tile. Each ``fori_loop``
iteration advances one sample for a ``[8, 128]`` tile of 1024 channels.

The sequential dependence is only the two order-1 IIRs (4 multiplies); the
estimator, discriminator and atan2 are data-parallel and fused into the same
loop so ``am``/``fm`` streams never round-trip through HBM between stages.

TPU has no vector integer divide, so ``atan2_int16``'s C truncating division
is computed exactly via float32 + remainder correction: the selected-branch
quotient is bounded by ``I_PI_4`` (|numerator| <= I_PI_4 * denominator), so
the f32 estimate is within +-1 and two correction steps make it exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dsp import baseband

SUBS = 16         # sublanes per channel tile (int16 min tile is (16, 128))
LANES = 128       # lanes per channel tile
CTILE = SUBS * LANES

_I_PI_4 = 32767 // 4
_I_3_PI_4 = 3 * 32767 // 4


def _sext16(v):
    """int16 store-truncation on an int32 vector."""
    return ((v & 0xFFFF) ^ 0x8000) - 0x8000


def _trunc_div(n, d):
    """Exact C truncating division n/d (d != 0) without integer divide.

    Magnitude division via f32 with two remainder-correction steps; exact
    whenever the true |quotient| is small enough that the f32 estimate is
    within +-2 (always true for the atan2 branch that gets selected).
    """
    un = jnp.abs(n)
    ud = jnp.abs(d)
    q = (un.astype(jnp.float32) / ud.astype(jnp.float32)).astype(jnp.int32)
    r = un - q * ud
    q = q + jnp.where(r >= ud, 1, 0)
    q = q - jnp.where(r < 0, 1, 0)
    r = un - q * ud
    q = q + jnp.where(r >= ud, 1, 0)
    q = q - jnp.where(r < 0, 1, 0)
    return jnp.where((n ^ d) < 0, -q, q)


def _atan2_int16(y, x):
    """Integer atan2, pi == INT16_MAX (ref src/baseband.c:181-202)."""
    abs_y = jnp.abs(y)
    denom_i = abs_y + x
    denom_i = jnp.where(denom_i == 0, 1, denom_i)
    angle_i = _I_PI_4 - _trunc_div(_I_PI_4 * (x - abs_y), denom_i)
    denom_ii = abs_y - x
    denom_ii = jnp.where(denom_ii == 0, 1, denom_ii)
    angle_ii = _I_3_PI_4 - _trunc_div(_I_PI_4 * (x + abs_y), denom_ii)
    angle = jnp.where(x >= 0, angle_i, angle_ii)
    angle = jnp.where(y < 0, -angle, angle)
    angle = jnp.where((x == 0) & (y == 0), 0, angle)
    return _sext16(angle)


def _kernel(nv_ref, xr_ref, xi_ref, st_in_ref, am_ref, fm_ref, st_out_ref,
            env_ref, st, acc, *, tb, nb, use_mag_est, enable_fm, alp1, blp):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        st[:] = st_in_ref[:]
        acc[:] = jnp.zeros_like(acc)

    n_valid = nv_ref[0]
    base_t = j * tb

    def body(t, carry):
        lp_y, lp_x, fm_y, fm_pp, pr_r, pr_i, acc_v = carry
        xr = xr_ref[t].astype(jnp.int32)
        xi = xi_ref[t].astype(jnp.int32)
        upd = base_t + t < n_valid
        # ---- AM estimator (ref src/baseband.c:36-79). The kernel receives
        # xr = I-128 (the discriminator's operand); the envelope measures
        # (127-I) = -(I-128)-1, identical to bitwise NOT of xr.
        if use_mag_est:
            ax = jnp.abs(xr)
            ay = jnp.abs(xi)
            env = 122 * jnp.maximum(ax, ay) + 51 * jnp.minimum(ax, ay)
        else:
            ex = -xr - 1
            ey = -xi - 1
            env = ex * ex + ey * ey
        acc_v = acc_v + env
        # ---- AM low-pass (ref src/baseband.c:161-168)
        am = _sext16((baseband.AM_LP_A1 * lp_y
                      + baseband.AM_LP_B * (env + lp_x)) >> 14)
        am_ref[t] = am.astype(jnp.int16)
        lp_y = jnp.where(upd, am, lp_y)
        lp_x = jnp.where(upd, env, lp_x)
        if enable_fm:
            # ---- FM discriminator (ref src/baseband.c:242-259)
            pr = xr * pr_r + xi * pr_i
            pi = xi * pr_r - xr * pr_i
            phi = _atan2_int16(pi, pr)
            # ---- FM low-pass (ref src/baseband.c:263-271)
            fm = _sext16((alp1 * fm_y + blp * (phi + fm_pp)) >> 14)
            fm_ref[t] = fm.astype(jnp.int16)
            fm_y = jnp.where(upd, fm, fm_y)
            fm_pp = jnp.where(upd, phi, fm_pp)
            pr_r = jnp.where(upd, xr, pr_r)
            pr_i = jnp.where(upd, xi, pr_i)
        else:
            # FM disabled: the detector's fm stream aliases the raw
            # estimator output (union of buf.temp/buf.fm in the reference,
            # ref include/r_private.h); the envelope reaches 32768 so this
            # variant emits int32
            fm_ref[t] = env
        return lp_y, lp_x, fm_y, fm_pp, pr_r, pr_i, acc_v

    init = (st[0], st[1], st[2], st[3], st[4], st[5], acc[0])
    out = lax.fori_loop(0, tb, body, init)
    for i in range(6):
        st[i] = out[i]
    acc[0] = out[6]

    @pl.when(j == nb - 1)
    def _():
        st_out_ref[:] = st[:]
        env_ref[:] = acc[:]


@functools.lru_cache(maxsize=None)
def _build(n, sc, tb, use_mag_est, enable_fm, alp1, blp):
    nb = n // tb
    ct = sc // SUBS
    kern = functools.partial(_kernel, tb=tb, nb=nb, use_mag_est=use_mag_est,
                             enable_fm=enable_fm, alp1=alp1, blp=blp)
    grid = (ct, nb)
    data_spec = pl.BlockSpec((tb, SUBS, LANES), lambda c, j: (j, c, 0),
                             memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((6, SUBS, LANES), lambda c, j: (0, c, 0),
                           memory_space=pltpu.VMEM)
    env_spec = pl.BlockSpec((1, SUBS, LANES), lambda c, j: (0, c, 0),
                            memory_space=pltpu.VMEM)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid scalar
            data_spec, data_spec, st_spec,
        ],
        out_specs=(data_spec, data_spec, st_spec, env_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, sc, LANES), jnp.int16),   # am
            jax.ShapeDtypeStruct((n, sc, LANES),
                                 jnp.int16 if enable_fm else jnp.int32),
            jax.ShapeDtypeStruct((6, sc, LANES), jnp.int32),   # state
            jax.ShapeDtypeStruct((1, sc, LANES), jnp.int32),   # env sums
        ),
        scratch_shapes=[
            pltpu.VMEM((6, SUBS, LANES), jnp.int32),
            pltpu.VMEM((1, SUBS, LANES), jnp.int32),
        ],
        interpret=interpret,
    )


def frontend(iq, state, *, sample_rate, use_mag_est=False, enable_fm=True,
             fm_low_pass=0.0, fsk_minmax=True, time_block=256, n_valid=None,
             time_major=False):
    """Run the fused front-end kernel over a CU8 block.

    iq: uint8 ``[C, N, 2]``; state: dict with int32 ``[C]`` keys ``lp_y``,
    ``lp_x``, ``fm_y``, ``fm_phi_prev``, ``fm_xr``, ``fm_xi``.

    Returns ``(am, fm, new_state, avg_db)``: IIR-filtered int16-truncated
    ``am``/``fm`` streams (``[C, N]``, or ``[N, C]`` when ``time_major`` --
    the zero-copy layout for the detector scan), plus float32 ``avg_db``
    per channel.
    """
    C, N, _ = iq.shape
    if enable_fm:
        alp1, blp = baseband.fm_coeffs(sample_rate, fm_low_pass, fsk_minmax)
    else:
        alp1, blp = 0, 0
    Cp = -(-C // CTILE) * CTILE
    tb = min(time_block, N)
    while N % tb:
        tb //= 2
    xr = (iq[:, :, 0].astype(jnp.int32) - 128).astype(jnp.int16)
    xi = (iq[:, :, 1].astype(jnp.int32) - 128).astype(jnp.int16)

    def shape_in(a):
        if Cp != C:
            a = jnp.pad(a, ((0, Cp - C), (0, 0)))
        return a.swapaxes(0, 1).reshape(N, Cp // LANES, LANES)

    xr_t = shape_in(xr)
    xi_t = shape_in(xi)

    def shape_st(a):
        if Cp != C:
            a = jnp.pad(a, ((0, Cp - C),))
        return a.reshape(Cp // LANES, LANES)

    st = jnp.stack([shape_st(state["lp_y"]), shape_st(state["lp_x"]),
                    shape_st(state["fm_y"]), shape_st(state["fm_phi_prev"]),
                    shape_st(state["fm_xr"]), shape_st(state["fm_xi"])])
    nv = jnp.asarray([N if n_valid is None else n_valid], jnp.int32)
    call = _build(N, Cp // LANES, tb, bool(use_mag_est), bool(enable_fm),
                  alp1, blp)
    am_t, fm_t, st_o, env_s = call(nv, xr_t, xi_t, st)

    def shape_out(a):
        a = a.reshape(N, Cp)
        if Cp != C:
            a = a[:, :C]
        return a if time_major else a.swapaxes(0, 1)

    am = shape_out(am_t)
    fm = shape_out(fm_t)
    new_state = dict(state)
    st_o = st_o.reshape(6, Cp)[:, :C]
    for i, k in enumerate(("lp_y", "lp_x", "fm_y", "fm_phi_prev",
                           "fm_xr", "fm_xi")):
        new_state[k] = st_o[i]
    s = env_s.reshape(Cp)[:C].astype(jnp.uint32)
    to_db = baseband.mag_to_db if use_mag_est else baseband.amp_to_db
    avg_db = jnp.where((N > 0) & (s >= N),
                       to_db(s.astype(jnp.float32) / N), to_db(1))
    return am, fm, new_state, avg_db
