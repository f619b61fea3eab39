"""Pallas front-end kernel vs the plain-JAX baseband path (bit-exact).

The kernel fuses AM estimation + AM IIR + FM discriminator + FM IIR (ref
src/baseband.c per-sample loops); on the CPU test backend it runs in
interpreter mode. The reference for comparison is a numpy transliteration
of the same recurrences the engine scan applies.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtl_433_tpu.dsp import baseband
from rtl_433_tpu.dsp.engine import DetectorParams, detector_init, process_block
from rtl_433_tpu.ops.frontend import frontend

STATE_KEYS = ("lp_y", "lp_x", "fm_y", "fm_phi_prev", "fm_xr", "fm_xi")


def _sext16(v):
    return ((v & 0xFFFF) ^ 0x8000) - 0x8000


def _ref_filters(iq, state, sample_rate=250_000, use_mag_est=False,
                 fsk_minmax=True):
    C, N, _ = iq.shape
    if use_mag_est:
        am_raw, avg = baseband.magnitude_est_cu8(jnp.asarray(iq))
    else:
        am_raw, avg = baseband.envelope_detect_cu8(jnp.asarray(iq))
    phi, _, _ = baseband.fm_discriminate_cu8(
        jnp.asarray(iq), state["fm_xr"], state["fm_xi"])
    alp1, blp = baseband.fm_coeffs(sample_rate, 0.0, fsk_minmax)
    am_raw = np.asarray(am_raw, np.int64)
    phi = np.asarray(phi, np.int64)
    am_ref = np.zeros((C, N), np.int64)
    fm_ref = np.zeros((C, N), np.int64)
    lp_y = np.asarray(state["lp_y"], np.int64).copy()
    lp_x = np.asarray(state["lp_x"], np.int64).copy()
    fm_y = np.asarray(state["fm_y"], np.int64).copy()
    fm_pp = np.asarray(state["fm_phi_prev"], np.int64).copy()
    for t in range(N):
        a = _sext16((baseband.AM_LP_A1 * lp_y
                     + baseband.AM_LP_B * (am_raw[:, t] + lp_x)) >> 14)
        am_ref[:, t] = a
        lp_y, lp_x = a, am_raw[:, t]
        f = _sext16((alp1 * fm_y + blp * (phi[:, t] + fm_pp)) >> 14)
        fm_ref[:, t] = f
        fm_y, fm_pp = f, phi[:, t]
    return am_ref, fm_ref, np.asarray(avg), (lp_y, lp_x, fm_y, fm_pp)


@pytest.mark.parametrize("use_mag_est", [False, True])
def test_kernel_matches_reference(use_mag_est):
    rng = np.random.default_rng(11)
    C, N = 2048, 192
    iq = rng.integers(0, 256, size=(C, N, 2), dtype=np.uint8)
    state = {k: jnp.asarray(rng.integers(-100, 100, C), jnp.int32)
             for k in STATE_KEYS}
    state["fm_xr"] = jnp.asarray(rng.integers(-128, 128, C), jnp.int32)
    state["fm_xi"] = jnp.asarray(rng.integers(-128, 128, C), jnp.int32)
    am, fm, st, avg = frontend(jnp.asarray(iq), state, sample_rate=250_000,
                               use_mag_est=use_mag_est, time_block=64)
    am_ref, fm_ref, avg_ref, carry = _ref_filters(iq, state,
                                                  use_mag_est=use_mag_est)
    assert np.array_equal(np.asarray(am, np.int64), am_ref)
    assert np.array_equal(np.asarray(fm, np.int64), fm_ref)
    assert np.allclose(np.asarray(avg), avg_ref, atol=1e-4)
    assert np.array_equal(np.asarray(st["lp_y"], np.int64), carry[0])
    assert np.array_equal(np.asarray(st["fm_y"], np.int64), carry[2])
    assert np.array_equal(np.asarray(st["fm_xr"]),
                          iq[:, -1, 0].astype(np.int32) - 128)


def test_kernel_n_valid_masking():
    rng = np.random.default_rng(5)
    C, N = 2048, 128
    nv = 77
    iq = rng.integers(0, 256, size=(C, N, 2), dtype=np.uint8)
    state = {k: jnp.zeros((C,), jnp.int32) for k in STATE_KEYS}
    am, fm, st, _ = frontend(jnp.asarray(iq), state, sample_rate=250_000,
                             time_block=64, n_valid=nv)
    iq_cut = iq[:, :nv]
    am_ref, fm_ref, _, carry = _ref_filters(iq_cut, state)
    assert np.array_equal(np.asarray(am)[:, :nv].astype(np.int64), am_ref)
    assert np.array_equal(np.asarray(fm)[:, :nv].astype(np.int64), fm_ref)
    # IIR and discriminator carries freeze at the last valid sample
    assert np.array_equal(np.asarray(st["lp_y"], np.int64), carry[0])
    assert np.array_equal(np.asarray(st["fm_phi_prev"], np.int64), carry[3])
    assert np.array_equal(np.asarray(st["fm_xr"]),
                          iq[:, nv - 1, 0].astype(np.int32) - 128)


def test_engine_parity_with_kernel():
    """Full detector state identical with and without the Pallas path."""
    import functools
    rng = np.random.default_rng(3)
    C, N = 2048, 2048
    iq = rng.integers(120, 136, size=(C, N, 2), dtype=np.uint8)
    for c in range(0, C, 19):
        for k in range(3):
            s = 200 + k * 500
            iq[c, s:s + 220, :] = rng.integers(10, 246, size=(220, 2),
                                               dtype=np.uint8)

    def run(pf):
        params = DetectorParams(sample_rate=250_000,
                                pallas_frontend=pf)
        step = jax.jit(functools.partial(process_block, params),
                       static_argnames=("flush",))
        st = detector_init(params, C)
        st, avg = step(st, jnp.asarray(iq), flush=False)
        return jax.tree.map(np.asarray, st), np.asarray(avg)

    st0, avg0 = run(False)
    st1, avg1 = run(True)
    for k in st0:
        assert np.array_equal(st0[k], st1[k]), k
    assert np.allclose(avg0, avg1, atol=1e-4)
