"""The fused pulse-detection engine: one jitted scan over [channels, samples].

This is the TPU re-cast of rtl_433's per-sample hot loops (ref
src/r_flow.c:104-372): AM low-pass IIR, FM low-pass IIR, the 4-state OOK
hysteresis machine (ref src/pulse_detect.c:199-483) and the FSK trackers
(ref src/pulse_detect_fsk.c) — evaluated *vectorized over channels*, with
exact C integer semantics (truncating division, int16 store-truncation,
EWMA hacks) so pulse trains match the reference bit-for-bit.

Architecture (TPU-first, not a translation):

- The sample axis is processed by a ``lax.scan`` whose per-step work is a
  handful of VPU ops on ``[C]`` vectors — channels are the parallel axis.
- Pulse/gap pairs are *committed* into a small per-chunk ring buffer
  ``[C, R]`` using dense one-hot writes (cheap on the VPU), instead of
  per-step scatters into the full ``[C, 1200]`` pulse buffers (expensive).
- Every ``chunk`` samples the ring is drained: records are deduplicated
  (FSK rewinds can re-commit an index; last write wins), partitioned by
  package generation, scattered into the working pulse buffers, and
  completed packages are copied into the output slots.
- Completed packages are published to ``out_*`` arrays ([C, cap, 1200]);
  the host gathers them at block end. Caps/overflows are counted in
  diagnostics rather than silently lost.

Sequential-state contracts preserved across blocks (SURVEY.md section 5
"long-context"): IIR carries, detector FSM state, package-in-progress
buffers, lead-in counter, level estimates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import baseband

# Detector constants (ref src/pulse_detect.c:23-27, include/pulse_data.h:21-27)
OOK_MAX_HIGH_LEVEL = 16384   # DB_TO_AMP(0)
OOK_EST_HIGH_RATIO = 64
OOK_EST_LOW_RATIO = 1024
PD_MAX_PULSES = 1200
PD_MIN_PULSES = 16
PD_MIN_PULSE_SAMPLES = 10
PD_MIN_GAP_MS = 10
PD_MAX_GAP_MS = 100
PD_MAX_GAP_RATIO = 10

# FSK constants (ref src/pulse_detect_fsk.c:22-24)
FSK_DEFAULT_FM_DELTA = 6000
FSK_EST_SLOW = 64
FSK_EST_FAST = 16

# OOK state machine states (ref src/pulse_detect.c:36-41)
ST_IDLE, ST_PULSE, ST_GAP_START, ST_GAP = 0, 1, 2, 3
# FSK states (ref include/pulse_detect_fsk.h)
FSK_INIT, FSK_FH, FSK_FL, FSK_ERR = 0, 1, 2, 3

# published package types
PKG_NONE, PKG_OOK, PKG_FSK = 0, 1, 2

# out_meta field indices
(M_TYPE, M_NUM, M_LOW, M_HIGH, M_F1, M_F2, M_START, M_END, M_GEN) = range(9)
META_FIELDS = 9


class DetectorParams(NamedTuple):
    """Static (hashable) detector configuration.

    Levels follow pulse_detect_set_levels (ref src/pulse_detect.c:86-105)
    with rtl_433 defaults fixed=0, min=-12.1442 dB, snr=9 dB
    (ref src/r_api.c:153-156).
    """
    sample_rate: int = 250_000
    use_mag_est: bool = False
    fsk_minmax: bool = False          # False = "classic" (fpdm OLD) detector
    enable_fm: bool = True
    fixed_high_level: float = 0.0     # dB, <0 enables manual override
    min_high_level: float = -12.1442  # dB
    high_low_ratio: float = 9.0       # dB
    fm_low_pass: float = 0.0          # 0 = auto (0.2 minmax / 0.1 classic)
    chunk: int = 128                  # samples per drain interval
    ring: int = 8                     # commit records per chunk per channel
                                      # (~1 per 20 samples possible; 8 holds
                                      # any real signal at 128-sample chunks,
                                      # overflow is counted in n_ring_ovf)
    eops: int = 2                     # EOP records per chunk per channel
    pkg_cap: int = 8                  # published packages kept per block
    max_pulses: int = PD_MAX_PULSES
    unroll: int = 1                   # samples inlined per scan iteration;
                                      # 16 on TPU amortizes loop overhead,
                                      # must stay small on CPU (XLA CPU
                                      # compiles large bodies superlinearly)
    pallas_frontend: bool = False     # fused Pallas kernel for the AM/FM
                                      # estimators + IIRs (TPU; bit-exact)
    arena: int = 32768                # global record-arena slots per block:
                                      # every committed pulse/gap record in
                                      # the block, across ALL channels, is
                                      # gather-compacted into this flat
                                      # arena before the publish scatters,
                                      # so publish cost scales with actual
                                      # records, not C*log (overflow counts
                                      # into n_ring_ovf)
    chan_groups: int = 128            # fast-drain budget: non-empty ring
                                      # groups (chunks with >= 1 record)
                                      # per channel the MXU group-compaction
                                      # stage handles; any channel exceeding
                                      # it routes the WHOLE block through an
                                      # exact (slower) drain via lax.cond —
                                      # the cap never drops records

    @property
    def ook_fixed_high_level(self) -> int:
        if self.fixed_high_level >= 0.0:
            return 0
        f = baseband.db_to_mag if self.use_mag_est else baseband.db_to_amp
        return f(self.fixed_high_level)

    @property
    def ook_min_high_level(self) -> int:
        f = baseband.db_to_mag if self.use_mag_est else baseband.db_to_amp
        return f(self.min_high_level)

    @property
    def ook_high_low_ratio(self) -> int:
        f = baseband.db_to_mag_f if self.use_mag_est else baseband.db_to_amp_f
        return f(self.high_low_ratio)


def detector_init(params: DetectorParams, channels: int):
    """Fresh per-channel detector state pytree (ref pulse_detect_reset,
    src/pulse_detect.c:74-84, and pulse_detect_fsk_init :26-32)."""
    C = channels
    i32 = lambda v=0: jnp.full((C,), v, jnp.int32)
    cap = params.pkg_cap
    mp = params.max_pulses
    return {
        # IIR carries (ref src/baseband.c:167-168, :267-271)
        "lp_y": i32(), "lp_x": i32(),
        "fm_y": i32(), "fm_phi_prev": i32(),
        "fm_xr": i32(), "fm_xi": i32(),
        # OOK FSM
        "ook_state": i32(ST_IDLE), "plen": i32(), "max_pulse": i32(),
        "lead_in": i32(), "low_est": i32(), "high_est": i32(),
        # minimum high-level estimate, raw units — a TRACED operand so the
        # -Y autolevel retune (api._relevel) never recompiles the engine
        # (pulse_detect_set_levels, ref src/pulse_detect.c:86-105)
        "min_high": i32(params.ook_min_high_level),
        "num": i32(), "cur_pulse": i32(), "ook_f1": i32(),
        "pkg_start": i32(), "eop_spur": i32(), "gen": i32(),
        # FSK tracker
        "fsk_state": i32(FSK_INIT), "flen": i32(),
        "f1": i32(), "f2": i32(),
        "vmax": i32(-32768), "vmin": i32(32767), "skip": i32(40),
        "fsk_num": i32(), "fsk_cur_pulse": i32(),
        # classic-rewind history (last 4 committed pairs, newest first)
        "hist_p": jnp.zeros((C, 4), jnp.int32),
        "hist_g": jnp.zeros((C, 4), jnp.int32),
        # cross-block carry of the open package's pulse train
        # (dim1: 0 = OOK package, 1 = FSK package)
        "carry_p": jnp.zeros((C, 2, mp), jnp.int32),
        "carry_g": jnp.zeros((C, 2, mp), jnp.int32),
        # published packages
        "out_p": jnp.zeros((C, cap, mp), jnp.int32),
        "out_g": jnp.zeros((C, cap, mp), jnp.int32),
        "out_meta": jnp.zeros((C, cap, META_FIELDS), jnp.int32),
        "out_n": i32(),
        # diagnostics
        "n_ring_ovf": i32(), "n_pkg_drop": i32(), "n_fsk_ovf": i32(),
    }


def _tdiv(a, b: int):
    """C-style truncating integer division."""
    return lax.div(a, jnp.int32(b))


def _onehot_write(buf, wpos, value, valid):
    """buf[c, wpos[c]] = value[c] where valid[c], via a dense one-hot select."""
    R = buf.shape[-1]
    slots = lax.broadcasted_iota(jnp.int32, (1, R), 1)
    mask = (slots == wpos[:, None]) & valid[:, None]
    return jnp.where(mask, value[:, None], buf)


def _step(params: DetectorParams, fm_alp1: int, fm_blp: int, regs, xs,
          masked: bool = True, prefiltered: bool = False):
    """One sample for all channels. Mirrors pulse_detect_package's while-loop
    body (ref src/pulse_detect.c:293-476) plus the two IIRs.

    ``masked=False`` compiles the streaming hot path without the padded-tail
    freezing (callers guarantee every sample is valid).
    ``prefiltered=True`` takes ``xs`` as already IIR-filtered (am, fm) from
    the fused Pallas front-end kernel and skips the in-scan IIRs.
    """
    am_raw, phi, t, active = xs
    am_raw = am_raw.astype(jnp.int32)
    phi = phi.astype(jnp.int32)
    r = dict(regs)

    if prefiltered:
        am = am_raw
        fm = phi
    else:
        # ---- AM low-pass (ref src/baseband.c:161-163), int16
        # store-truncation
        am = (baseband.AM_LP_A1 * r["lp_y"]
              + baseband.AM_LP_B * (am_raw + r["lp_x"])) >> 14
        am = am.astype(jnp.int16).astype(jnp.int32)
        r["lp_y"], r["lp_x"] = am, am_raw

        # ---- FM low-pass (ref src/baseband.c:263-264). With FM demod
        # disabled the reference's fm buffer is a union alias of the raw
        # envelope scratch (dm_state buf.temp == buf.fm, ref
        # include/r_private.h), so the detector's fm_data IS the raw
        # envelope — reproduced by the caller passing phi = am_raw.
        if params.enable_fm:
            fm = (fm_alp1 * r["fm_y"]
                  + fm_blp * (phi + r["fm_phi_prev"])) >> 14
            fm = fm.astype(jnp.int16).astype(jnp.int32)
            r["fm_y"], r["fm_phi_prev"] = fm, phi
        else:
            fm = phi

    st = r["ook_state"]
    is_idle = st == ST_IDLE
    is_pulse = st == ST_PULSE
    is_gap_start = st == ST_GAP_START
    is_gap = st == ST_GAP

    # ---- threshold & hysteresis (ref src/pulse_detect.c:300-304)
    thr = _tdiv(r["low_est"] + jnp.minimum(r["high_est"], OOK_MAX_HIGH_LEVEL), 2)
    if params.ook_fixed_high_level != 0:
        thr = jnp.full_like(thr, params.ook_fixed_high_level)
    hyst = _tdiv(thr, 8)
    above = am > thr + hyst
    below = am < thr - hyst

    # ========== IDLE (ref :308-335) — the start/EWMA *application* is merged
    # with the EOP-reprocessing quirk at the end of the step; only the
    # conditions are computed here.
    start = is_idle & above & (r["lead_in"] > OOK_EST_LOW_RATIO)
    still_idle = is_idle & ~start

    # ========== PULSE (ref :336-375)
    p_len = r["plen"] + 1
    p_gap = is_pulse & below
    p_spur = p_len < PD_MIN_PULSE_SAMPLES
    p_spur_idle = p_gap & p_spur & (r["num"] <= 1)
    p_spur_eop = p_gap & p_spur & (r["num"] > 1)
    p_end = p_gap & ~p_spur
    p_cont = is_pulse & ~p_gap

    # still-pulse estimators (ref :361-365)
    new_high = r["high_est"] + _tdiv(am, OOK_EST_HIGH_RATIO) - \
        _tdiv(r["high_est"], OOK_EST_HIGH_RATIO)
    new_high = jnp.maximum(new_high, r["min_high"])
    r["high_est"] = jnp.where(p_cont, new_high, r["high_est"])
    new_ook_f1 = r["ook_f1"] + _tdiv(fm, OOK_EST_HIGH_RATIO) - \
        _tdiv(r["ook_f1"], OOK_EST_HIGH_RATIO)
    r["ook_f1"] = jnp.where(p_cont, new_ook_f1, r["ook_f1"])

    r["plen"] = jnp.where(is_pulse, p_len, r["plen"])
    r["eop_spur"] = jnp.where(p_spur_eop, 1, r["eop_spur"])
    # pulse -> gap_start commit into register (ref :352-356)
    r["cur_pulse"] = jnp.where(p_end, p_len, r["cur_pulse"])
    r["max_pulse"] = jnp.where(p_end, jnp.maximum(p_len, r["max_pulse"]),
                               r["max_pulse"])
    r["plen"] = jnp.where(p_end, 0, r["plen"])

    # ========== GAP_START (ref :376-421)
    gs_len = r["plen"] + 1
    gs_rejoin = is_gap_start & above
    gs_real = is_gap_start & ~above & (gs_len >= PD_MIN_PULSE_SAMPLES)
    r["plen"] = jnp.where(is_gap_start, gs_len, r["plen"])
    # spurious gap: restore pulse counter (ref :379-381)
    r["plen"] = jnp.where(gs_rejoin, gs_len + r["cur_pulse"], r["plen"])

    # FSK classification on real gap (ref :387-410)
    fsk_publish = gs_real & (r["fsk_num"] > PD_MIN_PULSES)

    # ========== GAP (ref :422-469)
    g_len = r["plen"] + 1
    r["plen"] = jnp.where(is_gap, g_len, r["plen"])
    g_new_pulse = is_gap & above
    # commit pair (cur_pulse, gap) at idx num (ref :426-427)
    commit_ook = g_new_pulse
    commit_ook_idx = r["num"]
    commit_ook_p = r["cur_pulse"]
    commit_ook_g = g_len
    num_after = jnp.where(g_new_pulse, r["num"] + 1, r["num"])
    g_maxp = g_new_pulse & (num_after >= params.max_pulses)  # EOP (ref :430-440)
    g_back_to_pulse = g_new_pulse & ~g_maxp
    r["plen"] = jnp.where(g_back_to_pulse, 0, r["plen"])
    r["cur_pulse"] = jnp.where(g_back_to_pulse, 0, r["cur_pulse"])
    r["num"] = num_after

    # EOP conditions (ref :447-450): the C code's `else if` — a sample that
    # starts a new pulse is never also an EOP check
    samples_per_ms = params.sample_rate // 1000
    cur_plen = r["plen"]
    g_eop_gap = is_gap & ~g_maxp & (
        (r["eop_spur"] > 0)
        | ((cur_plen > PD_MAX_GAP_RATIO * r["max_pulse"])
           & (cur_plen > PD_MIN_GAP_MS * samples_per_ms))
        | (cur_plen > PD_MAX_GAP_MS * samples_per_ms))
    # gap EOP writes a final pair (ref :451-452); max-pulses EOP does not
    commit_eop = g_eop_gap
    commit_eop_idx = r["num"]
    commit_eop_p = r["cur_pulse"]
    commit_eop_g = cur_plen
    ook_eop = g_maxp | g_eop_gap
    ook_final_num = jnp.where(g_eop_gap, r["num"] + 1, r["num"])

    # ========== FSK tracker (runs in PULSE and GAP_START while num==0;
    # skipped on the publish step since C returns early)
    # the reference runs the FSK sub-detector even with FM demod disabled
    # (on the aliased envelope buffer, see above)
    fsk_gate = (is_pulse | (is_gap_start & ~fsk_publish)) & (r["num"] == 0)
    if params.fsk_minmax:
        fsk_rec = _fsk_minmax(r, fm, fsk_gate)
    else:
        fsk_rec = _fsk_classic(r, fm, fsk_gate)

    # classic wrap_up on FSK publish (ref src/pulse_detect_fsk.c:143-156)
    wrap_valid = jnp.zeros_like(st, jnp.bool_)
    wrap_idx = jnp.zeros_like(st)
    wrap_p = jnp.zeros_like(st)
    wrap_g = jnp.zeros_like(st)
    fsk_final_num = r["fsk_num"]
    if not params.fsk_minmax:
        can_wrap = fsk_publish & (r["fsk_num"] < params.max_pulses)
        wlen = r["flen"] + 1
        at_fh = r["fsk_state"] == FSK_FH
        wrap_valid = can_wrap
        wrap_idx = r["fsk_num"]
        wrap_p = jnp.where(at_fh, wlen, r["fsk_cur_pulse"])
        wrap_g = jnp.where(at_fh, 0, wlen)
        fsk_final_num = jnp.where(can_wrap, r["fsk_num"] + 1, r["fsk_num"])

    # ========== state transitions
    new_st = st
    new_st = jnp.where(start, ST_PULSE, new_st)
    new_st = jnp.where(p_spur_idle, ST_IDLE, new_st)
    new_st = jnp.where(p_spur_eop, ST_GAP, new_st)
    new_st = jnp.where(p_end, ST_GAP_START, new_st)
    new_st = jnp.where(gs_rejoin, ST_PULSE, new_st)
    new_st = jnp.where(gs_real, ST_GAP, new_st)
    new_st = jnp.where(fsk_publish, ST_IDLE, new_st)
    new_st = jnp.where(g_back_to_pulse, ST_PULSE, new_st)
    new_st = jnp.where(ook_eop, ST_IDLE, new_st)
    r["ook_state"] = new_st
    r["eop_spur"] = jnp.where(ook_eop, 0, r["eop_spur"])

    # ========== ring write — the four record sources are mutually exclusive
    # by FSM state (OOK commit / EOP final pair in GAP; FSK commit in
    # PULSE/GAP_START while num==0; classic wrap_up only on FSK publish),
    # so a step emits at most ONE record.
    fsk_commit, fsk_commit_idx, fsk_commit_p, fsk_commit_g = fsk_rec
    rec_valid = commit_ook | commit_eop | fsk_commit | wrap_valid
    rec_idx = jnp.where(commit_ook, commit_ook_idx,
                        jnp.where(commit_eop, commit_eop_idx,
                                  jnp.where(fsk_commit, fsk_commit_idx,
                                            wrap_idx)))
    rec_p = jnp.where(commit_ook, commit_ook_p,
                      jnp.where(commit_eop, commit_eop_p,
                                jnp.where(fsk_commit, fsk_commit_p, wrap_p)))
    rec_g = jnp.where(commit_ook, commit_ook_g,
                      jnp.where(commit_eop, commit_eop_g,
                                jnp.where(fsk_commit, fsk_commit_g, wrap_g)))
    rec_fsk = fsk_commit | wrap_valid

    wpos = r["ring_wpos"]
    ovf = rec_valid & (wpos >= params.ring)
    w0 = jnp.minimum(wpos, params.ring - 1)
    val = rec_valid & ~ovf
    tag = 1 + rec_fsk.astype(jnp.int32) * 2 + (r["gen"] << 2)
    r["ring_idx"] = _onehot_write(r["ring_idx"], w0, rec_idx, val)
    r["ring_p"] = _onehot_write(r["ring_p"], w0, rec_p, val)
    r["ring_g"] = _onehot_write(r["ring_g"], w0, rec_g, val)
    r["ring_tag"] = _onehot_write(r["ring_tag"], w0, tag, val)
    r["ring_wpos"] = wpos + rec_valid.astype(jnp.int32)
    r["n_ring_ovf"] = r["n_ring_ovf"] + ovf.astype(jnp.int32)

    # EOP meta records
    eop_valid = ook_eop | fsk_publish
    eop_type = jnp.where(fsk_publish, PKG_FSK, PKG_OOK)
    eop_num = jnp.where(fsk_publish, fsk_final_num, ook_final_num)
    eop_f1 = jnp.where(fsk_publish, r["f1"], r["ook_f1"])
    eop_f2 = jnp.where(fsk_publish, r["f2"], 0)
    epos = r["eop_wpos"]
    e_ovf = eop_valid & (epos >= params.eops)
    we = jnp.minimum(epos, params.eops - 1)
    ev = eop_valid & ~e_ovf
    meta = jnp.stack([
        eop_type, eop_num, r["low_est"], r["high_est"], eop_f1, eop_f2,
        r["pkg_start"], t.astype(jnp.int32) * jnp.ones_like(st), r["gen"],
    ], axis=-1)  # [C, 9]
    E = params.eops
    slots = lax.broadcasted_iota(jnp.int32, (1, E), 1)
    emask = (slots == we[:, None]) & ev[:, None]
    r["eop_meta"] = jnp.where(emask[:, :, None], meta[:, None, :],
                              r["eop_meta"])
    r["eop_wpos"] = epos + eop_valid.astype(jnp.int32)
    r["n_pkg_drop"] = r["n_pkg_drop"] + e_ovf.astype(jnp.int32)

    # ---- merged IDLE application + EOP-sample reprocessing quirk.
    # The C while-loop returns on publish WITHOUT incrementing data_counter,
    # so the next call re-processes the publish sample in IDLE state (ref
    # src/pulse_detect.c:293-476: returns at :253,:410,:439,:468 skip the
    # increment at :475). Publishing channels therefore run the IDLE branch
    # on this same sample; since no earlier branch touches low/high/lead_in
    # for IDLE or publishing channels, one application serves both.
    repro = ook_eop | fsk_publish
    repro_start = repro & above & (r["lead_in"] > OOK_EST_LOW_RATIO)
    idle_mask = still_idle | (repro & ~repro_start)
    start_mask = start | repro_start

    low_delta = am - r["low_est"]
    new_low = r["low_est"] + _tdiv(low_delta, OOK_EST_LOW_RATIO) + \
        jnp.where(low_delta > 0, 1, -1)
    r["low_est"] = jnp.where(idle_mask, new_low, r["low_est"])
    r["high_est"] = jnp.where(
        idle_mask,
        jnp.maximum(params.ook_high_low_ratio * new_low, r["min_high"]),
        r["high_est"])
    r["lead_in"] = jnp.where(idle_mask & (r["lead_in"] <= OOK_EST_LOW_RATIO),
                             r["lead_in"] + 1, r["lead_in"])

    # package start: pulse_data_clear + pulse_detect_fsk_init equivalents
    # (ref :312-323, src/pulse_detect_fsk.c:26-32)
    zero = jnp.zeros_like(st)
    for name, init in (
            ("plen", zero), ("max_pulse", zero), ("num", zero),
            ("cur_pulse", zero), ("ook_f1", zero),
            ("pkg_start", t.astype(jnp.int32) * jnp.ones_like(st)),
            ("gen", r["gen"] + 1),
            ("fsk_state", jnp.full_like(st, FSK_INIT)),
            ("flen", zero), ("f1", zero), ("f2", zero),
            ("vmax", jnp.full_like(st, -32768)),
            ("vmin", jnp.full_like(st, 32767)),
            ("skip", jnp.full_like(st, 40)),
            ("fsk_num", zero), ("fsk_cur_pulse", zero)):
        r[name] = jnp.where(start_mask, init, r[name])
    r["ook_state"] = jnp.where(start_mask, ST_PULSE, r["ook_state"])

    if masked:
        # partial-block masking: freeze all step-written state past the
        # valid length so padded tail samples are no-ops (reference
        # processes exactly the bytes read; we pad to a chunk multiple).
        for k in r:
            if r[k] is not regs[k]:
                r[k] = jnp.where(active, r[k], regs[k])

    return r, ()


def _fsk_classic(r, fm, gate):
    """Classic dual-EWMA FSK tracker (ref src/pulse_detect_fsk.c:34-141).

    Mutates r's fsk fields in place (functionally); returns the commit record
    (valid, idx, pulse, gap). Rewinds are served from a 4-deep history of
    committed pairs; deeper chains are counted in n_fsk_ovf.
    """
    st = r["fsk_state"]
    f1, f2 = r["f1"], r["f2"]
    f1d = jnp.abs(fm - f1)
    f2d = jnp.abs(fm - f2)
    flen = r["flen"] + 1

    in_init = gate & (st == FSK_INIT)
    in_fh = gate & (st == FSK_FH)
    in_fl = gate & (st == FSK_FL)

    commit_valid = jnp.zeros_like(st, jnp.bool_)
    commit_idx = jnp.zeros_like(st)
    commit_p = jnp.zeros_like(st)
    commit_g = jnp.zeros_like(st)

    new_st, new_f1, new_f2 = st, f1, f2
    new_flen = jnp.where(gate, flen, r["flen"])
    new_num = r["fsk_num"]
    new_cur = r["fsk_cur_pulse"]
    hist_p, hist_g = r["hist_p"], r["hist_g"]

    # ---- INIT (ref :41-70)
    i_early = in_init & (flen < PD_MIN_PULSE_SAMPLES)
    i_delta = in_init & ~i_early & (f1d > FSK_DEFAULT_FM_DELTA // 2)
    i_gap_first = i_delta & (fm > f1)     # initial freq was low -> gap
    i_pulse_first = i_delta & ~(fm > f1)
    i_track = in_init & ~i_early & ~i_delta

    new_f1 = jnp.where(i_early, _tdiv(f1, 2) + _tdiv(fm, 2), new_f1)
    # gap-first: pulse[0]=0, gap[0]=len, num=1 (ref :49-57)
    new_st = jnp.where(i_gap_first, FSK_FH, new_st)
    new_f2 = jnp.where(i_gap_first, f1, new_f2)
    new_f1 = jnp.where(i_gap_first, fm, new_f1)
    commit_valid = commit_valid | i_gap_first
    commit_idx = jnp.where(i_gap_first, 0, commit_idx)
    commit_p = jnp.where(i_gap_first, 0, commit_p)
    commit_g = jnp.where(i_gap_first, flen, commit_g)
    new_num = jnp.where(i_gap_first, 1, new_num)
    new_flen = jnp.where(i_gap_first, 0, new_flen)
    # pulse-first (ref :59-64)
    new_st = jnp.where(i_pulse_first, FSK_FL, new_st)
    new_f2 = jnp.where(i_pulse_first, fm, new_f2)
    new_cur = jnp.where(i_pulse_first, flen, new_cur)
    new_flen = jnp.where(i_pulse_first, 0, new_flen)
    # fast tracking (ref :68)
    new_f1 = jnp.where(i_track, f1 + _tdiv(fm, FSK_EST_FAST) - _tdiv(f1, FSK_EST_FAST), new_f1)

    # ---- FH (ref :71-99)
    fh_switch = in_fh & (f1d > f2d)
    fh_store = fh_switch & (flen >= PD_MIN_PULSE_SAMPLES)
    fh_rewind = fh_switch & ~fh_store
    fh_track = in_fh & ~fh_switch

    new_st = jnp.where(fh_switch, FSK_FL, new_st)
    new_cur = jnp.where(fh_store, flen, new_cur)
    new_flen = jnp.where(fh_store, 0, new_flen)
    # rewind: restore last committed gap, pop history (ref :81-89)
    new_flen = jnp.where(fh_rewind, flen + hist_g[:, 0], new_flen)
    new_num = jnp.where(fh_rewind, new_num - 1, new_num)
    new_cur = jnp.where(fh_rewind, hist_p[:, 0], new_cur)
    back_init = fh_rewind & (new_num == 0) & (hist_p[:, 0] == 0)
    new_f1 = jnp.where(back_init, f2, new_f1)
    new_st = jnp.where(back_init, FSK_INIT, new_st)
    # pop
    hist_p = jnp.where(fh_rewind[:, None],
                       jnp.concatenate([hist_p[:, 1:], hist_p[:, -1:]], 1), hist_p)
    hist_g = jnp.where(fh_rewind[:, None],
                       jnp.concatenate([hist_g[:, 1:], hist_g[:, -1:]], 1), hist_g)
    # tracking (ref :92-98)
    fh_fast = fh_track & (fm > f1)
    new_f1 = jnp.where(fh_fast, f1 + _tdiv(fm, FSK_EST_FAST) - _tdiv(f1, FSK_EST_FAST), new_f1)
    new_f1 = jnp.where(fh_track & ~fh_fast,
                       f1 + _tdiv(fm, FSK_EST_SLOW) - _tdiv(f1, FSK_EST_SLOW), new_f1)

    # ---- FL (ref :100-134)
    fl_switch = in_fl & (f2d > f1d)
    fl_store = fl_switch & (flen >= PD_MIN_PULSE_SAMPLES)
    fl_rewind = fl_switch & ~fl_store
    fl_track = in_fl & ~fl_switch

    new_st = jnp.where(fl_switch, FSK_FH, new_st)
    # commit pair (ref :105-115)
    commit_valid = commit_valid | fl_store
    commit_idx = jnp.where(fl_store, r["fsk_num"], commit_idx)
    commit_p = jnp.where(fl_store, r["fsk_cur_pulse"], commit_p)
    commit_g = jnp.where(fl_store, flen, commit_g)
    new_num = jnp.where(fl_store, r["fsk_num"] + 1, new_num)
    new_flen = jnp.where(fl_store, 0, new_flen)
    # push history
    push = fl_store | i_gap_first
    push_p = jnp.where(i_gap_first, 0, r["fsk_cur_pulse"])
    push_g = flen
    hist_p = jnp.where(push[:, None],
                       jnp.concatenate([push_p[:, None], hist_p[:, :-1]], 1), hist_p)
    hist_g = jnp.where(push[:, None],
                       jnp.concatenate([push_g[:, None], hist_g[:, :-1]], 1), hist_g)
    # buffer-full workaround (pulse_data_shift) not modeled: saturate + count
    fsk_full = fl_store & (new_num >= PD_MAX_PULSES)
    new_num = jnp.where(fsk_full, PD_MAX_PULSES - 1, new_num)
    r["n_fsk_ovf"] = r["n_fsk_ovf"] + fsk_full.astype(jnp.int32)
    # rewind (ref :118-124)
    new_flen = jnp.where(fl_rewind, flen + r["fsk_cur_pulse"], new_flen)
    new_st = jnp.where(fl_rewind & (r["fsk_num"] == 0), FSK_INIT, new_st)
    # tracking (ref :127-133)
    fl_fast = fl_track & (fm < f2)
    new_f2 = jnp.where(fl_fast, f2 + _tdiv(fm, FSK_EST_FAST) - _tdiv(f2, FSK_EST_FAST), new_f2)
    new_f2 = jnp.where(fl_track & ~fl_fast,
                       f2 + _tdiv(fm, FSK_EST_SLOW) - _tdiv(f2, FSK_EST_SLOW), new_f2)

    r["fsk_state"] = new_st
    r["f1"], r["f2"] = new_f1, new_f2
    r["flen"] = new_flen
    r["fsk_num"] = new_num
    r["fsk_cur_pulse"] = new_cur
    r["hist_p"], r["hist_g"] = hist_p, hist_g
    return commit_valid, commit_idx, commit_p, commit_g


def _fsk_minmax(r, fm, gate):
    """Min/max tracker (ref src/pulse_detect_fsk.c:158-221)."""
    st = r["fsk_state"]
    active = gate & (r["skip"] == 0)
    r["skip"] = jnp.where(gate & (r["skip"] > 0), r["skip"] - 1, r["skip"])

    vmax = jnp.where(active, jnp.maximum(fm, r["vmax"]), r["vmax"])
    vmin = jnp.where(active, jnp.minimum(fm, r["vmin"]), r["vmin"])
    mid = _tdiv(vmax + vmin, 2)
    vmax = jnp.where(active & (fm > mid), vmax - 10, vmax)
    vmin = jnp.where(active & (fm < mid), vmin + 10, vmin)
    r["vmax"], r["vmin"] = vmax, vmin

    flen = jnp.where(active, r["flen"] + 1, r["flen"])

    in_init = active & (st == FSK_INIT)
    in_fh = active & (st == FSK_FH)
    in_fl = active & (st == FSK_FL)

    new_st = st
    new_st = jnp.where(in_init & (fm > mid), FSK_FH, new_st)
    new_st = jnp.where(in_init & (fm <= mid), FSK_FL, new_st)

    # FH -> FL: store pulse register (ref :187-192)
    fh_fall = in_fh & (fm < mid)
    new_st = jnp.where(fh_fall, FSK_FL, new_st)
    new_cur = jnp.where(fh_fall, flen, r["fsk_cur_pulse"])
    flen = jnp.where(fh_fall, 0, flen)
    new_f2 = jnp.where(in_fh, r["f2"] + _tdiv(fm, FSK_EST_SLOW) - _tdiv(r["f2"], FSK_EST_SLOW), r["f2"])

    # FL -> FH: commit pair (ref :194-208)
    fl_rise = in_fl & (fm > mid)
    new_st = jnp.where(fl_rise, FSK_FH, new_st)
    commit_valid = fl_rise
    commit_idx = r["fsk_num"]
    commit_p = new_cur
    commit_g = flen
    new_num = jnp.where(fl_rise, r["fsk_num"] + 1, r["fsk_num"])
    flen = jnp.where(fl_rise, 0, flen)
    fsk_full = fl_rise & (new_num >= PD_MAX_PULSES)
    new_num = jnp.where(fsk_full, PD_MAX_PULSES - 1, new_num)
    r["n_fsk_ovf"] = r["n_fsk_ovf"] + fsk_full.astype(jnp.int32)
    new_f1 = jnp.where(in_fl, r["f1"] + _tdiv(fm, FSK_EST_SLOW) - _tdiv(r["f1"], FSK_EST_SLOW), r["f1"])

    r["fsk_state"] = new_st
    r["flen"] = flen
    r["f1"], r["f2"] = new_f1, new_f2
    r["fsk_num"] = new_num
    r["fsk_cur_pulse"] = new_cur
    return commit_valid, commit_idx, commit_p, commit_g


# ---------------------------------------------------------------------------
# Block-level record log.
#
# The FSM commits at most one record per sample into a small per-chunk
# ring; the chunk scan EMITS each chunk's ring as a scan output (ys), so
# the stacked [n_chunks, C, R] log costs nothing to build (no carried
# buffers, no scatters in the loop). ONE end-of-block pass gather-compacts
# the log into a flat [arena] record list (ranks via cumsums — ring writes
# are front-compacted per chunk, so no sort is needed), dedups it
# (FSK-rewind recommits are near-adjacent on the compacted list: a
# shifted-compare keep-last suffices) and publishes via record->slot
# scatters of `arena` updates plus a carry rebuild — replacing the old
# per-chunk scatter drain (4.4 s/block signal-dense) and the round-2/3
# per-channel compaction whose scatters cost C*log_cap updates per block
# (~1.9 s/block at 4096 channels: the publish wall).
#
# Record key layout (int32; process_block segments blocks over 2^17
# samples so relgen < 2^16 always fits):
#   [ fsk | relgen | idx ]  with relgen = gen - gen_at_block_start.

_KEY_IDX_BITS = 12      # idx <= PD_MAX_PULSES < 2^12
_KEY_FSK_SHIFT = 1 << 29
_KEY_INVALID = 1 << 30
# Dedup window AFTER validity compaction: between a record and its
# FSK-rewind recommit only other *commits* can intervene (empty ring slots
# are compacted away), and the rewind history is 4 deep
# (ref src/pulse_detect_fsk.c:81-89 pops one of the last 4 pairs), so the
# same key can recur at distance <= 4. Window 8 = 2x margin. The window
# must NOT be applied to the raw ring log: a recommit can land hundreds of
# samples (many chunk boundaries = many empty slots) after the original.
_DEDUP_WINDOW = 8


def _max_block_samples():
    return 1 << 17


def _ring_keys(r, gen0):
    """Per-chunk ring -> record keys [C, R] (invalid slots get _KEY_INVALID)."""
    tag = r["ring_tag"]
    valid = (tag & 1) == 1
    fsk = (tag >> 1) & 1
    relgen = (tag >> 2) - gen0[:, None]
    key = fsk * _KEY_FSK_SHIFT + relgen * (1 << _KEY_IDX_BITS) + r["ring_idx"]
    return jnp.where(valid, key, _KEY_INVALID)


def _drain_block(params: DetectorParams, r, log_key, log_p, log_g, eop_log,
                 gen0):
    """End-of-block publish + carry rebuild (no per-chunk work).

    log_key/log_p/log_g: [C*R, G] record log — row c*R+i holds ring slot i
    of channel c, column g is the chunk-group (temporal order). This
    "ring-major rows, time-minor columns" layout keeps the big log tensors
    2-D with a large minor dimension: the natural [C, G, R] view has an
    8-wide minor dim that TPU tiling pads 16x (three 4 GB copies per block
    at 8192 channels — the round-5 OOM).
    eop_log: [C, Et, META_FIELDS] EOP metadata in temporal order.

    The log is compacted into a flat [arena] record list by GATHERS, not
    sorts/scatters: ring writes are front-compacted within each chunk's
    R-slot group (the one-hot write position starts at 0 every chunk), so
    every record's rank is computable from two exclusive cumsums (records
    per group, records per channel) — no argsort over the log, and the
    publish scatters shrink from C*S updates to `arena` updates. This is
    what lets the publish pass run at the record count (~1e4/block) instead
    of the log capacity (~3e7/block) — the round-2/3 "publish wall".
    """
    cap = params.pkg_cap
    mp = params.max_pulses
    gshift = 1 << _KEY_IDX_BITS
    R = params.ring
    CR, G = log_key.shape
    assert CR % R == 0
    C = CR // R
    F = params.arena

    # ---- record ranks from cumsums (no sort). Within a group, valid slots
    # occupy positions 0..w-1 in temporal order; groups are temporal too.
    valid = log_key < _KEY_INVALID                       # [C*R, G]
    w = jnp.sum(valid.reshape(C, R, G), axis=1,
                dtype=jnp.int32)                         # [C, G]
    gbase = jnp.cumsum(w, axis=1) - w                    # exclusive, [C, G]
    counts = gbase[:, -1] + w[:, -1]                     # [C]
    bases = jnp.cumsum(counts) - counts                  # exclusive, [C]
    total = bases[-1] + counts[-1]
    # arena overflow (>F records in one block, all channels) is counted AND
    # surfaced: api.push_block reads the delta per block and warns loudly
    r["n_ring_ovf"] = r["n_ring_ovf"].at[0].add(jnp.maximum(total - F, 0))

    # arena slot -> (channel, within-channel rank), identical either way
    j = jnp.arange(F, dtype=jnp.int32)
    ok_j = j < jnp.minimum(total, F)
    c_of = jnp.clip(jnp.searchsorted(bases, j, side="right").astype(
        jnp.int32) - 1, 0, C - 1)
    q = j - bases[c_of]

    def _arena_exact(_):
        """Direct binary search over all G ring groups of the raw log.

        Exact for any record distribution — this is the drain used whenever
        a channel publishes more than `chan_groups` non-empty groups (e.g.
        single-channel file replay), so the group cap can never drop a
        record. Slower on TPU at bench scale (gathers over the ~33M-element
        log) which is why the compacted path below exists.
        """
        gb_flat = gbase.reshape(-1)
        lo = jnp.zeros_like(j)
        hi = jnp.full_like(j, G - 1)
        for _ in range(max(1, (G - 1).bit_length())):
            mid = (lo + hi + 1) // 2
            le = gb_flat[c_of * G + mid] <= q
            lo = jnp.where(le, mid, lo)
            hi = jnp.where(le, hi, mid - 1)
        k_of = lo
        i_of = q - gb_flat[c_of * G + k_of]
        # log rows are (c*R + slot), columns are chunk-groups
        src = jnp.clip((c_of * R + i_of) * G + k_of, 0, CR * G - 1)
        return (jnp.where(ok_j, log_key.reshape(-1)[src], _KEY_INVALID),
                log_p.reshape(-1)[src], log_g.reshape(-1)[src])

    Kg = min(params.chan_groups, G)
    ne = w > 0                                           # [C, G]
    n_ne = jnp.sum(ne, axis=1, dtype=jnp.int32)          # [C]

    def _arena_compacted(_):
        """Per-channel GROUP compaction [C, G, R] -> [C, Kg, R] as a one-hot
        batched matmul on the MXU, then small gathers.

        Random gathers from the [C, S] log (~33M elements at bench scale)
        cost ~200 ms each on this TPU and per-row take_along_axis lowers
        pathologically, while an MXU pass over the same data is ~ms;
        compacting the (rare) non-empty ring groups first keeps every
        flat-arena gather on a small operand. Values are split into 8-bit
        bytes so the matmul is exact under ANY matmul precision (TPU lowers
        f32 dots to bf16 passes by default; bf16 represents integers <= 256
        exactly, and each output cell sums at most one product into an f32
        accumulator). Only taken when every channel fits in Kg groups (the
        cond predicate), so the cap cannot drop records.
        """
        grank = jnp.cumsum(ne.astype(jnp.int32), axis=1) - 1  # ne-grp rank
        onehot = ((grank[:, None, :]
                   == jnp.arange(Kg, dtype=jnp.int32)[None, :, None])
                  & ne[:, None, :]).astype(jnp.float32)      # [C, Kg, G]
        # operand layout keeps G minor (the logs are [C*R, G]): pieces are
        # [C, R, G] free reshapes, concatenated on the middle axis, and the
        # dot contracts over G — no padded [C, G, R] transposes appear
        pieces = []
        for plane in (log_key, log_p, log_g):
            pt = plane.reshape(C, R, G)
            for shift in (24, 16, 8, 0):
                pieces.append(((pt >> shift) & 0xFF).astype(jnp.float32))
        pieces.append(w[:, None, :].astype(jnp.float32))
        bytes_ = jnp.concatenate(pieces, axis=1)             # [C, 12R+1, G]
        cg = lax.dot_general(
            onehot, bytes_,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [C, Kg, 12R+1]
        cg = cg.astype(jnp.int32)
        # piece p of plane i sits at [ (i*4+p)*R, (i*4+p+1)*R )
        def _plane(i):
            b = i * 4 * R
            return ((cg[:, :, b:b + R] << 24)
                    | (cg[:, :, b + R:b + 2 * R] << 16)
                    | (cg[:, :, b + 2 * R:b + 3 * R] << 8)
                    | cg[:, :, b + 3 * R:b + 4 * R])         # [C, Kg, R]
        cg_rec = (_plane(0), _plane(1), _plane(2))
        kg_pad = jnp.arange(Kg, dtype=jnp.int32)[None, :] >= \
            jnp.minimum(n_ne, Kg)[:, None]
        cg_key = jnp.where(kg_pad[:, :, None], _KEY_INVALID, cg_rec[0])
        cg_w = jnp.where(kg_pad, 0, cg[:, :, 12 * R])        # [C, Kg]

        # ranks over the compacted groups (totals match the raw ranks:
        # every non-empty group was kept, so bases/q above stay valid)
        gbase2 = jnp.cumsum(cg_w, axis=1) - cg_w             # excl [C, Kg]
        gb_flat = gbase2.reshape(-1)
        lo = jnp.zeros_like(j)
        hi = jnp.full_like(j, Kg - 1)
        for _ in range(max(1, (Kg - 1).bit_length())):
            mid = (lo + hi + 1) // 2
            le = gb_flat[c_of * Kg + mid] <= q
            lo = jnp.where(le, mid, lo)
            hi = jnp.where(le, hi, mid - 1)
        k_of = lo
        i_of = q - gb_flat[c_of * Kg + k_of]
        src = jnp.clip((c_of * Kg + k_of) * R + i_of, 0, C * Kg * R - 1)
        return (jnp.where(ok_j, cg_key.reshape(-1)[src], _KEY_INVALID),
                cg_rec[1].reshape(-1)[src],
                cg_rec[2].reshape(-1)[src])

    if Kg >= G:
        # cap can't bind and the compaction would be an identity matmul
        a_key, a_p, a_g = _arena_exact(None)
    else:
        # the fast path is only valid when every channel's non-empty groups
        # fit under the cap; otherwise take the exact drain for this block
        a_key, a_p, a_g = lax.cond(jnp.max(n_ne) > Kg,
                                   _arena_exact, _arena_compacted, None)

    # keep-last dedup on the compacted arena (FSK-rewind recommits recur
    # within _DEDUP_WINDOW intervening commits; channel runs are contiguous
    # so a same-key match in another channel is excluded by comparing c_of)
    keep = a_key < _KEY_INVALID
    for d in range(1, _DEDUP_WINDOW + 1):
        nk = jnp.concatenate([a_key[d:], jnp.full((d,), -1, a_key.dtype)])
        nc = jnp.concatenate([c_of[d:], jnp.full((d,), -1, c_of.dtype)])
        keep = keep & ~((a_key == nk) & (c_of == nc))

    rec_fsk = (a_key // _KEY_FSK_SHIFT).astype(jnp.int32)
    rem = a_key - rec_fsk * _KEY_FSK_SHIFT
    rec_relg = rem // gshift
    rec_idx = rem - rec_relg * gshift

    # EOP -> output slot assignment (temporal order, capped at pkg_cap)
    et_valid = eop_log[:, :, M_TYPE] != PKG_NONE
    eop_ord = jnp.cumsum(et_valid.astype(jnp.int32), axis=1) - 1
    slot = r["out_n"][:, None] + eop_ord
    can = et_valid & (slot < cap)
    r["n_pkg_drop"] = r["n_pkg_drop"] + \
        jnp.sum(et_valid & ~can, axis=1).astype(jnp.int32)
    new_out_n = r["out_n"] + jnp.sum(et_valid, axis=1).astype(jnp.int32)

    # per-slot (side, relgen) tables + meta/fallback prefill
    has_tab = jnp.zeros((C, cap), bool)
    side_tab = jnp.zeros((C, cap), jnp.int32)
    relg_tab = jnp.full((C, cap), -1, jnp.int32)
    gen0k = gen0
    for s in range(cap):
        sel = can & (slot == s)
        has = jnp.any(sel, axis=1)
        e_idx = jnp.argmax(sel, axis=1)
        meta_row = jnp.take_along_axis(
            eop_log, e_idx[:, None, None].repeat(META_FIELDS, 2),
            axis=1)[:, 0]                                   # [C, F]
        side = (meta_row[:, M_TYPE] == PKG_FSK).astype(jnp.int32)
        relg = jnp.maximum(meta_row[:, M_GEN] - gen0k, 0)
        has_tab = has_tab.at[:, s].set(has)
        side_tab = side_tab.at[:, s].set(side)
        relg_tab = relg_tab.at[:, s].set(jnp.where(has, relg, -1))
        r["out_meta"] = r["out_meta"].at[:, s, :].set(
            jnp.where(has[:, None], meta_row, r["out_meta"][:, s, :]))
        # prefill the slot with the cross-block carry when the package
        # started before this block (relgen == 0), else zeros. Side has
        # two values, so this is a select — take_along_axis here lowered
        # to a ~60 ms gather per slot on TPU (round-4 micro-bench).
        side_c = (side == 1)[:, None]
        fb_p = jnp.where(side_c, r["carry_p"][:, 1], r["carry_p"][:, 0])
        fb_g = jnp.where(side_c, r["carry_g"][:, 1], r["carry_g"][:, 0])
        use_carry = (has & (relg == 0))[:, None]
        fb_p = jnp.where(use_carry, fb_p, 0)
        fb_g = jnp.where(use_carry, fb_g, 0)
        hasn = has[:, None]
        r["out_p"] = r["out_p"].at[:, s, :].set(
            jnp.where(hasn, fb_p, r["out_p"][:, s, :]))
        r["out_g"] = r["out_g"].at[:, s, :].set(
            jnp.where(hasn, fb_g, r["out_g"][:, s, :]))
    r["out_n"] = new_out_n

    # record -> slot mapping on the arena ([F, cap] compare — cap is tiny)
    match = (has_tab[c_of]
             & (side_tab[c_of] == rec_fsk[:, None])
             & (relg_tab[c_of] == rec_relg[:, None]))          # [F, cap]
    rec_slot = jnp.where(jnp.any(match, axis=1),
                         jnp.argmax(match, axis=1), cap)
    rec_slot = jnp.where(keep, rec_slot, cap)                 # OOB -> drop

    # carry rebuild: the still-open package's records (gen after the scan)
    rel_last = jnp.maximum(r["gen"] - gen0, 0)
    keep_carry = (rel_last == 0)[:, None, None]
    r["carry_p"] = jnp.where(keep_carry, r["carry_p"], 0)
    r["carry_g"] = jnp.where(keep_carry, r["carry_g"], 0)
    is_open = keep & (rec_relg == rel_last[c_of])
    carry_side = jnp.where(is_open, rec_fsk, 2)               # OOB -> drop

    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=(0, 1, 2),
        scatter_dims_to_operand_dims=(0, 1, 2))
    # deduped records have unique in-bounds targets; the unique promise
    # lets XLA vectorize the scatter instead of serializing updates
    scat = jnp.stack([jnp.where(keep, c_of, C), rec_slot, rec_idx], axis=-1)
    r["out_p"] = lax.scatter(r["out_p"], scat, a_p, dnums,
                             unique_indices=True,
                             mode=lax.GatherScatterMode.FILL_OR_DROP)
    r["out_g"] = lax.scatter(r["out_g"], scat, a_g, dnums,
                             unique_indices=True,
                             mode=lax.GatherScatterMode.FILL_OR_DROP)

    scat2 = jnp.stack([jnp.where(keep, c_of, C), carry_side, rec_idx],
                      axis=-1)
    r["carry_p"] = lax.scatter(r["carry_p"], scat2, a_p, dnums,
                               unique_indices=True,
                               mode=lax.GatherScatterMode.FILL_OR_DROP)
    r["carry_g"] = lax.scatter(r["carry_g"], scat2, a_g, dnums,
                               unique_indices=True,
                               mode=lax.GatherScatterMode.FILL_OR_DROP)
    return r


def _empty_ring(params: DetectorParams, C):
    R, E = params.ring, params.eops
    return {
        "ring_idx": jnp.zeros((C, R), jnp.int32),
        "ring_p": jnp.zeros((C, R), jnp.int32),
        "ring_g": jnp.zeros((C, R), jnp.int32),
        "ring_tag": jnp.zeros((C, R), jnp.int32),
        "ring_wpos": jnp.zeros((C,), jnp.int32),
        "eop_meta": jnp.zeros((C, E, META_FIELDS), jnp.int32),
        "eop_wpos": jnp.zeros((C,), jnp.int32),
    }


def _block_scan(params: DetectorParams, regs, iq, n_valid, gen0, t0=0):
    """Front-end (Pass A) + chunked FSM scan over one contiguous region.

    ``regs`` must contain the transient ring keys (:func:`_empty_ring`) and
    have the per-call resets already applied. ``t0`` is the absolute stream
    position of ``iq[:, 0]`` in the *block* coordinate frame: validity
    masking, record positions and ``pkg_start`` stamps all use
    ``t0 + local_index``, so a block may be evaluated as several contiguous
    regions (time-axis sharding, parallel/timeshard.py) whose chained
    results are bit-identical to one sequential evaluation. ``n_valid``
    stays in the block frame (global); ``gen0`` is the block-incoming
    package generation the ring keys are made relative to.

    Returns ``(regs, log_key, log_p, log_g, eop_log, avg_db)`` with logs in
    temporal order for this region.
    """
    C, N, _ = iq.shape
    assert N % params.chunk == 0, "region length must be a multiple of chunk"
    assert N <= _max_block_samples()  # int32 record keys (see segmentation)
    # local (region-frame) validity for the front-end kernels
    local_valid = None
    if n_valid is not None:
        local_valid = jnp.clip(n_valid - t0, 0, N)

    # Pass A: estimators + IIRs. The Pallas path fuses AM estimation, the
    # AM low-pass, the FM discriminator and the FM low-pass in one kernel
    # (ref src/r_flow.c:151-194 equivalents); the fallback computes the
    # elementwise parts here and the IIRs inside the scan step.
    prefiltered = bool(params.pallas_frontend)
    state = regs
    if prefiltered:
        from ..ops.frontend import frontend as _pallas_frontend
        am_raw, phi, state, avg_db = _pallas_frontend(
            iq, state, sample_rate=params.sample_rate,
            use_mag_est=params.use_mag_est, enable_fm=params.enable_fm,
            fm_low_pass=params.fm_low_pass, fsk_minmax=params.fsk_minmax,
            n_valid=local_valid, time_major=True)
        alp1, blp = 0, 0
    elif params.use_mag_est:
        am_raw, avg_db = baseband.magnitude_est_cu8(iq)
    else:
        am_raw, avg_db = baseband.envelope_detect_cu8(iq)

    if not prefiltered and params.enable_fm:
        phi, _, _ = baseband.fm_discriminate_cu8(iq, state["fm_xr"],
                                                 state["fm_xi"])
        # carry the last *valid* IQ sample for the next region's
        # discriminator (clipped to this region; a region with no valid
        # samples keeps the quirky index-0 read the sequential path has)
        if local_valid is None:
            last = N - 1
        else:
            last = jnp.clip(local_valid - 1, 0, N - 1)
        xr = iq[:, :, 0].astype(jnp.int32)[:, last] - 128
        xi = iq[:, :, 1].astype(jnp.int32)[:, last] - 128
        state = dict(state, fm_xr=xr, fm_xi=xi)
        alp1, blp = baseband.fm_coeffs(params.sample_rate, params.fm_low_pass,
                                       params.fsk_minmax)
    elif not prefiltered:
        # FM disabled: the detector sees the raw envelope (union-alias
        # behavior of the reference's buf.temp/buf.fm)
        phi = am_raw
        alp1, blp = 0, 0
    regs = state

    Ts = params.chunk
    U = params.unroll
    assert Ts % U == 0, "chunk must be a multiple of unroll"
    n_chunks = N // Ts
    # time-major [n_chunks, Ts/U, U, C] slices: the scan iterates Ts/U times
    # per chunk, each iteration processing U samples inline (amortizes the
    # TPU while-loop per-iteration overhead)
    if prefiltered:
        # the kernel already emitted time-major streams: pure reshape, no
        # transpose pass over HBM (the scan casts per-step slices to int32)
        am_x = am_raw.reshape(n_chunks, Ts // U, U, C)
        phi_x = phi.reshape(n_chunks, Ts // U, U, C)
    else:
        am_x = am_raw.astype(jnp.int32).swapaxes(0, 1).reshape(
            n_chunks, Ts // U, U, C)
        phi_x = phi.astype(jnp.int32).swapaxes(0, 1).reshape(
            n_chunks, Ts // U, U, C)
    t_x = t0 + jnp.arange(N, dtype=jnp.int32).reshape(n_chunks, Ts // U, U)

    # keys the per-sample FSM reads/writes; the big pulse/output/log
    # buffers are only touched by the append/end-of-block drain, and
    # keeping them out of the fast-path cond avoids copying them through
    # its branches every chunk
    drain_only_keys = ("carry_p", "carry_g", "out_p", "out_g", "out_meta",
                       "out_n")

    def fsm_scan(carry, am_c, phi_c, t_c):
        def step(rr, x):
            am_u, phi_u, t_u = x
            for u in range(U):
                act = None if n_valid is None else t_u[u] < n_valid
                rr, _ = _step(params, alp1, blp, rr,
                              (am_u[u], phi_u[u], t_u[u], act),
                              masked=n_valid is not None,
                              prefiltered=prefiltered)
            return rr, ()

        rr, _ = lax.scan(step, carry, (am_c, phi_c, t_c))
        return rr

    def emit_ring(carry):
        """Scan output: this chunk's records + EOP metas; reset the ring.

        Record planes are emitted FLAT [C*R] so the stacked log is a 2-D
        [G, C*R] tensor (large minor dim): the [G, C, R] form's 8-wide
        minor dim gets 16x tile padding when transposed for the drain."""
        ys = (_ring_keys(carry, gen0).reshape(-1),
              carry["ring_p"].reshape(-1), carry["ring_g"].reshape(-1),
              carry["eop_meta"])
        carry["ring_tag"] = jnp.zeros_like(carry["ring_tag"])
        carry["ring_wpos"] = jnp.zeros_like(carry["ring_wpos"])
        carry["eop_meta"] = jnp.zeros_like(carry["eop_meta"])
        carry["eop_wpos"] = jnp.zeros_like(carry["eop_wpos"])
        return carry, ys

    def full_chunk(carry, am_c, phi_c, t_c):
        small = {kk: v for kk, v in carry.items()
                 if kk not in drain_only_keys}
        small = fsm_scan(small, am_c, phi_c, t_c)
        carry = dict(carry, **small)
        return emit_ring(carry)

    def quiet_chunk(carry, am_c):
        """All-idle fast path: when every channel stays IDLE and below
        threshold for the whole chunk, the only live state is the noise
        EWMA (ref src/pulse_detect.c:326-333) — ~6 ops/sample instead of
        the full FSM. The caller proves the precondition with a
        conservative threshold lower bound, so this is bit-exact.
        """
        def step(low, am_u):
            for u in range(U):
                am = am_u[u].astype(jnp.int32)
                delta = am - low
                low = low + _tdiv(delta, OOK_EST_LOW_RATIO) + \
                    jnp.where(delta > 0, 1, -1)
            return low, ()

        low, _ = lax.scan(step, carry["low_est"], am_c)
        r = dict(carry)
        r["low_est"] = low
        # idle high_est tracks the final low (ref src/pulse_detect.c:331)
        r["high_est"] = jnp.maximum(params.ook_high_low_ratio * low,
                                    r["min_high"])
        # lead_in increments once per sample until it exceeds the ratio
        # (ref src/pulse_detect.c:333)
        room = jnp.maximum((OOK_EST_LOW_RATIO + 1) - r["lead_in"], 0)
        r["lead_in"] = r["lead_in"] + jnp.minimum(room, Ts)
        return r

    def chunk_body(carry, xs):
        am_c, phi_c, t_c = xs
        # The all-idle fast path needs the *filtered* am stream and kernel-
        # owned IIR carries, i.e. the Pallas front-end; the fallback path
        # computes the IIRs inside _step so every sample must run it.
        if n_valid is not None or not prefiltered:
            return full_chunk(carry, am_c, phi_c, t_c)
        # fast-path proof: all channels IDLE, and no sample can cross the
        # (conservatively lower-bounded) hysteresis threshold this chunk.
        # low_est never drops below min(low0, chunk min am) - 2 during an
        # all-idle chunk (EWMA overshoot is at most the +-1 nudge), and
        # idle high_est >= min_high_level, so thr >= (low_lb + high_lb)/2.
        am_i32 = am_c.astype(jnp.int32)
        am_max = jnp.max(am_i32, axis=(0, 1))
        am_min = jnp.min(am_i32, axis=(0, 1))
        all_idle = jnp.all(carry["ook_state"] == ST_IDLE)
        low_lb = jnp.minimum(carry["low_est"], am_min) - 2
        high_lb = jnp.minimum(carry["min_high"], OOK_MAX_HIGH_LEVEL)
        if params.ook_fixed_high_level != 0:
            thr_lb = jnp.full_like(low_lb, params.ook_fixed_high_level - 1)
        else:
            thr_lb = _tdiv(low_lb + high_lb, 2) - 1
        quiet = all_idle & jnp.all((am_max <= thr_lb) & (thr_lb >= 0))
        small = {kk: v for kk, v in carry.items()
                 if kk not in drain_only_keys}
        small = lax.cond(quiet,
                         lambda c: quiet_chunk(c, am_c),
                         lambda c: fsm_scan(c, am_c, phi_c, t_c),
                         small)
        carry = dict(carry, **small)
        return emit_ring(carry)

    regs, (ky, py, gy, ey) = lax.scan(chunk_body, regs, (am_x, phi_x, t_x))

    # stacked scan outputs -> record logs as clean 2-D transposes
    # [G, C*R] -> [C*R, G] (see _drain_block layout note)
    R, E = params.ring, params.eops
    log_key = ky.T
    log_p = py.T
    log_g = gy.T
    eop_log = jnp.swapaxes(ey, 0, 1).reshape(C, n_chunks * E, META_FIELDS)

    return regs, log_key, log_p, log_g, eop_log, avg_db


def process_block(params: DetectorParams, state, iq, n_valid=None,
                  flush: bool = False):
    """Process one IQ block for all channels; returns (state, packages).

    iq: uint8 [C, N, 2] (cu8). The pipeline is the device equivalent of
    push_sdr_flow (ref src/r_flow.c:104-372): AM estimation -> AM low-pass
    -> FM discrimination+low-pass -> pulse detection -> package publish.

    N must be a multiple of params.chunk; ``n_valid`` (traced scalar)
    marks the real sample count — padded tail samples are no-ops, so any
    padding value works and file tails match the reference exactly.

    Published packages are in state["out_*"]; callers fetch + reset via
    :func:`take_packages`.
    """
    C, N, _ = iq.shape
    assert N % params.chunk == 0, "block length must be a multiple of chunk"
    # n_valid=None is the streaming hot path: every sample is valid and the
    # per-step tail-masking ops are compiled out entirely.
    if n_valid is not None:
        n_valid = jnp.asarray(n_valid, jnp.int32)

    # segment very large blocks so record-log sort keys stay int32
    # (int32 record keys); state threads through, flush only on the last
    SEG = 1 << 17
    if N > SEG:
        assert N % SEG == 0 or N % params.chunk == 0
        avgs = []
        off = 0
        while off < N:
            seg_n = min(SEG, N - off)
            seg_valid = None
            if n_valid is not None:
                seg_valid = jnp.clip(n_valid - off, 0, seg_n)
            last = off + seg_n >= N
            state, avg_db = process_block(
                params, state, iq[:, off:off + seg_n], seg_valid,
                flush=flush and last)
            avgs.append(avg_db)
            off += seg_n
        return state, jnp.stack(avgs).mean(axis=0)

    # per-call resets (ref src/pulse_detect.c:283 and :291)
    regs = dict(state)
    regs["high_est"] = jnp.maximum(regs["high_est"], regs["min_high"])
    regs["eop_spur"] = jnp.zeros_like(regs["eop_spur"])
    # age package-start positions: previous block's starts become negative
    regs["pkg_start"] = regs["pkg_start"] - (N if n_valid is None else n_valid)
    regs.update(_empty_ring(params, C))

    gen0 = regs["gen"]
    regs, log_key, log_p, log_g, eop_log, avg_db = _block_scan(
        params, regs, iq, n_valid, gen0)

    if flush:
        regs, frow = _flush(params, regs, N if n_valid is None else n_valid,
                            gen0)
        # append the flush ring as one extra chunk-group column
        log_key = jnp.concatenate([log_key, frow[0].reshape(-1, 1)], axis=1)
        log_p = jnp.concatenate([log_p, frow[1].reshape(-1, 1)], axis=1)
        log_g = jnp.concatenate([log_g, frow[2].reshape(-1, 1)], axis=1)
        eop_log = jnp.concatenate([eop_log, frow[3]], axis=1)

    # skip the whole publish pass when the block produced no records and
    # no EOPs (the production noise case) — one cond per block
    has_work = jnp.any(log_key < _KEY_INVALID) | \
        jnp.any(eop_log[:, :, M_TYPE] != PKG_NONE)
    regs = lax.cond(
        has_work,
        lambda rr: _drain_block(params, rr, log_key, log_p, log_g, eop_log,
                                gen0),
        lambda rr: rr, regs)

    # drop transient ring keys from persistent state
    for k in _empty_ring(params, C):
        regs.pop(k)
    return regs, avg_db


def _flush(params: DetectorParams, r, N, gen0):
    """EOF flush (len==0 call, ref src/pulse_detect.c:203-278): finalize any
    partial package so file decodes match streaming decodes. Returns the
    flush record/EOP log rows to append to the block log."""
    st = r["ook_state"]
    C = st.shape[0]
    r = dict(r)
    for k, v in _empty_ring(params, C).items():
        r[k] = v

    in_pulse = st == ST_PULSE
    spur = in_pulse & (r["plen"] < PD_MIN_PULSE_SAMPLES)
    spur_idle = spur & (r["num"] <= 1)
    spur_gap = spur & (r["num"] > 1)
    p_ok = in_pulse & ~spur
    # store pulse width, fall through to GAP_START (ref :222-227);
    # the spurious-with-data path also falls through the GAP_START body
    cur_pulse = jnp.where(p_ok, r["plen"], r["cur_pulse"])
    eff_gap_start = (st == ST_GAP_START) | p_ok | spur_gap
    # FSK classification (ref :236-254)
    fsk_pub = eff_gap_start & (r["fsk_num"] > PD_MIN_PULSES)
    # classic wrap_up
    wrap_valid = jnp.zeros_like(st, jnp.bool_)
    wrap_p = jnp.zeros_like(st)
    wrap_g = jnp.zeros_like(st)
    fsk_final = r["fsk_num"]
    if not params.fsk_minmax:
        can = fsk_pub & (r["fsk_num"] < params.max_pulses)
        wlen = r["flen"] + 1
        at_fh = r["fsk_state"] == FSK_FH
        wrap_valid = can
        wrap_p = jnp.where(at_fh, wlen, r["fsk_cur_pulse"])
        wrap_g = jnp.where(at_fh, 0, wlen)
        fsk_final = jnp.where(can, r["fsk_num"] + 1, r["fsk_num"])
    # OOK fallthrough to GAP publish (ref :263-272)
    ook_pub = (eff_gap_start & ~fsk_pub) | (st == ST_GAP)
    ook_final = jnp.where(ook_pub, r["num"] + 1, r["num"])

    # ring records
    commit_valid = ook_pub | wrap_valid
    commit_idx = jnp.where(ook_pub, r["num"], r["fsk_num"])
    commit_p = jnp.where(ook_pub, cur_pulse, wrap_p)
    # note: in spurious_gap case C stores gap = pulse_length (the short pulse)
    commit_g = jnp.where(ook_pub, r["plen"], wrap_g)
    # GAP_START/PULSE fallthrough stores gap = pulse_length too; in the
    # GAP_START path pulse_length holds the running gap; in the PULSE path
    # it was just consumed as the pulse width and C stores pulse_length=0
    commit_g = jnp.where(p_ok & ~fsk_pub, 0, commit_g)
    commit_fsk = ~ook_pub & wrap_valid

    tag = jnp.where(commit_valid,
                    1 + commit_fsk.astype(jnp.int32) * 2 + (r["gen"] << 2), 0)
    r["ring_idx"] = r["ring_idx"].at[:, 0].set(commit_idx)
    r["ring_p"] = r["ring_p"].at[:, 0].set(commit_p)
    r["ring_g"] = r["ring_g"].at[:, 0].set(commit_g)
    r["ring_tag"] = r["ring_tag"].at[:, 0].set(tag)
    r["ring_wpos"] = commit_valid.astype(jnp.int32)

    pub = ook_pub | fsk_pub
    meta = jnp.stack([
        jnp.where(pub, jnp.where(fsk_pub, PKG_FSK, PKG_OOK), PKG_NONE),
        jnp.where(fsk_pub, fsk_final, ook_final),
        r["low_est"], r["high_est"],
        jnp.where(fsk_pub, r["f1"], r["ook_f1"]),
        jnp.where(fsk_pub, r["f2"], 0),
        r["pkg_start"], jnp.zeros_like(st) + N, r["gen"],
    ], axis=-1)
    r["eop_meta"] = r["eop_meta"].at[:, 0, :].set(meta)
    r["eop_wpos"] = pub.astype(jnp.int32)

    # return the FULL R-wide ring group (slots >= 1 are invalid-key padding)
    # so appending frow to the block log keeps it chunk-group aligned for
    # the drain's cumsum-rank compaction
    frow = (_ring_keys(r, gen0), r["ring_p"], r["ring_g"],
            r["eop_meta"][:, :1, :])
    r["ook_state"] = jnp.where(in_pulse | eff_gap_start | (st == ST_GAP) | spur_gap,
                               ST_IDLE, r["ook_state"])
    return r, frow


def compact_packages(state, cap: int):
    """Device-side package compaction: gather all published packages across
    channels into dense ``[cap, ...]`` arrays (jit-compatible, static cap).

    This replaces pulling the full ``[C, pkg_cap, max_pulses]`` buffers to
    the host (which at 8k+ channels dominates transfer time) with one small
    gather. Order matches :func:`take_packages` (channel-major, then slot).

    Returns dict(pulse[cap,P], gap[cap,P], meta[cap,F], channel[cap],
    count) — entries with channel == -1 are padding.
    """
    out_n, out_p, out_g, out_meta = (state["out_n"], state["out_p"],
                                     state["out_g"], state["out_meta"])
    C, S, P = out_p.shape
    slot_i = lax.broadcasted_iota(jnp.int32, (C, S), 1)
    valid = (slot_i < jnp.minimum(out_n, S)[:, None]).reshape(-1)
    # compaction as a one-hot MXU matmul, not a gather: advanced-index
    # gathers over the [C*S, P] buffers cost ~200 ms each on this TPU
    # (same pathology the drain works around — see _drain_block); the
    # matmul runs in ~ms. Exactness: each output cell receives exactly
    # one contribution (one-hot row), pulse/gap widths < 2^24 are exact
    # in f32, and HIGHEST precision keeps the dot in true f32. The meta
    # plane (sample offsets can exceed 2^24) goes through the same
    # byte-split trick as the drain.
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    keep = valid & (rank < cap)
    idx = jnp.nonzero(valid, size=cap, fill_value=-1)[0]
    safe = jnp.maximum(idx, 0)
    onehot = ((rank[None, :] == jnp.arange(cap, dtype=jnp.int32)[:, None])
              & keep[None, :]).astype(jnp.float32)          # [cap, C*S]
    pg = jnp.concatenate([out_p.reshape(C * S, P),
                          out_g.reshape(C * S, P)], axis=1).astype(
        jnp.float32)                                        # [C*S, 2P]
    pg_c = lax.dot_general(onehot, pg, (((1,), (0,)), ((), ())),
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
    pg_c = pg_c.astype(jnp.int32)
    pulse, gap = pg_c[:, :P], pg_c[:, P:]
    m32 = out_meta.reshape(C * S, META_FIELDS)
    mbytes = jnp.concatenate(
        [((m32 >> 24) & 0xFF).astype(jnp.float32),
         ((m32 >> 16) & 0xFF).astype(jnp.float32),
         ((m32 >> 8) & 0xFF).astype(jnp.float32),
         (m32 & 0xFF).astype(jnp.float32)], axis=1)         # [C*S, 4F]
    mc = lax.dot_general(onehot, mbytes, (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32).astype(
        jnp.int32)
    F = META_FIELDS
    meta = ((mc[:, :F] << 24) | (mc[:, F:2 * F] << 16)
            | (mc[:, 2 * F:3 * F] << 8) | mc[:, 3 * F:])
    channel = jnp.where(idx >= 0, safe // S, -1)
    count = jnp.sum(valid.astype(jnp.int32))
    return {"pulse": pulse, "gap": gap, "meta": meta, "channel": channel,
            "count": count}


def packages_from_compact(comp) -> list:
    """Host-side: turn a compact_packages result into take_packages dicts."""
    channel = np.asarray(comp["channel"])
    count = int(np.asarray(comp["count"]))
    pulse = np.asarray(comp["pulse"])
    gap = np.asarray(comp["gap"])
    meta = np.asarray(comp["meta"])
    pkgs = []
    for s in range(channel.shape[0]):
        c = int(channel[s])
        if c < 0:
            continue
        m = meta[s]
        num = int(m[M_NUM])
        pkgs.append({
            "channel": c,
            "type": int(m[M_TYPE]),
            "num_pulses": num,
            "pulse": pulse[s, :num].copy(),
            "gap": gap[s, :num].copy(),
            "ook_low_estimate": int(m[M_LOW]),
            "ook_high_estimate": int(m[M_HIGH]),
            "fsk_f1_est": int(m[M_F1]),
            "fsk_f2_est": int(m[M_F2]),
            "start": int(m[M_START]),
            "end": int(m[M_END]),
        })
    return pkgs, count


def take_packages(state):
    """Host-side: pull published packages out of the state and reset slots.

    Returns (list per channel of dicts, new_state).
    """
    out_n = np.asarray(state["out_n"])
    out_p = np.asarray(state["out_p"])
    out_g = np.asarray(state["out_g"])
    out_meta = np.asarray(state["out_meta"])
    cap = out_p.shape[1]
    pkgs = []
    for c in range(out_n.shape[0]):
        n = min(int(out_n[c]), cap)
        for s in range(n):
            m = out_meta[c, s]
            num = int(m[M_NUM])
            pkgs.append({
                "channel": c,
                "type": int(m[M_TYPE]),
                "num_pulses": num,
                "pulse": out_p[c, s, :num].copy(),
                "gap": out_g[c, s, :num].copy(),
                "ook_low_estimate": int(m[M_LOW]),
                "ook_high_estimate": int(m[M_HIGH]),
                "fsk_f1_est": int(m[M_F1]),
                "fsk_f2_est": int(m[M_F2]),
                "start": int(m[M_START]),
                "end": int(m[M_END]),
            })
    state = dict(state)
    state["out_n"] = jnp.zeros_like(state["out_n"])
    return pkgs, state
