"""Device-side pulse-slicing kernels: batched PPM / PWM classification.

The SURVEY §2 row-9 design point ("prefix-scan classification kernels"):
slice EVERY (package, spec) pair on the accelerator in one vmapped pass
instead of looping specs on the host. Classification is elementwise
(per-pulse width compares against the spec's windows); the only sequential
state is the tiny bitbuffer cursor (event, row, bit position), carried by
a `lax.scan` whose step processes the whole [B, S] lane grid at once —
1200 scan steps of VPU-width vector ops, no host round-trips. Bit packing
and per-row/per-event summaries are built afterwards with scatter-adds
(each bit's byte target is unique, so add == or).

Exactness contract: mirrors pulse/slicers.py ``slicer_ppm`` /
``slicer_pwm`` (themselves pinned on ref src/pulse_slicer.c:261-449)
statement for statement in the non-overflow regime; capacity overflows
(event/row/byte caps) raise the per-lane ``ovf`` flag instead of
reproducing the C buffer-saturation quirks — an integration must route
flagged lanes to the host slicer. Differential-fuzzed against the Python
slicers in tests/test_device_slice.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_BIG = 1 << 30


class SliceCaps(NamedTuple):
    events: int = 4       # events per (package, spec)
    rows: int = 16        # rows per event
    row_bytes: int = 20   # bytes per row


def ppm_bounds(devices, sample_rate: int):
    """Per-spec PPM windows [S] (mirrors pulse/slicers.py slicer_ppm)."""
    from ..pulse.slicers import _timings

    cols = {k: [] for k in ("zero_l", "zero_u", "one_l", "one_u",
                            "sync_l", "sync_u", "reset", "ok")}

    class _P:  # _timings reads only sample_rate
        pass

    p = _P()
    p.sample_rate = sample_rate
    for dev in devices:
        t = _timings(p, dev)
        if t is None:
            for k in cols:
                cols[k].append(0 if k != "ok" else False)
            continue
        s_short, s_long = t["short"], t["long"]
        s_gap, s_reset = t["gap"], t["reset"]
        s_sync, s_tol = t["sync"], t["tolerance"]
        sync_l = sync_u = 0
        if s_tol > 0:
            zero_l, zero_u = s_short - s_tol, s_short + s_tol
            one_l, one_u = s_long - s_tol, s_long + s_tol
            if s_sync > 0:
                sync_l, sync_u = s_sync - s_tol, s_sync + s_tol
        else:
            zero_l = 0
            zero_u = (s_short + s_long) // 2 + 1
            one_l = zero_u - 1
            one_u = s_gap if s_gap else s_reset
        for k, v in (("zero_l", zero_l), ("zero_u", zero_u),
                     ("one_l", one_l), ("one_u", one_u),
                     ("sync_l", sync_l), ("sync_u", sync_u),
                     ("reset", s_reset), ("ok", True)):
            cols[k].append(v)
    return {k: np.asarray(v, np.int32 if k != "ok" else bool)
            for k, v in cols.items()}


def pwm_bounds(devices, sample_rate: int):
    """Per-spec PWM windows [S] (mirrors pulse/slicers.py slicer_pwm)."""
    from ..pulse.slicers import _timings

    cols = {k: [] for k in ("one_l", "one_u", "zero_l", "zero_u",
                            "sync_l", "sync_u", "gap", "reset", "ok")}

    class _P:
        pass

    p = _P()
    p.sample_rate = sample_rate
    for dev in devices:
        t = _timings(p, dev)
        if t is None:
            for k in cols:
                cols[k].append(0 if k != "ok" else False)
            continue
        s_short, s_long, s_reset = t["short"], t["long"], t["reset"]
        s_gap, s_sync, s_tol = t["gap"], t["sync"], t["tolerance"]
        sync_l = sync_u = 0
        if s_tol > 0:
            one_l, one_u = s_short - s_tol, s_short + s_tol
            zero_l, zero_u = s_long - s_tol, s_long + s_tol
            if s_sync > 0:
                sync_l, sync_u = s_sync - s_tol, s_sync + s_tol
        elif s_sync <= 0:
            one_l, one_u = 0, (s_short + s_long) // 2 + 1
            zero_l, zero_u = one_u - 1, _BIG
        elif s_sync < s_short:
            sync_l, sync_u = 0, (s_sync + s_short) // 2 + 1
            one_l, one_u = sync_u - 1, (s_short + s_long) // 2 + 1
            zero_l, zero_u = one_u - 1, _BIG
        elif s_sync < s_long:
            one_l, one_u = 0, (s_short + s_sync) // 2 + 1
            sync_l, sync_u = one_u - 1, (s_sync + s_long) // 2 + 1
            zero_l, zero_u = sync_u - 1, _BIG
        else:
            one_l, one_u = 0, (s_short + s_long) // 2 + 1
            zero_l, zero_u = one_u - 1, (s_long + s_sync) // 2 + 1
            sync_l, sync_u = zero_u - 1, _BIG
        for k, v in (("one_l", one_l), ("one_u", one_u),
                     ("zero_l", zero_l), ("zero_u", zero_u),
                     ("sync_l", sync_l), ("sync_u", sync_u),
                     ("gap", s_gap), ("reset", s_reset), ("ok", True)):
            cols[k].append(v)
    return {k: np.asarray(v, np.int32 if k != "ok" else bool)
            for k, v in cols.items()}


def _lane_scatter_add(B, S, shape, idx_cols, vals, mask):
    """Masked scatter-add over the flattened B*S lane grid (the shared
    assembly primitive of every slicer kernel): prepends the lane
    coordinate, routes masked-out updates to an out-of-bounds index
    (FILL_OR_DROP discards them), and returns [B, S, *shape] int32 sums.
    idx_cols/vals/mask are [L, K] with L = B*S."""
    L = B * S
    lane = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[:, None],
                            mask.shape)
    tgt = [lane] + list(idx_cols)
    flat_shape = (L,) + shape
    out = jnp.zeros(flat_shape, jnp.int32)
    idx = jnp.stack([jnp.where(mask, c, _BIG) for c in tgt], axis=-1)
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=tuple(
            range(len(flat_shape))),
        scatter_dims_to_operand_dims=tuple(range(len(flat_shape))))
    out = lax.scatter_add(out, idx.reshape(-1, len(flat_shape)),
                          vals.reshape(-1), dnums,
                          mode=lax.GatherScatterMode.FILL_OR_DROP)
    return out.reshape((B, S) + shape)


def _assemble(ys, n_ev, ovf, caps: SliceCaps):
    """Scan outputs -> packed bitbuffers + summaries via scatter-adds."""
    E, R, BY = caps.events, caps.rows, caps.row_bytes
    (is_bit, bitval, b_ev, b_row, b_bir,
     is_sync, s_ev, s_row, is_flush, f_ev, f_rows) = ys
    # [N, B, S] -> flatten lane dims; one batched scatter per output
    N = is_bit.shape[0]
    B, S = is_bit.shape[1], is_bit.shape[2]

    def flat(x):
        return x.reshape(N, B * S).T          # [L, N]

    def scat(shape, idx_cols, vals, mask):
        return _lane_scatter_add(B, S, shape, idx_cols, vals, mask)

    m_bit = flat(is_bit)
    bytes_ = scat((E, R, BY),
                  [flat(b_ev), flat(b_row), flat(b_bir) // 8],
                  (flat(bitval) << (7 - flat(b_bir) % 8)), m_bit)
    bits_per_row = scat((E, R), [flat(b_ev), flat(b_row)],
                        jnp.ones_like(flat(b_bir)), m_bit)
    syncs = scat((E, R), [flat(s_ev), flat(s_row)],
                 jnp.ones_like(flat(s_ev)), flat(is_sync))
    num_rows = scat((E,), [flat(f_ev)], flat(f_rows), flat(is_flush))
    return {"bytes": bytes_.astype(jnp.uint8), "bits_per_row": bits_per_row,
            "syncs": syncs, "num_rows": num_rows, "n_events": n_ev,
            "ovf": ovf}


@functools.partial(jax.jit, static_argnames=("caps",))
def slice_ppm(pulse, gap, n_pulses, bounds, caps: SliceCaps = SliceCaps()):
    """Batched PPM slicing: pulse/gap [B, N], bounds dict of [S] arrays.

    Returns packed bitbuffers [B, S, E, R, BY] + per-row/event summaries.
    """
    B, N = pulse.shape
    S = bounds["reset"].shape[0]
    E, R, BY = caps.events, caps.rows, caps.row_bytes
    zl = bounds["zero_l"][None, :]
    zu = bounds["zero_u"][None, :]
    ol = bounds["one_l"][None, :]
    ou = bounds["one_u"][None, :]
    syl = bounds["sync_l"][None, :]
    syu = bounds["sync_u"][None, :]
    rst = bounds["reset"][None, :]
    okm = bounds["ok"][None, :]

    def step(carry, xs):
        ev, row, bir, frb, ovf = carry
        g, valid, last = xs                            # [B] each
        g = g[:, None]
        act = valid[:, None] & okm                     # [B, S]
        last = last[:, None]
        is0 = act & (zl < g) & (g < zu)
        is1 = act & ~is0 & (ol < g) & (g < ou)
        issy = act & ~is0 & ~is1 & (syl < g) & (g < syu)
        isrb = act & ~is0 & ~is1 & ~issy & (g < rst)
        isbit = is0 | is1
        # sync: row++ if current row has bits; sync count on the new row
        sy_row = jnp.where(bir > 0, row + 1, row)
        row2 = jnp.where(issy, sy_row, row)
        bir2 = jnp.where(issy & (bir > 0), 0, bir)
        # add_row
        row2 = jnp.where(isrb, row2 + 1, row2)
        bir2 = jnp.where(isrb, 0, bir2)
        # emit bit
        b_ev, b_row, b_bir = ev, row2, bir2
        bir3 = jnp.where(isbit, bir2 + 1, bir2)
        frb2 = jnp.where(isbit & (row2 == 0), frb + isbit, frb)
        # flush (the n == n_p-1 branch preempts everything else)
        flush = act & ((g >= rst) | last) & ((frb2 > 0) | (row2 > 0))
        f_rows = row2 + 1
        ev2 = jnp.where(flush, ev + 1, ev)
        row3 = jnp.where(flush, 0, row2)
        bir4 = jnp.where(flush, 0, bir3)
        frb3 = jnp.where(flush, 0, frb2)
        # overflow must be judged on PRE-flush cursors (the flush resets)
        ovf2 = ovf | (ev2 >= E) | (row2 >= R) | (bir3 >= BY * 8)
        ys = (isbit, is1.astype(jnp.int32), b_ev, b_row, b_bir,
              issy, ev, sy_row, flush, ev, f_rows)
        return (ev2, row3, bir4, frb3, ovf2), ys

    z = jnp.zeros((B, S), jnp.int32)
    iot = jnp.arange(N)[:, None]
    valid = iot < n_pulses[None, :]                          # [N, B]
    last = iot == (n_pulses[None, :] - 1)
    carry, ys = lax.scan(step, (z, z, z, z, jnp.zeros((B, S), bool)),
                         (gap.T.astype(jnp.int32), valid, last))
    ev_f, _row_f, _bir_f, _frb_f, ovf = carry
    return _assemble(ys, ev_f, ovf, SliceCaps(E, R, BY))


@functools.partial(jax.jit, static_argnames=("caps",))
def slice_pwm(pulse, gap, n_pulses, bounds, caps: SliceCaps = SliceCaps()):
    """Batched PWM slicing (mirrors pulse/slicers.py slicer_pwm)."""
    B, N = pulse.shape
    E, R, BY = caps.events, caps.rows, caps.row_bytes
    ol = bounds["one_l"][None, :]
    ou = bounds["one_u"][None, :]
    zl = bounds["zero_l"][None, :]
    zu = bounds["zero_u"][None, :]
    syl = bounds["sync_l"][None, :]
    syu = bounds["sync_u"][None, :]
    gp = bounds["gap"][None, :]
    rst = bounds["reset"][None, :]
    okm = bounds["ok"][None, :]

    def step(carry, xs):
        ev, row, bir, touched, ovf = carry
        p, g, valid, last = xs
        p = p[:, None]
        g = g[:, None]
        act = valid[:, None] & okm
        last = last[:, None]
        is1 = act & (ol < p) & (p < ou)
        is0 = act & ~is1 & (zl < p) & (p < zu)
        issy = act & ~is1 & ~is0 & (syl < p) & (p < syu)
        isspur = act & ~is1 & ~is0 & ~issy & (p <= ol)
        isrb = act & ~is1 & ~is0 & ~issy & ~isspur
        isbit = is1 | is0
        # add_sync: new row when the current row holds bits
        sy_row = jnp.where(bir > 0, row + 1, row)
        row2 = jnp.where(issy, sy_row, row)
        bir2 = jnp.where(issy & (bir > 0), 0, bir)
        # add_row (out-of-class pulse)
        row2 = jnp.where(isrb, row2 + 1, row2)
        bir2 = jnp.where(isrb, 0, bir2)
        # emit bit
        b_ev, b_row, b_bir = ev, row2, bir2
        bir3 = jnp.where(isbit, bir2 + 1, bir2)
        touched2 = touched | isbit | issy | isrb
        # gap logic: event flush (last pulse preempts), else gap row-break
        flush = act & ((g > rst) | last) & touched2
        f_rows = row2 + 1
        brk = act & ~flush & (gp > 0) & (g > gp) & touched2 & (bir3 > 0)
        ev2 = jnp.where(flush, ev + 1, ev)
        row3 = jnp.where(flush, 0, jnp.where(brk, row2 + 1, row2))
        bir4 = jnp.where(flush | brk, 0, bir3)
        touched3 = jnp.where(flush, False, touched2)
        # overflow must be judged on PRE-flush cursors (the flush resets)
        ovf2 = ovf | (ev2 >= E) | (jnp.maximum(row2, row3) >= R) \
            | (bir3 >= BY * 8)
        ys = (isbit, is1.astype(jnp.int32), b_ev, b_row, b_bir,
              issy, ev, sy_row, flush, ev, f_rows)
        return (ev2, row3, bir4, touched3, ovf2), ys

    z = jnp.zeros((B, bounds["reset"].shape[0]), jnp.int32)
    iot = jnp.arange(N)[:, None]
    valid = iot < n_pulses[None, :]                          # [N, B]
    last = iot == (n_pulses[None, :] - 1)
    carry, ys = lax.scan(
        step, (z, z, z, jnp.zeros_like(z, bool), jnp.zeros_like(z, bool)),
        (pulse.T.astype(jnp.int32), gap.T.astype(jnp.int32), valid, last))
    ev_f, _row_f, _bir_f, _touched_f, ovf = carry
    return _assemble(ys, ev_f, ovf, SliceCaps(E, R, BY))


# ---------------------------------------------------------------------------
# PCM (RZ / NRZ) — mirrors pulse/slicers.py slicer_pcm (ref pulse_slicer.c:68-259)
# ---------------------------------------------------------------------------

def pcm_bounds(devices, sample_rate: int):
    """Per-spec PCM parameters [S] (mirrors pulse/slicers.py slicer_pcm).

    Bit-rate seeds ``f0s``/``f0l`` are computed host-side in float64 and
    cast to float32; every in-kernel rounding site carries an uncertainty
    flag wide enough to cover the f32-vs-f64 gap, so unflagged lanes are
    bit-exact vs the host slicer.
    """
    from ..pulse.slicers import _timings

    cols = {k: [] for k in ("short", "long", "reset", "gap_limit", "tol",
                            "max_zeros", "min_count", "is_rz",
                            "f0s", "f0l", "ok")}

    class _P:
        pass

    p = _P()
    p.sample_rate = sample_rate
    spu = np.float32(sample_rate) / np.float32(1.0e6)
    for dev in devices:
        t = _timings(p, dev)
        if t is None:
            for k in cols:
                cols[k].append(False if k == "ok" else 0)
            continue
        s_short, s_long, s_reset = t["short"], t["long"], t["reset"]
        s_gap, s_tol = t["gap"], t["tolerance"]
        f0s = 1.0 / float(np.float32(dev.short_width) * spu) \
            if dev.short_width > 0 else 0.0
        f0l = 1.0 / float(np.float32(dev.long_width) * spu) \
            if dev.long_width > 0 else 0.0
        gap_limit = s_gap if s_gap else s_reset
        max_zeros = gap_limit // s_long if s_long else 0
        if s_tol <= 0:
            s_tol = s_long // 4
        for k, v in (("short", s_short), ("long", s_long),
                     ("reset", s_reset), ("gap_limit", gap_limit),
                     ("tol", s_tol), ("max_zeros", max_zeros),
                     ("min_count", 12 if s_short == s_long else 4),
                     ("is_rz", s_short != s_long),
                     ("f0s", f0s), ("f0l", f0l), ("ok", True)):
            cols[k].append(v)
    out = {}
    for k, v in cols.items():
        if k in ("f0s", "f0l"):
            out[k] = np.asarray(v, np.float32)
        elif k in ("is_rz", "ok"):
            out[k] = np.asarray(v, bool)
        else:
            out[k] = np.asarray(v, np.int32)
    return out


def _trunc05(v):
    """int(v + 0.5) with Python trunc-toward-zero, plus a boundary flag
    wide enough to absorb float32-vs-float64 evaluation differences."""
    x = v + jnp.float32(0.5)
    n = jnp.trunc(x).astype(jnp.int32)
    eps = jnp.float32(1e-6) + jnp.abs(x) * jnp.float32(2e-6)
    near = jnp.abs(x - jnp.round(x)) < eps
    return n, near


def _pcm_rates(pulse, gap, n_pulses, bounds):
    """Pass 1: preamble bit-rate re-estimation -> per-lane f_short/f_long.

    Mirrors slicer_pcm's four estimators exactly: RZ preamble runs
    (constant windows), NRZ preamble runs (condition uses the *running*
    f estimate, so it lives in the scan carry), then the RZ/NRZ
    anywhere-in-stream fallbacks (order-free masked sums).
    """
    B, N = pulse.shape
    S = bounds["short"].shape[0]
    sh = bounds["short"][None, :]
    lo = bounds["long"][None, :]
    tol = bounds["tol"][None, :]
    is_rz = bounds["is_rz"][None, :]
    mc0 = bounds["min_count"][None, :]
    f0s = jnp.broadcast_to(bounds["f0s"][None, :], (B, S))
    f0l = jnp.broadcast_to(bounds["f0l"][None, :], (B, S))

    z = jnp.zeros((B, S), jnp.int32)
    zb = jnp.zeros((B, S), bool)

    def eval_run(cnt, sw, lw, mc, fs, fl, plen):
        """Run ended: accept when count >= running min_count."""
        acc = cnt >= mc
        cntf = cnt.astype(jnp.float32)
        # RZ: f_long = count/lwidth, f_short = count/swidth
        fs_rz = jnp.where(sw > 0, cntf / sw.astype(jnp.float32), fs)
        fl_rz = jnp.where(lw > 0, cntf / lw.astype(jnp.float32), fl)
        # NRZ: f_short = f_long = count/width (width in sw, count doubled)
        f_nrz = jnp.where(sw > 0, cntf / sw.astype(jnp.float32), fs)
        fs2 = jnp.where(acc, jnp.where(is_rz, fs_rz, f_nrz), fs)
        fl2 = jnp.where(acc, jnp.where(is_rz, fl_rz, f_nrz), fl)
        mc2 = jnp.where(acc, cnt, mc)
        plen2 = jnp.where(acc, cnt, plen)
        return mc2, fs2, fl2, plen2

    def step(carry, xs):
        cnt, sw, lw, mc, fs, fl, plen, prev_c, flag = carry
        p, g, valid = xs
        p = p[:, None].astype(jnp.int32)
        g = g[:, None].astype(jnp.int32)
        vm = valid[:, None]
        # run-membership condition under the *current* carry estimate
        c_rz = ((p >= sh - tol) & (p <= sh + tol)
                & (p + g >= lo - tol) & (p + g <= lo + tol))
        hp, near_p = _trunc05(p.astype(jnp.float32) * fs)
        hg, near_g = _trunc05(g.astype(jnp.float32) * fl)
        c_nrz = (hp == 1) & (hg == 1)
        c = vm & jnp.where(is_rz, c_rz, c_nrz)
        # a boundary flip only matters where it can toggle the ==1 test
        flag = flag | (vm & ~is_rz & ((near_p & (hp <= 2))
                                      | (near_g & (hg <= 2))))
        # a run that just ended (prev pulse in, this one out) is evaluated
        # before this pulse is consumed — matching the Python consume-one
        ended = prev_c & ~c
        mc, fs, fl, plen = jax.tree.map(
            lambda a, b: jnp.where(ended, a, b),
            eval_run(cnt, sw, lw, mc, fs, fl, plen),
            (mc, fs, fl, plen))
        # accumulate or reset
        d_sw = jnp.where(is_rz, p, p + g)     # NRZ width = p+g
        d_lw = p + g
        d_cnt = jnp.where(is_rz, 1, 2)
        cnt = jnp.where(c, cnt + d_cnt, 0)
        sw = jnp.where(c, sw + d_sw, 0)
        lw = jnp.where(c, lw + d_lw, 0)
        return (cnt, sw, lw, mc, fs, fl, plen, c, flag), None

    iot = jnp.arange(N)[:, None]
    valid = iot < n_pulses[None, :]
    carry0 = (z, z, z, jnp.broadcast_to(mc0, (B, S)), f0s, f0l, z, zb, zb)
    (cnt, sw, lw, mc, fs, fl, plen, _prev, flag), _ = lax.scan(
        step, carry0, (pulse.T, gap.T, valid))
    # trailing run
    mc, fs, fl, plen = jax.tree.map(
        lambda a, b: jnp.where(cnt > 0, a, b),
        eval_run(cnt, sw, lw, mc, fs, fl, plen), (mc, fs, fl, plen))

    # fallbacks (anywhere-in-stream, order-free)
    p3 = pulse[:, :, None].astype(jnp.int32)
    g3 = gap[:, :, None].astype(jnp.int32)
    vm3 = (jnp.arange(N)[None, :, None] < n_pulses[:, None, None])
    c_rz3 = vm3 & ((p3 >= sh[:, None] - tol[:, None])
                   & (p3 <= sh[:, None] + tol[:, None])
                   & (p3 + g3 >= lo[:, None] - tol[:, None])
                   & (p3 + g3 <= lo[:, None] + tol[:, None]))
    rzc = jnp.sum(c_rz3, axis=1)
    rzs = jnp.sum(jnp.where(c_rz3, p3, 0), axis=1)
    rzl = jnp.sum(jnp.where(c_rz3, p3 + g3, 0), axis=1)
    use_rzfb = is_rz & (plen == 0) & (rzc > 8)
    fs = jnp.where(use_rzfb, rzc / jnp.maximum(rzs, 1).astype(jnp.float32),
                   fs)
    fl = jnp.where(use_rzfb, rzc / jnp.maximum(rzl, 1).astype(jnp.float32),
                   fl)
    # NRZ fallback: four independent windows, each pulse/gap may add twice
    w1 = vm3 & (p3 >= sh[:, None] - tol[:, None]) \
        & (p3 <= sh[:, None] + tol[:, None])
    w2 = vm3 & (p3 >= 2 * sh[:, None] - tol[:, None]) \
        & (p3 <= 2 * sh[:, None] + tol[:, None])
    w3 = vm3 & (g3 >= lo[:, None] - tol[:, None]) \
        & (g3 <= lo[:, None] + tol[:, None])
    w4 = vm3 & (g3 >= 2 * lo[:, None] - tol[:, None]) \
        & (g3 <= 2 * lo[:, None] + tol[:, None])
    nw = (jnp.sum(jnp.where(w1, p3, 0), axis=1)
          + jnp.sum(jnp.where(w2, p3, 0), axis=1)
          + jnp.sum(jnp.where(w3, g3, 0), axis=1)
          + jnp.sum(jnp.where(w4, g3, 0), axis=1))
    nc = (jnp.sum(w1, axis=1) + 2 * jnp.sum(w2, axis=1)
          + jnp.sum(w3, axis=1) + 2 * jnp.sum(w4, axis=1))
    use_nrzfb = ~is_rz & (plen == 0) & (nc > 20)
    fnrz = nc / jnp.maximum(nw, 1).astype(jnp.float32)
    fs = jnp.where(use_nrzfb, fnrz, fs)
    fl = jnp.where(use_nrzfb, fnrz, fl)
    return fs, fl, flag


@functools.partial(jax.jit, static_argnames=("caps",))
def slice_pcm(pulse, gap, n_pulses, bounds, caps: SliceCaps = SliceCaps()):
    """Batched PCM slicing: pulse/gap [B, N], bounds dict of [S] arrays.

    Variable bits-per-pulse (``highs`` ones then ``lows`` zeros) are
    emitted as run descriptors and assembled into packed bytes with a
    delta-scatter + cumulative-sum pass; ``bitbuffer_clear`` semantics are
    handled by tagging every run with a segment id and keeping only runs
    whose segment matches the one recorded at event flush. Lanes whose
    float32 rounding lands near a boundary (vs the host's float64) raise
    ``ovf`` and must be delegated to the host slicer.
    """
    B, N = pulse.shape
    S = bounds["short"].shape[0]
    E, R, BY = caps.events, caps.rows, caps.row_bytes
    BITS = BY * 8

    fs, fl, fflag = _pcm_rates(pulse, gap, n_pulses, bounds)

    sh = bounds["short"][None, :]
    lo = bounds["long"][None, :]
    rst = bounds["reset"][None, :]
    gpl = bounds["gap_limit"][None, :]
    tol = bounds["tol"][None, :]
    mz = bounds["max_zeros"][None, :]
    is_rz = bounds["is_rz"][None, :]
    okm = bounds["ok"][None, :]

    def step(carry, xs):
        ev, row, bir, frb, seg, ovf = carry
        p, g, valid, last = xs
        p = p[:, None].astype(jnp.int32)
        g = g[:, None].astype(jnp.int32)
        act = valid[:, None] & okm
        last = last[:, None]
        h, near_h = _trunc05(p.astype(jnp.float32) * fs)
        l0, near_l = _trunc05((g + sh - lo).astype(jnp.float32) * fl)
        # a lows flip above the max_zeros clamp changes nothing
        near_l = near_l & (l0 <= mz + 1)
        h = jnp.where(act, jnp.maximum(h, 0), 0)
        l = jnp.where(act, jnp.clip(l0, 0, mz), 0)
        ovf2 = ovf | (act & (near_h | near_l))
        # bits appended at the current cursor
        b_ev, b_row, b_start = ev, row, bir
        bir2 = bir + h + l
        frb2 = jnp.where(row == 0, frb + h + l, frb)
        # clear (RZ out-of-class pulse) beats gap row-break
        do_clear = act & is_rz & (jnp.abs(p - sh) > tol)
        do_break = act & ~do_clear & (g > gpl) & (g <= rst)
        seg2 = jnp.where(do_clear, seg + 1, seg)
        row2 = jnp.where(do_clear, 0, jnp.where(do_break, row + 1, row))
        bir3 = jnp.where(do_clear | do_break, 0, bir2)
        frb3 = jnp.where(do_clear, 0, frb2)
        # flush (post-clear state, matching the Python statement order)
        flush = act & ((g > rst) | last) & ((frb3 > 0) | (row2 > 0))
        f_rows = row2 + 1
        ev2 = jnp.where(flush, ev + 1, ev)
        row3 = jnp.where(flush, 0, row2)
        bir4 = jnp.where(flush, 0, bir3)
        frb4 = jnp.where(flush, 0, frb3)
        seg3 = jnp.where(flush, 0, seg2)
        ovf3 = ovf2 | (ev2 >= E) | (jnp.maximum(row2, row) >= R) \
            | (bir2 >= BITS)
        ys = (h, l, b_ev, b_row, b_start, seg, flush, ev, f_rows)
        return (ev2, row3, bir4, frb4, seg3, ovf3), ys

    z = jnp.zeros((B, S), jnp.int32)
    iot = jnp.arange(N)[:, None]
    valid = iot < n_pulses[None, :]
    last = iot == (n_pulses[None, :] - 1)
    carry, ys = lax.scan(
        step, (z, z, z, z, z, jnp.zeros((B, S), bool)),
        (pulse.T, gap.T, valid, last))
    ev_f, _r, _b, _f, _s, ovf = carry
    ovf = ovf | fflag
    (h, l, b_ev, b_row, b_start, seg, flush, f_ev, f_rows) = ys

    # ---- assembly ----
    L = B * S

    def flat(x):
        return x.reshape(N, L).T                          # [L, N]

    lane = jnp.arange(L, dtype=jnp.int32)[:, None].repeat(N, 1)

    def scat_add(shape, idx_cols, vals, mask):
        return _lane_scatter_add(B, S, shape, idx_cols, vals, mask)

    m_flush = flat(flush)
    # final segment id per (lane, event); -1 for never-flushed events
    fseg = scat_add((E,), [flat(f_ev)], flat(seg) + 1, m_flush) - 1
    fseg_flat = fseg.reshape(L, E)
    # per-pulse validity: its segment must be the flushed one
    ev_l, seg_l = flat(b_ev), flat(seg)
    sel = jnp.take_along_axis(fseg_flat, jnp.clip(ev_l, 0, E - 1), axis=1)
    live = (seg_l == sel) & (ev_l < E)
    m_bits = live & (flat(h) + flat(l) > 0)
    # ones runs -> +1/-1 deltas -> cumsum -> packed bytes
    hl, sl = flat(h), flat(b_start)
    m_ones = live & (hl > 0)
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=(0, 1, 2, 3),
        scatter_dims_to_operand_dims=(0, 1, 2, 3))
    delta = jnp.zeros((L, E, R, BITS + 1), jnp.int8)
    idx_a = jnp.stack([jnp.where(m_ones, c, _BIG) for c in
                       (lane, ev_l, flat(b_row), jnp.clip(sl, 0, BITS))],
                      axis=-1)
    idx_b = jnp.stack([jnp.where(m_ones, c, _BIG) for c in
                       (lane, ev_l, flat(b_row),
                        jnp.clip(sl + hl, 0, BITS))], axis=-1)
    ones_v = jnp.ones((L * N,), jnp.int8)
    delta = lax.scatter_add(delta, idx_a.reshape(-1, 4), ones_v, dn,
                            mode=lax.GatherScatterMode.FILL_OR_DROP)
    delta = lax.scatter_add(delta, idx_b.reshape(-1, 4), -ones_v, dn,
                            mode=lax.GatherScatterMode.FILL_OR_DROP)
    ind = (jnp.cumsum(delta, axis=-1,
                      dtype=jnp.int8)[..., :BITS] > 0).astype(jnp.uint8)
    w = (jnp.uint8(1) << (7 - jnp.arange(8, dtype=jnp.uint8)))
    bytes_ = (ind.reshape(L, E, R, BY, 8) * w).sum(-1).astype(jnp.uint8)
    bytes_ = bytes_.reshape(B, S, E, R, BY)

    bits_per_row = scat_add((E, R), [ev_l, flat(b_row)],
                            flat(h) + flat(l), m_bits)
    num_rows = scat_add((E,), [flat(f_ev)], flat(f_rows), m_flush)
    syncs = jnp.zeros((B, S, E, R), jnp.int32)
    return {"bytes": bytes_, "bits_per_row": bits_per_row, "syncs": syncs,
            "num_rows": num_rows, "n_events": ev_f, "ovf": ovf}


# ---------------------------------------------------------------------------
# Manchester zerobit — mirrors pulse/slicers.py slicer_manchester_zerobit
# (ref src/pulse_slicer.c:451-527)
# ---------------------------------------------------------------------------

def _timing_cols(devices, sample_rate: int, fields):
    """Shared per-spec timing-column builder: ``fields`` maps a column
    name to a callable over the resolved _timings dict; specs whose
    timings don't resolve get 0/False and ok=False."""
    from ..pulse.slicers import _timings

    class _P:
        pass

    p = _P()
    p.sample_rate = sample_rate
    ts = [_timings(p, dev) for dev in devices]
    out = {"ok": np.asarray([t is not None for t in ts], bool)}
    for k, fn in fields.items():
        vals = [fn(t) for t in ts if t is not None]
        isbool = bool(vals) and isinstance(vals[0], (bool, np.bool_))
        full = [fn(t) if t is not None else (False if isbool else 0)
                for t in ts]
        out[k] = np.asarray(full, bool if isbool else np.int32)
    return out


def mc_bounds(devices, sample_rate: int):
    """Per-spec MC-zerobit windows [S]. All comparisons are integer
    (`x > 1.5*s` is evaluated as `2x > 3s`), so the kernel is exact with
    no float-boundary fallback."""
    return _timing_cols(devices, sample_rate, {
        "short": lambda t: t["short"], "reset": lambda t: t["reset"],
        "tol": lambda t: t["tolerance"],
        "has_tol": lambda t: bool(t["tolerance"] > 0)})


@functools.partial(jax.jit, static_argnames=("caps",))
def slice_mc(pulse, gap, n_pulses, bounds, caps: SliceCaps = SliceCaps()):
    """Batched Manchester-zerobit slicing: pulse/gap [B, N].

    Every buffer starts with a hardcoded 0 bit; up to three bits are
    emitted per pulse (sync-resync 1, post-row 0, mid-bit 1/0), modeled as
    three masked emission channels concatenated for one scatter pass.
    """
    B, N = pulse.shape
    S = bounds["short"].shape[0]
    E, R, BY = caps.events, caps.rows, caps.row_bytes
    BITS = BY * 8
    sh = bounds["short"][None, :]
    rst = bounds["reset"][None, :]
    tol = bounds["tol"][None, :]
    has_tol = bounds["has_tol"][None, :]
    okm = bounds["ok"][None, :]

    def step(carry, xs):
        ev, row, bir, tsl, ovf = carry
        p, g, valid, last = xs
        p = p[:, None].astype(jnp.int32)
        g = g[:, None].astype(jnp.int32)
        act = valid[:, None] & okm
        last = last[:, None]
        out = act & has_tol & ((p < sh - tol) | (p > 2 * sh + tol)
                               | (g < sh - tol) | (g > 2 * sh + tol))
        # channel 1: a 1 bit at the current cursor — either the resync
        # long-pulse 1 or the in-class mid-bit 1
        c1_out = out & (2 * p > 3 * sh) & (p <= 2 * sh + tol)
        c1_mid = act & ~out & (2 * (p + tsl) > 3 * sh)
        c1 = c1_out | c1_mid
        e1_ev, e1_row, e1_bir = ev, row, bir
        bir2 = jnp.where(c1, bir + 1, bir)
        # row break + leading 0 of the new row (channel 2)
        row2 = jnp.where(out, row + 1, row)
        c2 = out
        e2_ev, e2_row = ev, row2
        bir3 = jnp.where(out, 1, bir2)
        tsl2 = jnp.where(out | c1_mid, 0, tsl + p)
        # gap side: flush, else mid-bit 0 (channel 3)
        flush = act & ((g > rst) | last)
        f_rows = row2 + 1
        c3 = act & ~flush & (2 * (g + tsl2) > 3 * sh)
        e3_ev, e3_row, e3_bir = ev, row2, bir3
        bir4 = jnp.where(c3, bir3 + 1, bir3)
        tsl3 = jnp.where(flush | c3, 0, tsl2 + g)
        # flush: next event starts with the hardcoded 0 (channel 4: counts
        # toward bits_per_row only — the bit value is 0)
        ev2 = jnp.where(flush, ev + 1, ev)
        row3 = jnp.where(flush, 0, row2)
        bir5 = jnp.where(flush, 1, bir4)
        ovf2 = ovf | (row2 >= R) | (bir4 > BITS) | (jnp.maximum(bir2, 1) > BITS) \
            | (flush & (ev2 >= E))
        ys = (c1, e1_ev, e1_row, e1_bir,
              c2, e2_ev, e2_row,
              c3, e3_ev, e3_row, e3_bir,
              flush, ev, f_rows, ev2)
        return (ev2, row3, bir5, tsl3, ovf2), ys

    z = jnp.zeros((B, S), jnp.int32)
    one = jnp.ones((B, S), jnp.int32)
    iot = jnp.arange(N)[:, None]
    valid = iot < n_pulses[None, :]
    last = iot == (n_pulses[None, :] - 1)
    carry, ys = lax.scan(
        step, (z, z, one, z, jnp.zeros((B, S), bool)),
        (pulse.T, gap.T, valid, last))
    ev_f, _row, _bir, _tsl, ovf = carry
    (c1, e1e, e1r, e1b, c2, e2e, e2r, c3, e3e, e3r, e3b,
     flush, f_ev, f_rows, ev_after) = ys

    L = B * S

    def flat(x):
        return x.reshape(N, L).T

    def cat(*xs):
        return jnp.concatenate([flat(x) for x in xs], axis=1)  # [L, kN]

    def scat(shape, idx_cols, vals, mask):
        return _lane_scatter_add(B, S, shape, idx_cols, vals, mask)

    zero_n = jnp.zeros_like(e1b)
    m_all = cat(c1, c2, c3, flush)            # flush slot = next ev's lead 0
    ev_all = cat(e1e, e2e, e3e, ev_after)
    row_all = cat(e1r, e2r, e3r, jnp.zeros_like(e1r))
    bir_all = cat(e1b, zero_n, e3b, jnp.zeros_like(e1b))
    ones_all = jnp.ones_like(ev_all)
    bits_per_row = scat((E, R), [ev_all, row_all], ones_all, m_all)
    # event 0's hardcoded leading 0
    lead = jnp.zeros((B, S, E, R), jnp.int32)
    lead = lead.at[:, :, 0, 0].set(jnp.where(okm, 1, 0))
    bits_per_row = bits_per_row + lead
    # byte content: only channel-1 bits are ones
    m1 = flat(c1)
    bytes_ = scat((E, R, BY), [flat(e1e), flat(e1r), flat(e1b) // 8],
                  (jnp.ones_like(m1, jnp.int32) << (7 - flat(e1b) % 8)),
                  m1)
    num_rows = scat((E,), [flat(f_ev)], flat(f_rows), flat(flush))
    syncs = jnp.zeros((B, S, E, R), jnp.int32)
    return {"bytes": bytes_.astype(jnp.uint8), "bits_per_row": bits_per_row,
            "syncs": syncs, "num_rows": num_rows, "n_events": ev_f,
            "ovf": ovf}


# ---------------------------------------------------------------------------
# Differential Manchester — mirrors pulse/slicers.py slicer_dmc
# (ref src/pulse_slicer.c:537-595)
# ---------------------------------------------------------------------------

def dmc_bounds(devices, sample_rate: int):
    """Per-spec DMC windows [S]; all comparisons are integer-exact."""
    return _timing_cols(devices, sample_rate, {
        "short": lambda t: t["short"], "long": lambda t: t["long"],
        "reset": lambda t: t["reset"], "tol": lambda t: t["tolerance"]})


@functools.partial(jax.jit, static_argnames=("caps",))
def slice_dmc(pulse, gap, n_pulses, bounds, caps: SliceCaps = SliceCaps()):
    """Batched differential-Manchester slicing over the interleaved
    pulse/gap SYMBOL axis (2N scan steps).

    The host slicer's data-dependent stride (a short symbol consumes its
    second half, possibly rewinding on a reset) is modeled by a carried
    ``pending`` flag: the step after an emitted 1 either swallows an
    in-tolerance second half, row-breaks on a mistimed one, or falls
    through to normal processing when the symbol is a reset.
    """
    B, N = pulse.shape
    S = bounds["short"].shape[0]
    E, R, BY = caps.events, caps.rows, caps.row_bytes
    sh = bounds["short"][None, :]
    lo = bounds["long"][None, :]
    rst = bounds["reset"][None, :]
    tol = bounds["tol"][None, :]
    okm = bounds["ok"][None, :]

    def step(carry, xs):
        ev, row, bir, pend, has, ovf = carry
        sym, valid = xs
        sym = sym[:, None].astype(jnp.int32)
        act = valid[:, None] & okm
        # (the host's synthetic 0 symbol after a final half-consumed short
        # only mutates the dropped unfinished buffer — unobservable)
        d_short = jnp.abs(sym - sh)
        in_short = d_short < tol
        in_long = jnp.abs(sym - lo) < tol
        is_rst = sym >= rst - tol
        row_has = jnp.where(bir > 0, True, False)
        # pending second-half resolution; the host consumes the symbol
        # unless strictly OUT of tolerance (`> tol`, pulse_slicer.c:560)
        mist = d_short > tol
        p_consume = act & pend & ~mist
        p_fall = act & pend & mist & is_rst
        p_break = act & pend & mist & ~is_rst & row_has
        p_done = act & pend & mist & ~is_rst & ~row_has
        # normal processing (incl. fall-through from a pending reset)
        norm = act & (~pend | p_fall)
        n_one = norm & in_short
        n_zero = norm & ~in_short & in_long
        n_flush = norm & ~in_short & ~in_long & is_rst & has
        # emit bit (1 on n_one, 0 on n_zero) at the current cursor
        isbit = n_one | n_zero
        b_ev, b_row, b_bir = ev, row, bir
        bir2 = jnp.where(isbit, bir + 1, bir)
        has2 = has | isbit
        # row break from a mistimed second half
        row2 = jnp.where(p_break, row + 1, row)
        bir3 = jnp.where(p_break, 0, bir2)
        # flush
        f_rows = row2 + 1
        ev2 = jnp.where(n_flush, ev + 1, ev)
        row3 = jnp.where(n_flush, 0, row2)
        bir4 = jnp.where(n_flush, 0, bir3)
        has3 = jnp.where(n_flush, False, has2)
        pend2 = act & n_one
        pend2 = jnp.where(p_consume | p_break | p_done, False, pend2)
        ovf2 = ovf | (row2 >= R) | (bir2 > BY * 8) | (n_flush & (ev2 >= E))
        ys = (isbit, n_one.astype(jnp.int32), b_ev, b_row, b_bir,
              jnp.zeros_like(n_one), ev, row, n_flush, ev, f_rows)
        return (ev2, row3, bir4, pend2, has3, ovf2), ys

    # interleave pulse/gap into the symbol axis [2N, B]
    sym = jnp.stack([pulse.T, gap.T], axis=1).reshape(2 * N, B)
    iot = jnp.arange(2 * N)[:, None]
    valid = iot < (2 * n_pulses)[None, :]
    z = jnp.zeros((B, S), jnp.int32)
    zb = jnp.zeros((B, S), bool)
    carry, ys = lax.scan(step, (z, z, z, zb, zb, zb), (sym, valid))
    ev_f, _r, _b, _p, _h, ovf = carry
    return _assemble(ys, ev_f, ovf, SliceCaps(E, R, BY))


# ---------------------------------------------------------------------------
# PIWM differential-coding — mirrors pulse/slicers.py slicer_piwm_dc
# (ref src/pulse_slicer.c:659-713)
# ---------------------------------------------------------------------------

def piwm_dc_bounds(devices, sample_rate: int):
    """Per-spec PIWM-DC windows [S]; all comparisons are integer-exact."""
    return _timing_cols(devices, sample_rate, {
        "short": lambda t: t["short"], "long": lambda t: t["long"],
        "reset": lambda t: t["reset"], "tol": lambda t: t["tolerance"]})


@functools.partial(jax.jit, static_argnames=("caps",))
def slice_piwm_dc(pulse, gap, n_pulses, bounds,
                  caps: SliceCaps = SliceCaps()):
    """Batched PIWM-DC slicing over the interleaved pulse/gap symbol axis.

    Each in-tolerance symbol is one bit (short=1, long=0); a sub-reset
    out-of-class symbol row-breaks a non-empty row; a super-reset symbol
    (or the final symbol) flushes the event when anything was buffered.
    """
    B, N = pulse.shape
    E, R, BY = caps.events, caps.rows, caps.row_bytes
    sh = bounds["short"][None, :]
    lo = bounds["long"][None, :]
    rst = bounds["reset"][None, :]
    tol = bounds["tol"][None, :]
    okm = bounds["ok"][None, :]

    def step(carry, xs):
        ev, row, bir, touched, ovf = carry
        sym, valid, last = xs
        sym = sym[:, None].astype(jnp.int32)
        act = valid[:, None] & okm
        last = last[:, None]
        in1 = act & (jnp.abs(sym - sh) < tol)
        in0 = act & ~in1 & (jnp.abs(sym - lo) < tol)
        isrb = act & ~in1 & ~in0 & (sym < rst) & touched & (bir > 0)
        isbit = in1 | in0
        b_ev, b_row, b_bir = ev, row, bir
        bir2 = jnp.where(isbit, bir + 1, bir)
        touched2 = touched | isbit
        row2 = jnp.where(isrb, row + 1, row)
        bir3 = jnp.where(isrb, 0, bir2)
        flush = act & ((sym > rst) | last) & touched2
        f_rows = row2 + 1
        ev2 = jnp.where(flush, ev + 1, ev)
        row3 = jnp.where(flush, 0, row2)
        bir4 = jnp.where(flush, 0, bir3)
        touched3 = jnp.where(flush, False, touched2)
        ovf2 = ovf | (row2 >= R) | (bir2 > BY * 8) | (flush & (ev2 >= E))
        ys = (isbit, in1.astype(jnp.int32), b_ev, b_row, b_bir,
              jnp.zeros_like(in1), ev, row, flush, ev, f_rows)
        return (ev2, row3, bir4, touched3, ovf2), ys

    sym = jnp.stack([pulse.T, gap.T], axis=1).reshape(2 * N, B)
    iot = jnp.arange(2 * N)[:, None]
    valid = iot < (2 * n_pulses)[None, :]
    last = iot == (2 * n_pulses - 1)[None, :]
    z = jnp.zeros((B, sh.shape[1]), jnp.int32)
    zb = jnp.zeros_like(z, bool)
    carry, ys = lax.scan(step, (z, z, z, zb, zb), (sym, valid, last))
    ev_f, _r, _b, _t, ovf = carry
    return _assemble(ys, ev_f, ovf, SliceCaps(E, R, BY))


# ---------------------------------------------------------------------------
# NRZS / RZI — run-emitting single-row slicers
# (ref src/pulse_slicer.c:715-759, :866-918)
# ---------------------------------------------------------------------------

def _assemble_runs(B, S, N, caps: SliceCaps, ones_n, zeros_n, b_ev, b_start,
                   flush, f_ev, f_rows, ev_f, ovf):
    """Shared assembly for slicers that only ever write row 0: per-step
    runs of ``ones_n`` 1-bits at ``b_start`` followed by ``zeros_n``
    0-bits, packed via the same delta-scatter + cumsum trick as PCM."""
    E, R, BY = caps.events, caps.rows, caps.row_bytes
    BITS = BY * 8
    L = B * S

    def flat(x):
        return x.reshape(N, L).T                          # [L, N]

    lane = jnp.arange(L, dtype=jnp.int32)[:, None].repeat(N, 1)

    def scat_add(shape, idx_cols, vals, mask):
        return _lane_scatter_add(B, S, shape, idx_cols, vals, mask)

    hl, sl, ev_l = flat(ones_n), flat(b_start), flat(b_ev)
    m_ones = hl > 0
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=(0, 1, 2),
        scatter_dims_to_operand_dims=(0, 1, 2))
    delta = jnp.zeros((L, E, BITS + 1), jnp.int8)
    idx_a = jnp.stack([jnp.where(m_ones, c, _BIG) for c in
                       (lane, ev_l, jnp.clip(sl, 0, BITS))], axis=-1)
    idx_b = jnp.stack([jnp.where(m_ones, c, _BIG) for c in
                       (lane, ev_l, jnp.clip(sl + hl, 0, BITS))], axis=-1)
    ones_v = jnp.ones((L * N,), jnp.int8)
    delta = lax.scatter_add(delta, idx_a.reshape(-1, 3), ones_v, dn,
                            mode=lax.GatherScatterMode.FILL_OR_DROP)
    delta = lax.scatter_add(delta, idx_b.reshape(-1, 3), -ones_v, dn,
                            mode=lax.GatherScatterMode.FILL_OR_DROP)
    ind = (jnp.cumsum(delta, axis=-1,
                      dtype=jnp.int8)[..., :BITS] > 0).astype(jnp.uint8)
    w = (jnp.uint8(1) << (7 - jnp.arange(8, dtype=jnp.uint8)))
    row0 = (ind.reshape(L, E, BY, 8) * w).sum(-1).astype(jnp.uint8)
    bytes_ = jnp.zeros((B, S, E, R, BY), jnp.uint8)
    bytes_ = bytes_.at[:, :, :, 0, :].set(row0.reshape(B, S, E, BY))

    zl = flat(zeros_n)
    bpr0 = scat_add((E,), [ev_l], hl + zl, hl + zl > 0)
    bits_per_row = jnp.zeros((B, S, E, R), jnp.int32)
    bits_per_row = bits_per_row.at[:, :, :, 0].set(bpr0)
    num_rows = scat_add((E,), [flat(f_ev)], flat(f_rows), flat(flush))
    syncs = jnp.zeros((B, S, E, R), jnp.int32)
    return {"bytes": bytes_, "bits_per_row": bits_per_row, "syncs": syncs,
            "num_rows": num_rows, "n_events": ev_f, "ovf": ovf}


def nrzs_bounds(devices, sample_rate: int):
    """Per-spec NRZS parameters [S]; integer-exact. A non-positive
    resolved bit limit is flagged not-ok (mirroring rzi_bounds' s_long
    guard): the kernel's guarded division would otherwise emit p//1 ones
    per pulse, overflow, and drop the lane to the host slicer_nrzs which
    divides by zero."""
    cols = _timing_cols(devices, sample_rate, {
        "short": lambda t: t["short"], "reset": lambda t: t["reset"]})
    cols["ok"] = cols["ok"] & (cols["short"] > 0)
    return cols


@functools.partial(jax.jit, static_argnames=("caps",))
def slice_nrzs(pulse, gap, n_pulses, bounds, caps: SliceCaps = SliceCaps()):
    """Batched NRZS slicing: a pulse longer than the bit limit emits
    ``pulse // limit`` ones then a zero; a shorter pulse one zero; an
    exact-limit pulse nothing. Every reset gap (or the final pulse)
    flushes an event — including empty ones, matching the host slicer."""
    B, N = pulse.shape
    E, R, BY = caps.events, caps.rows, caps.row_bytes
    BITS = BY * 8
    sh = bounds["short"][None, :]
    rst = bounds["reset"][None, :]
    okm = bounds["ok"][None, :]

    def step(carry, xs):
        ev, bir, ovf = carry
        p, g, valid, last = xs
        p = p[:, None].astype(jnp.int32)
        g = g[:, None].astype(jnp.int32)
        act = valid[:, None] & okm
        last = last[:, None]
        h = jnp.where(act & (p > sh), p // jnp.maximum(sh, 1), 0)
        z = jnp.where(act & (p != sh), 1, 0)
        b_ev, b_start = ev, bir
        bir2 = bir + h + z
        flush = act & ((g >= rst) | last)
        f_rows = jnp.where(bir2 > 0, 1, 0)
        ev2 = jnp.where(flush, ev + 1, ev)
        bir3 = jnp.where(flush, 0, bir2)
        ovf2 = ovf | (bir2 > BITS) | (flush & (ev2 >= E))
        ys = (h, z, b_ev, b_start, flush, ev, f_rows)
        return (ev2, bir3, ovf2), ys

    z0 = jnp.zeros((B, sh.shape[1]), jnp.int32)
    iot = jnp.arange(N)[:, None]
    valid = iot < n_pulses[None, :]
    last = iot == (n_pulses[None, :] - 1)
    carry, ys = lax.scan(step, (z0, z0, jnp.zeros_like(z0, bool)),
                         (pulse.T, gap.T, valid, last))
    ev_f, _b, ovf = carry
    (h, zz, b_ev, b_start, flush, f_ev, f_rows) = ys
    return _assemble_runs(B, sh.shape[1], N, SliceCaps(E, R, BY),
                          h, zz, b_ev, b_start, flush, f_ev, f_rows,
                          ev_f, ovf)


def rzi_bounds(devices, sample_rate: int):
    """Per-spec RZI parameters [S] (mirrors pulse/slicers.py slicer_rzi,
    which bypasses _timings: zero-width check is per present field only)."""
    cols = {k: [] for k in ("short", "long", "reset", "base", "ok")}
    spu = np.float32(sample_rate) / np.float32(1.0e6)
    for dev in devices:
        s_short = int(np.float32(dev.short_width) * spu)
        s_long = int(np.float32(dev.long_width) * spu)
        s_reset = int(np.float32(dev.reset_limit) * spu)
        bad = ((dev.short_width > 0 and s_short <= 0)
               or (dev.long_width > 0 and s_long <= 0)
               or (dev.reset_limit > 0 and s_reset <= 0)
               or s_long <= 0)
        for k, v in (("short", s_short), ("long", s_long),
                     ("reset", s_reset), ("base", s_long - s_short),
                     ("ok", not bad)):
            cols[k].append(v)
    return {k: np.asarray(v, bool if k == "ok" else np.int32)
            for k, v in cols.items()}


@functools.partial(jax.jit, static_argnames=("caps",))
def slice_rzi(pulse, gap, n_pulses, bounds, caps: SliceCaps = SliceCaps()):
    """Batched RZI slicing: each pulse emits ``round(high / long)`` ones
    (the first pulse of a message without the base offset), each sub-reset
    gap a zero; a reset gap or the final pulse flushes non-empty events."""
    B, N = pulse.shape
    E, R, BY = caps.events, caps.rows, caps.row_bytes
    BITS = BY * 8
    lo = bounds["long"][None, :]
    rst = bounds["reset"][None, :]
    base = bounds["base"][None, :]
    okm = bounds["ok"][None, :]

    def step(carry, xs):
        ev, bir, at_start, ovf = carry
        p, g, valid, last = xs
        p = p[:, None].astype(jnp.int32)
        g = g[:, None].astype(jnp.int32)
        act = valid[:, None] & okm
        last = last[:, None]
        num = jnp.where(at_start, p + lo // 2, p - base + lo // 2)
        ones = jnp.where(act, jnp.maximum(num // jnp.maximum(lo, 1), 0), 0)
        b_ev, b_start = ev, bir
        bir2 = bir + ones
        flush = act & ((g > rst) | last)
        emitted = flush & (bir2 > 0)
        zz = jnp.where(act & ~flush, 1, 0)
        bir3 = jnp.where(flush, 0, bir2 + zz)
        ev2 = jnp.where(emitted, ev + 1, ev)
        at_start2 = jnp.where(act, flush, at_start)
        f_rows = jnp.ones_like(ev)
        ovf2 = ovf | (bir2 + zz > BITS) | (emitted & (ev2 >= E))
        ys = (ones, zz, b_ev, b_start, emitted, ev, f_rows)
        return (ev2, bir3, at_start2, ovf2), ys

    z0 = jnp.zeros((B, lo.shape[1]), jnp.int32)
    iot = jnp.arange(N)[:, None]
    valid = iot < n_pulses[None, :]
    last = iot == (n_pulses[None, :] - 1)
    carry, ys = lax.scan(
        step, (z0, z0, jnp.ones_like(z0, bool), jnp.zeros_like(z0, bool)),
        (pulse.T, gap.T, valid, last))
    ev_f, _b, _a, ovf = carry
    (ones, zz, b_ev, b_start, emitted, f_ev, f_rows) = ys
    return _assemble_runs(B, lo.shape[1], N, SliceCaps(E, R, BY),
                          ones, zz, b_ev, b_start, emitted, f_ev, f_rows,
                          ev_f, ovf)


# ---------------------------------------------------------------------------
# Oregon Scientific v1 — mirrors pulse/slicers.py slicer_osv1
# (ref src/pulse_slicer.c:775-864)
# ---------------------------------------------------------------------------

def osv1_bounds(devices, sample_rate: int):
    """Per-spec OSv1 parameters [S]; integer-exact."""
    return _timing_cols(devices, sample_rate, {
        "short": lambda t: t["short"], "reset": lambda t: t["reset"]})


@functools.partial(jax.jit, static_argnames=("caps",))
def slice_osv1(pulse, gap, n_pulses, bounds, caps: SliceCaps = SliceCaps()):
    """Batched OSv1 slicing as a phase machine in the scan carry:
    phase 0 counts the 12-pulse preamble (any out-of-window pulse aborts),
    phase 1 validates the long sync pulse and emits the polarity 0-bit,
    phase 2 walks half-bit Manchester transitions (a toggle emits a bit
    whenever the toggled state is high), phase 3 is done/aborted. At most
    one event per train, all bits in row 0."""
    B, N = pulse.shape
    S = bounds["short"].shape[0]
    E, R, BY = caps.events, caps.rows, caps.row_bytes
    BITS = BY * 8
    sh = bounds["short"][None, :]
    rst = bounds["reset"][None, :]
    okm = bounds["ok"][None, :]
    hmin = sh // 2
    hmax = sh * 3 // 2
    sync_min = 2 * hmax

    def step(carry, xs):
        phase, cnt, manbit, bir, touched, nev, ovf = carry
        p, g, valid, last = xs
        p = p[:, None].astype(jnp.int32)
        g = g[:, None].astype(jnp.int32)
        act = valid[:, None] & okm
        last = last[:, None]
        ph0 = act & (phase == 0)
        ph1 = act & (phase == 1)
        ph2 = act & (phase == 2)
        # phase 0: preamble counting
        pass0 = (p > hmin) & (g > hmin)
        cnt2 = jnp.where(ph0 & pass0, cnt + 1, cnt)
        brk = ph0 & pass0 & (g > hmax)
        phase2_ = jnp.where(ph0 & ~pass0, 3, phase)
        phase2_ = jnp.where(brk, jnp.where(cnt2 == 12, 1, 3), phase2_)
        # phase 1: sync pulse + polarity bit
        pass1 = (p >= sync_min) & (g >= sync_min)
        phase3_ = jnp.where(ph1, jnp.where(pass1, 2, 3), phase2_)
        sync0 = ph1 & pass1 & (g > p)
        manbit2 = jnp.where(sync0, 1, manbit)
        # phase 2: pulse-side 1 bits
        m = manbit2
        phit = p > hmax
        c1 = ph2 & (phit | (m == 0))
        mp = jnp.where(phit, m, 1 - m)
        b1 = bir
        bir2 = bir + c1
        touched2 = touched | c1 | sync0
        flush = ph2 & (last | (g > rst)) & touched2
        # gap-side 0 bits (skipped on flush)
        ghit = g > hmax
        c0raw = ph2 & ~flush & (ghit | (mp == 0))
        c0 = c0raw | sync0
        b0 = bir2
        bir3 = bir2 + c0
        m3 = jnp.where(ph2 & ~flush, jnp.where(ghit, mp, 1 - mp),
                       jnp.where(flush, mp, manbit2))
        touched3 = touched2 | c0
        phase4_ = jnp.where(flush, 3, phase3_)
        nev2 = nev + flush
        ovf2 = ovf | (bir3 > BITS)
        ys = (c1, b1, c0, b0, flush)
        return (phase4_, cnt2, m3, bir3, touched3, nev2, ovf2), ys

    z = jnp.zeros((B, S), jnp.int32)
    zb = jnp.zeros((B, S), bool)
    iot = jnp.arange(N)[:, None]
    valid = iot < n_pulses[None, :]
    last = iot == (n_pulses[None, :] - 1)
    carry, ys = lax.scan(step, (z, z, z, z, zb, z, zb),
                         (pulse.T, gap.T, valid, last))
    _ph, _c, _m, _b, _t, nev, ovf = carry
    (c1, b1, c0, b0, flush) = ys

    L = B * S

    def flat(x):
        return x.reshape(N, L).T

    def scat(shape, idx_cols, vals, mask):
        return _lane_scatter_add(B, S, shape, idx_cols, vals, mask)

    m1 = flat(c1)
    bp1 = jnp.clip(flat(b1), 0, BITS - 1)
    row0 = scat((BY,), [bp1 // 8],
                jnp.ones_like(bp1) << (7 - bp1 % 8), m1)
    bytes_ = jnp.zeros((B, S, E, R, BY), jnp.uint8)
    bytes_ = bytes_.at[:, :, 0, 0, :].set(row0.astype(jnp.uint8))
    nbits = (m1.sum(axis=1) + flat(c0).sum(axis=1)).reshape(B, S)
    bits_per_row = jnp.zeros((B, S, E, R), jnp.int32)
    bits_per_row = bits_per_row.at[:, :, 0, 0].set(nbits)
    num_rows = jnp.zeros((B, S, E), jnp.int32)
    num_rows = num_rows.at[:, :, 0].set(
        jnp.where(nev > 0, 1, 0))
    syncs = jnp.zeros((B, S, E, R), jnp.int32)
    return {"bytes": bytes_, "bits_per_row": bits_per_row, "syncs": syncs,
            "num_rows": num_rows, "n_events": nev, "ovf": ovf}
