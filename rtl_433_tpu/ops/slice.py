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

    L = B * S
    lane = jnp.arange(L, dtype=jnp.int32)[:, None].repeat(N, 1)

    def scat(shape, idx_cols, vals, mask):
        tgt = [lane] + idx_cols
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
