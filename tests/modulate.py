"""Inverse slicers: bitbuffers -> pulse trains -> IQ, per protocol timing.

The forward direction is rtl_433_tpu/pulse/slicers.py (modeled on reference
src/pulse_slicer.c); this module emits a pulse/gap train that the slicer
will classify back into exactly the given bitbuffer rows — the generator
for the IQ-level parity corpus (VERDICT r1 item 2; the rtl_433_tests-corpus
analogue, ref .ci/scripts/do_tests.sh:14-22).

Supported modulations: PPM, PWM (incl. sync), PCM (NRZ and RZ), DMC,
Manchester-zerobit. Returns None when the timing spec cannot express the
row structure (e.g. rows without a gap window).
"""

from __future__ import annotations


def _ppm(bits, dev):
    s, l, y = dev.short_width, dev.long_width, dev.sync_width
    g, r, t = dev.gap_limit, dev.reset_limit, dev.tolerance
    pulse = min(max(s, 100.0), 1000.0)
    # row gaps must stay under the DETECTOR's end-of-package threshold
    # (max(10 * max_pulse, 10 ms), ref src/pulse_detect.c PD_MAX_GAP_RATIO/
    # PD_MIN_GAP_MS) or the package splits before the slicer sees the rows
    eop_guard = max(10 * pulse, 10_000.0) * 0.9
    if t > 0:
        zero, one = s, l
        r_cap = min(r, eop_guard)
        row_gap = l + t + (r_cap - (l + t)) / 2
        if y > 0 and abs(row_gap - y) <= t:
            row_gap = (y + t + r_cap) / 2
        if row_gap >= r or row_gap <= l + t:
            row_gap = None
    else:
        zero, one = s, l
        one_u = g if g else r
        if l >= one_u:
            # the one-window is ((s+l)/2, one_u) EXCLUSIVE (sample domain,
            # pulse_slicer.c:261-337 with tolerance 0): a spec whose long
            # equals its gap_limit (e.g. thermor) puts the natural render
            # on the open boundary — aim for the window's upper middle
            one = ((s + l) / 2 + one_u) / 2
        r_cap = min(r, eop_guard)
        row_gap = (one_u + r_cap) / 2 if one_u < r_cap else (
            (one_u + r) / 2 if one_u < r else None)
    end_gap = r * 1.5 + 1000
    # when reset exceeds the DETECTOR's end-of-package threshold
    # (max(10 * max_pulse, 10 ms)), the recorded final gap is truncated
    # below reset and the slicer classifies it as a spurious bit before
    # the last-pulse flush; a wide end pulse (PPM ignores pulse widths)
    # raises the threshold so the final gap really exceeds reset
    end_pulse = max(pulse, r / 10 * 1.15)
    train = []
    for row in range(bits.num_rows):
        for _ in range(bits.syncs_before_row[row]):
            if y <= 0:
                return None
            train.append((pulse, y))
        n = bits.bits_per_row[row]
        rowbits = _row_str(bits, row)
        for b in rowbits:
            train.append((pulse, one if b == "1" else zero))
        if row < bits.num_rows - 1:
            if row_gap is None:
                return None
            train.append((pulse, row_gap))
    train.append((end_pulse, end_gap))
    return train


def _pwm(bits, dev):
    s, l, y = dev.short_width, dev.long_width, dev.sync_width
    g, r, t = dev.gap_limit, dev.reset_limit, dev.tolerance
    end_gap = r * 1.5 + 1000
    # inter-bit gap must stay below gap_limit (or reset when no gap_limit)
    lim = g if g > 0 else r
    gap = min(lim / 2, max(s, 100.0))
    if gap <= 0:
        return None
    # keep row gaps under the DETECTOR's end-of-package threshold
    # (max(10 * max_pulse, 10 ms)) or the package splits before slicing
    eop_guard = max(10 * max(s, l, y), 10_000.0) * 0.9
    row_gap = (g + min(r, eop_guard)) / 2 if 0 < g < min(r, eop_guard) \
        else ((g + r) / 2 if 0 < g < r else None)
    # PWM cannot transmit an empty row directly: leading empty rows (a
    # burst like calibeur's "S 21 S 21 S", where the decoder indexes
    # bb[1], bb[2]) are rendered by duplicating the first non-empty row —
    # the slicer then reproduces the same populated rows at the same
    # indices; a single trailing empty row (nice_flor_s's "{52}... {0}")
    # is a gap row-break followed by a spurious-short terminator pulse
    # the slicer ignores.
    rows = list(range(bits.num_rows))
    trailing_empty = (bits.num_rows >= 2
                      and bits.bits_per_row[bits.num_rows - 1] == 0)
    if trailing_empty:
        rows = rows[:-1]
    first_full = next((i for i in rows if bits.bits_per_row[i] > 0), None)
    lead = 0
    while lead < len(rows) and bits.bits_per_row[rows[lead]] == 0:
        if first_full is None or y <= 0 or lead >= 8:
            return None
        rows[lead] = first_full
        lead += 1
    train = []
    for k, row in enumerate(rows):
        for _ in range(bits.syncs_before_row[row] if k >= lead else 1):
            if y <= 0:
                break
            train.append((y, gap))
        for b in _row_str(bits, row):
            train.append((s if b == "1" else l, gap))
        if k < len(rows) - 1:
            if row_gap is not None:
                train[-1] = (train[-1][0], row_gap)
            elif y > 0:
                # no gap window: a sync pulse separates rows
                # (bitbuffer add_sync starts a new row)
                train.append((y, gap))
            else:
                return None
    if not train:
        return None
    if trailing_empty:
        spur = (s - t) * 0.5 if t > 0 else 0
        if spur >= 4 and row_gap is not None:
            train[-1] = (train[-1][0], row_gap)
            train.append((spur, end_gap))
        elif y > 0:
            # sync after bits opens the empty trailing row
            train[-1] = (train[-1][0], gap)
            train.append((y, end_gap))
        else:
            return None
    else:
        train[-1] = (train[-1][0], end_gap)
    return train


def _pcm(bits, dev, head_bits=None):
    s, l = dev.short_width, dev.long_width
    g, r = dev.gap_limit, dev.reset_limit
    end_gap = r * 1.5 + 1000
    # inter-row gap: the slicer starts a new row for gaps in
    # (gap_limit, reset] (slicers.py slicer_pcm)
    row_gap = (g + r) / 2 if 0 < g < r else None
    if bits.num_rows > 1 and row_gap is None:
        return None
    is_fsk = dev.modulation.startswith("FSK")
    train = []
    for row in range(bits.num_rows):
        rowbits = _row_str(bits, row)
        if head_bits and (row == 0 or not is_fsk):
            # every OOK row loses its untransmittable leading zeros —
            # phase-protect each row, not just the first
            rowbits = "".join("1" if b else "0" for b in head_bits) + rowbits
        # OOK: leading zeros cannot be transmitted before the first pulse
        # (carrier-off equals silence) — trim them; decoders search for
        # their sync anywhere in the row and BOTH pipelines replay the
        # same IQ.  FSK: a zero is a real tone (space/f2, carrier on), so
        # leading zeros ARE transmittable — emit them as an initial
        # zero-length-pulse pair so frames whose sync begins with 0 bits
        # survive bit-exact (e.g. 0x33 Manchester sync).
        lead = len(rowbits) - len(rowbits.lstrip("0"))
        rowbits = rowbits.lstrip("0")
        i = 0
        n = len(rowbits)
        rt = []
        if is_fsk and lead and rowbits and s == l:
            rt.append((0.0, lead * l))
        if not rowbits:
            # all-zero row: a sub-short spurious pulse (emits no 1s) whose
            # following gap zero-fills the row up to the max_zeros cap.
            # RZ cannot use the spur — an out-of-class pulse CLEARS the
            # buffer (slicer_pcm) and swallows the row break — so emit an
            # in-class pulse instead: the row renders as '1'+zeros, which
            # is the closest transmittable shape (RZ rows cannot start
            # with 0), and row-count-gated decoders (e.g. atech_ws308
            # reading bb[1]) never look at the filler row's content
            if bits.num_rows == 1:
                return None
            rt.append((s * 0.45 if s == l else s, 0.0))
        if s == l:  # NRZ
            lim = g if g > 0 else r
            cap_run = int(lim // l) if l > 0 else 0
            while i < n:
                j = i
                while j < n and rowbits[j] == "1":
                    j += 1
                ones = j - i
                k = j
                while k < n and rowbits[k] == "0":
                    k += 1
                zeros = k - j
                if k >= n:
                    rt.append((ones * s, max(zeros * l, 0)))
                elif cap_run <= 0 or zeros <= cap_run:
                    rt.append((ones * s, zeros * l))
                else:
                    # one gap can carry at most gap_limit//long zeros
                    # before the slicer caps the run / breaks the row
                    # (slicer_pcm max_zeros): chain sub-short spur
                    # pulses (highs rounds to 0) carrying the rest —
                    # for FSK the spur is a sub-bit mark tone burst
                    rt.append((ones * s, cap_run * l))
                    rem = zeros - cap_run
                    while rem > 0:
                        c = min(rem, cap_run)
                        rt.append((s * 0.45, c * l))
                        rem -= c
                i = k
        else:  # RZ: pulse=short, bit period=long
            while i < n:
                j = i + 1
                while j < n and rowbits[j] == "0":
                    j += 1
                zeros = j - i - 1
                rt.append((s, (l - s) + zeros * l))
                i = j
        if row < bits.num_rows - 1:
            # The slicer emits min(round(total_gap/l), gap_limit//l) zeros
            # from the row-break gap itself, so the row's trailing zeros
            # must come OUT of that single gap: pick total_gap so the
            # emitted count equals the row's own trailing zeros z_t
            # (possible when (g, r] intersects ((z_t-.45)l, (z_t+.45)l);
            # when z_t saturates the cap the plain formula already works).
            z_t = n - len(rowbits.rstrip("0")) if rowbits else 0
            cap_z = int(g // l) if l > 0 else 0
            done = False
            if not is_fsk and s == l:
                # pick how many trailing zeros ride the break gap itself
                # (an exact count z_b needs a gap in ((z_b-.45)l,
                # (z_b+.45)l) that also row-breaks, i.e. in (g, r]; at
                # z_b == cap_z the max_zeros cap absorbs any larger gap,
                # so the window extends to reset);
                # spur-chain the excess in <= cap_z chunks per gap
                for z_b in range(min(z_t, cap_z), -1, -1):
                    lo = max(g + l * 0.05, (z_b - 0.45) * l)
                    hi = r if z_b == cap_z else min(r, (z_b + 0.45) * l)
                    if lo >= hi:
                        continue
                    rem = z_t - z_b
                    if rem > 0 and cap_z <= 0:
                        continue
                    rt[-1] = (rt[-1][0], 0.0)
                    first = True
                    while rem > 0:
                        c = min(rem, cap_z)
                        if first:
                            rt[-1] = (rt[-1][0], c * l)
                            first = False
                        else:
                            rt.append((s * 0.45, c * l))
                        rem -= c
                    if first:
                        rt[-1] = (rt[-1][0], (lo + hi) / 2)
                    else:
                        rt.append((s * 0.45, (lo + hi) / 2))
                    done = True
                    break
                if not done:
                    # no break gap emits exactly z_t zeros: accept the
                    # smallest feasible count above it — the phantom
                    # zeros land identically in both pipelines and
                    # repeated-row decoders see consistent rows
                    for z_b in range(z_t + 1, cap_z + 1):
                        lo = max(g + l * 0.05, (z_b - 0.45) * l)
                        hi = r if z_b == cap_z else min(r, (z_b + 0.45) * l)
                        if lo < hi:
                            rt[-1] = (rt[-1][0], (lo + hi) / 2)
                            done = True
                            break
            if not done:
                rt[-1] = (rt[-1][0], rt[-1][1] + row_gap)
        else:
            z_t = n - len(rowbits.rstrip("0")) if rowbits else 0
            lim = g if g > 0 else r
            cap_z = int(lim // l) if l > 0 else 0
            done = False
            if not is_fsk and s == l and l > 0:
                # the end gap always contributes min(cap_z, round(G/l))
                # zeros before the flush — chain any excess first
                z_e = min(cap_z, int(end_gap / l + 0.5))
                rem = z_t - z_e
                if rem > 0 and cap_z > 0:
                    rt[-1] = (rt[-1][0], 0.0)
                    first = True
                    while rem > 0:
                        c = min(rem, cap_z)
                        if first:
                            rt[-1] = (rt[-1][0], c * l)
                            first = False
                        else:
                            rt.append((s * 0.45, c * l))
                        rem -= c
                    rt.append((s * 0.45, end_gap))
                    done = True
            if not done:
                rt[-1] = (rt[-1][0], rt[-1][1] + end_gap)
        train += rt
    return train


def _piwm_dc(bits, dev):
    """PIWM-DC: bit 1 = short symbol, 0 = long symbol, strictly
    alternating pulse/gap (slicers.py slicer_piwm_dc)."""
    s, l, r, t = (dev.short_width, dev.long_width, dev.reset_limit,
                  dev.tolerance)
    if t <= 0:
        return None
    # a symbol that is neither short nor long but < reset starts a new row
    brk = (l + t + r) / 2
    if bits.num_rows > 1 and not (l + t < brk < r):
        return None
    widths = []
    for row in range(bits.num_rows):
        if row:
            widths += [brk]
        widths += [s if b == "1" else l for b in _row_str(bits, row)]
    widths += [r * 1.5 + 1000 + t]
    if len(widths) % 2:
        widths += [r * 1.5 + 1000 + t]
    return [(widths[i], widths[i + 1]) for i in range(0, len(widths), 2)]


def _nrzs(bits, dev):
    """NRZS: a pulse of k*short emits k ones + one zero; a sub-short pulse
    emits a zero (slicers.py slicer_nrzs). Rows must end in a zero."""
    s, r = dev.short_width, dev.reset_limit
    if bits.num_rows != 1:
        return None
    rowbits = _row_str(bits, 0)
    train = []
    i = 0
    n = len(rowbits)
    while i < n:
        if rowbits[i] == "1":
            j = i
            while j < n and rowbits[j] == "1":
                j += 1
            if j >= n:
                return None  # trailing ones have no closing zero
            train.append(((j - i) * s + s * 0.4, s))  # k ones + the zero
            i = j + 1
        else:
            train.append((s * 0.4, s))  # lone zero: sub-short pulse
            i += 1
    if not train:
        return None
    train[-1] = (train[-1][0], r * 1.5 + 1000)
    return train


def _osv1(bits, dev):
    """Oregon Scientific v1 (slicers.py slicer_osv1): 12-pulse preamble
    (12th gap > 1.5 halfbits), a long sync pulse/gap pair (P > G so no
    phantom first bit), then Manchester halves at the halfbit width with
    odd half-slots carrying the bits."""
    s, r = dev.short_width, dev.reset_limit
    if bits.num_rows != 1:
        return None
    rowbits = _row_str(bits, 0).lstrip("0")
    if not rowbits:
        return None
    train = [(s, s)] * 11 + [(s, 2 * s)] + [(4 * s, 3.4 * s)]
    levels = []
    for b in rowbits:
        levels += [1, 0] if b == "1" else [0, 1]
    rt = []
    i = 0
    n = len(levels)
    while i < n:
        j = i
        while j < n and levels[j] == 1:
            j += 1
        k = j
        while k < n and levels[k] == 0:
            k += 1
        rt.append(((j - i) * s, (k - j) * s))
        i = k
    rt[-1] = (rt[-1][0], rt[-1][1] + r * 1.5 + 1000)
    return train + rt


def _rzi(bits, dev):
    """RZI (slicers.py slicer_rzi): a pulse of base+k*long emits k ones
    (no base on the row's first pulse); each sub-reset gap emits one 0."""
    s, l, r = dev.short_width, dev.long_width, dev.reset_limit
    if bits.num_rows != 1:
        return None
    rowbits = _row_str(bits, 0).lstrip("0")
    if not rowbits:
        return None
    base = l - s
    segs = rowbits.split("0")
    train = []
    for i, seg in enumerate(segs):
        k = len(seg)
        w = k * l + (0 if i == 0 else base)
        if w <= 0:
            w = base
        g = max(s, 50.0) if i < len(segs) - 1 else r * 1.5 + 1000
        train.append((w, g))
    return train


def _dmc(bits, dev):
    """Differential Manchester: a 1 is short+short, a 0 is one long.

    Row breaks inside one event are only expressible after a dangling 1:
    the slicer (pulse_slicer.c:537-595) adds a row when a 1's second half
    is mistimed (outside short tolerance, below reset) — so every
    non-final row must end in '1' (e.g. fordremote's {1}/{9}/{1}/{78}
    pattern, src/devices/fordremote.c:34-44); rows ending 0 can't break.
    """
    s, l, r = dev.short_width, dev.long_width, dev.reset_limit
    t = dev.tolerance
    if t <= 0:
        return None
    # mistimed second half: outside BOTH symbol tolerances, below reset
    mist = None
    for cand in (l * 1.5 + t, (max(2 * s, l) + r) / 2, l + 2.5 * t):
        if abs(cand - s) > t and abs(cand - l) > t and cand < r - t \
                and cand >= 2:
            mist = cand
            break
    widths = []
    rows = [_row_str(bits, i) for i in range(bits.num_rows)]
    for idx, rowbits in enumerate(rows):
        last = idx == len(rows) - 1
        if not last and (not rowbits or rowbits[-1] != "1"
                         or mist is None):
            return None
        for j, b in enumerate(rowbits):
            if b == "1":
                if not last and j == len(rowbits) - 1:
                    widths += [s, mist]  # dangling 1 -> add_row
                else:
                    widths += [s, s]
            else:
                widths += [l]
        if last:
            widths += [r + t + 2000]  # message terminator symbol
    # pair alternating pulse/gap
    if len(widths) % 2:
        widths += [r + t + 2000]
    train = [(widths[i], widths[i + 1]) for i in range(0, len(widths), 2)]
    return train


def _mc_zerobit(bits, dev):
    """Manchester, first bit hardcoded 0: bit boundaries every 2*short;
    a 1 reads as accumulated high > 1.5*short, a 0 as accumulated low."""
    s, r, t = dev.short_width, dev.reset_limit, dev.tolerance
    end_gap = r * 1.5 + 1000
    # every slicer row starts with a hardcoded 0 bit — rows beginning
    # with 1 gain a prepended 0 (decoders search their sync anywhere and
    # BOTH pipelines replay the same IQ)
    rows = [_row_str(bits, i) for i in range(bits.num_rows)]
    rows = [("0" + rb) if rb and rb[0] != "0" else rb for rb in rows]
    if any(not rb for rb in rows):
        return None
    if len(rows) > 1:
        # Rows must break on an out-of-tolerance PULSE, not a long gap: the
        # slicer (slicer_manchester_zerobit) processes the break pair's gap
        # AFTER add_row/add_bit(0), so a break GAP > 1.5s injects a
        # spurious extra 0 into the new row. A separator pair
        # (pulse > 2s+tol, gap < s-tol) triggers the break on the pulse
        # and leaves the next row's phase clean; needs tolerance > 0.
        brk_pulse = 2 * s + t + s
        brk_gap = min(s - t, s * 0.5) * 0.5 if t < s else s * 0.25
        if t <= 0 or brk_gap <= 0:
            return None
    train = []
    for idx, rowbits in enumerate(rows):
        # G.E. Thomas halves (1 -> high,low ; 0 -> low,high), leading low
        # half-bits stripped (silence); validated by round-trip through
        # the forward slicer.
        levels = []
        for b in rowbits:
            levels += [1, 0] if b == "1" else [0, 1]
        i0 = 0
        while i0 < len(levels) and levels[i0] == 0:
            i0 += 1
        levels = levels[i0:]
        if not levels:
            return None
        rt = []
        i = 0
        n = len(levels)
        while i < n:
            j = i
            while j < n and levels[j] == 1:
                j += 1
            k = j
            while k < n and levels[k] == 0:
                k += 1
            rt.append(((j - i) * s, (k - j) * s))
            i = k
        if idx < len(rows) - 1:
            # separator pair: out-of-tolerance long pulse, tiny gap. A
            # row ending in a high half leaves a zero-gap tail pair —
            # merge it into the separator pulse or the slicer breaks twice
            if rt and rt[-1][1] < 1.0:
                rt[-1] = (rt[-1][0] + brk_pulse, brk_gap)
            else:
                rt.append((brk_pulse, brk_gap))
        else:
            rt[-1] = (rt[-1][0], rt[-1][1] + end_gap)
        train += rt
    return train


def _row_str(bits, row):
    n = bits.bits_per_row[row]
    flat = bits.bb[row:].reshape(-1)
    return "".join(str((flat[i >> 3] >> (7 - (i & 7))) & 1) for i in range(n))


MODULATORS = {
    "OOK_PULSE_PPM": _ppm,
    "OOK_PULSE_PWM": _pwm,
    "FSK_PULSE_PWM": _pwm,
    "OOK_PULSE_PCM": _pcm,
    "OOK_PULSE_RZ": _pcm,
    "FSK_PULSE_PCM": _pcm,
    "OOK_PULSE_PIWM_DC": _piwm_dc,
    "OOK_PULSE_NRZS": _nrzs,
    "OOK_PULSE_PWM_OSV1": _osv1,
    "OOK_PULSE_RZI": _rzi,
    "OOK_PULSE_DMC": _dmc,
    "OOK_PULSE_MANCHESTER_ZEROBIT": _mc_zerobit,
    "FSK_PULSE_MANCHESTER_ZEROBIT": _mc_zerobit,
}


def modulate(bits, dev, head_bits=None):
    """BitBuffer + RDevice -> [(pulse_us, gap_us), ...] or None.

    ``head_bits`` (PCM only): sacrificial bits prepended to row 0 before
    encoding — OOK cannot transmit a frame's leading zeros (carrier off),
    so a head replicating the frame's lead pattern preserves the frame's
    own bit phase through the untransmittable prefix (fitted per protocol
    by tests/test_corpus_parity.py)."""
    fn = MODULATORS.get(dev.modulation)
    if fn is None:
        return None
    try:
        if fn is _pcm and head_bits:
            return _pcm(bits, dev, head_bits)
        return fn(bits, dev)
    except Exception:
        return None
