"""Sequential pure-Python pulse-detector oracle for debugging the engine.

A faithful behavioral model of pulse_detect_package + FSK trackers
(ref src/pulse_detect.c:199-483, src/pulse_detect_fsk.c) operating on the
already-lowpassed AM/FM streams. Reproduces the C call-loop quirk where the
EOP sample is re-processed by the next call (the while loop returns before
incrementing data_counter).

Used only by tests: the JAX engine must match this, and this must match the
reference binary.
"""

import math

import numpy as np

OOK_MAX_HIGH_LEVEL = 16384
OOK_EST_HIGH_RATIO = 64
OOK_EST_LOW_RATIO = 1024
PD_MAX_PULSES = 1200
PD_MIN_PULSES = 16
PD_MIN_PULSE_SAMPLES = 10
PD_MIN_GAP_MS = 10
PD_MAX_GAP_MS = 100
PD_MAX_GAP_RATIO = 10
FSK_DEFAULT_FM_DELTA = 6000
FSK_EST_SLOW = 64
FSK_EST_FAST = 16

IDLE, PULSE, GAP_START, GAP = 0, 1, 2, 3
F_INIT, F_FH, F_FL, F_ERR = 0, 1, 2, 3


def tdiv(a, b):
    """C truncating integer division."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def am_fm_streams(iq, rate=250_000, minmax=False, use_mag_est=False):
    """Sequential numpy envelope + AM low-pass + FM demod, exact C semantics
    (ref src/baseband.c). iq: uint8 [N, 2]. Returns (am int16[N], fm int16[N])."""
    iq = np.asarray(iq, np.int64)
    n = iq.shape[0]
    if use_mag_est:
        x = np.abs(iq[:, 0] - 128)
        y = np.abs(iq[:, 1] - 128)
        raw = 122 * np.maximum(x, y) + 51 * np.minimum(x, y)
    else:
        raw = (127 - iq[:, 0]) ** 2 + (127 - iq[:, 1]) ** 2
    A1 = int(0.85408 * 32768) >> 1
    B = int(0.07296 * 32768) >> 1
    am = np.zeros(n, np.int16)
    yp = xp = 0
    for i in range(n):
        v = (A1 * int(yp) + B * (int(raw[i]) + int(xp))) >> 14
        v = ((v & 0xFFFF) ^ 0x8000) - 0x8000  # int16 store-truncation
        am[i] = v
        yp, xp = v, int(raw[i])

    low_pass = 0.2 if minmax else 0.1
    ita = 1.0 / math.tan(math.pi / 2 * low_pass)
    gain = 1.0 / (1.0 + ita) / 2
    alp1 = int((ita - 1.0) * gain * 32768)
    blp = int(gain * 32768)
    fm = np.zeros(n, np.int16)
    x0r = x0i = x0f = y0f = 0
    I_PI_4 = 32767 // 4
    I_3_PI_4 = 3 * 32767 // 4
    for i in range(n):
        x1r, x1i, x1f, y1f = x0r, x0i, x0f, y0f
        x0r = int(iq[i, 0]) - 128
        x0i = int(iq[i, 1]) - 128
        pr = x0r * x1r + x0i * x1i
        pi = x0i * x1r - x0r * x1i
        # atan2_int16 (ref src/baseband.c:181-202)
        if pr == 0 and pi == 0:
            x0f = 0
        else:
            ay = abs(pi)
            if pr >= 0:
                d = ay + pr or 1
                a = I_PI_4 - tdiv(I_PI_4 * (pr - ay), d)
            else:
                d = ay - pr or 1
                a = I_3_PI_4 - tdiv(I_PI_4 * (pr + ay), d)
            x0f = -a if pi < 0 else a
        v = (alp1 * y1f + blp * (x0f + x1f)) >> 14
        y0f = ((v & 0xFFFF) ^ 0x8000) - 0x8000  # int16 store-truncation
        fm[i] = y0f
    return am, fm


class FskDet:
    def __init__(self):
        self.init()

    def init(self):
        self.state = F_INIT
        self.len = 0
        self.f1 = 0
        self.f2 = 0
        self.vmax = -32768
        self.vmin = 32767
        self.skip = 40

    def classic(self, fm, fsk):
        f1d = abs(fm - self.f1)
        f2d = abs(fm - self.f2)
        self.len += 1
        if self.state == F_INIT:
            if self.len < PD_MIN_PULSE_SAMPLES:
                self.f1 = tdiv(self.f1, 2) + tdiv(fm, 2)
            elif f1d > FSK_DEFAULT_FM_DELTA // 2:
                if fm > self.f1:
                    self.state = F_FH
                    self.f2 = self.f1
                    self.f1 = fm
                    fsk["pulse"][0] = 0
                    fsk["gap"][0] = self.len
                    fsk["num"] += 1
                    self.len = 0
                else:
                    self.state = F_FL
                    self.f2 = fm
                    fsk["pulse"][0] = self.len
                    self.len = 0
            else:
                self.f1 += tdiv(fm, FSK_EST_FAST) - tdiv(self.f1, FSK_EST_FAST)
        elif self.state == F_FH:
            if f1d > f2d:
                self.state = F_FL
                if self.len >= PD_MIN_PULSE_SAMPLES:
                    fsk["pulse"][fsk["num"]] = self.len
                    self.len = 0
                else:
                    self.len += fsk["gap"][fsk["num"] - 1]
                    fsk["num"] -= 1
                    if fsk["num"] == 0 and fsk["pulse"][0] == 0:
                        self.f1 = self.f2
                        self.state = F_INIT
            else:
                if fm > self.f1:
                    self.f1 += tdiv(fm, FSK_EST_FAST) - tdiv(self.f1, FSK_EST_FAST)
                else:
                    self.f1 += tdiv(fm, FSK_EST_SLOW) - tdiv(self.f1, FSK_EST_SLOW)
        elif self.state == F_FL:
            if f2d > f1d:
                self.state = F_FH
                if self.len >= PD_MIN_PULSE_SAMPLES:
                    fsk["gap"][fsk["num"]] = self.len
                    fsk["num"] += 1
                    self.len = 0
                    if fsk["num"] >= PD_MAX_PULSES:
                        # pulse_data_shift workaround; not modeled
                        fsk["num"] = PD_MAX_PULSES - 1
                else:
                    self.len += fsk["pulse"][fsk["num"]]
                    if fsk["num"] == 0:
                        self.state = F_INIT
            else:
                if fm < self.f2:
                    self.f2 += tdiv(fm, FSK_EST_FAST) - tdiv(self.f2, FSK_EST_FAST)
                else:
                    self.f2 += tdiv(fm, FSK_EST_SLOW) - tdiv(self.f2, FSK_EST_SLOW)

    def minmax(self, fm, fsk):
        if not self.skip:
            self.vmax = max(fm, self.vmax)
            self.vmin = min(fm, self.vmin)
            mid = tdiv(self.vmax + self.vmin, 2)
            if fm > mid:
                self.vmax -= 10
            if fm < mid:
                self.vmin += 10
            self.len += 1
            if self.state == F_INIT:
                self.state = F_FH if fm > mid else F_FL
            elif self.state == F_FH:
                if fm < mid:
                    self.state = F_FL
                    fsk["pulse"][fsk["num"]] = self.len
                    self.len = 0
                self.f2 += tdiv(fm, FSK_EST_SLOW) - tdiv(self.f2, FSK_EST_SLOW)
            elif self.state == F_FL:
                if fm > mid:
                    self.state = F_FH
                    fsk["gap"][fsk["num"]] = self.len
                    fsk["num"] += 1
                    self.len = 0
                    if fsk["num"] >= PD_MAX_PULSES:
                        fsk["num"] = PD_MAX_PULSES - 1
                self.f1 += tdiv(fm, FSK_EST_SLOW) - tdiv(self.f1, FSK_EST_SLOW)
        if self.skip > 0:
            self.skip -= 1

    def wrap_up(self, fsk):
        if fsk["num"] < PD_MAX_PULSES:
            self.len += 1
            if self.state == F_FH:
                fsk["pulse"][fsk["num"]] = self.len
                fsk["gap"][fsk["num"]] = 0
            else:
                fsk["gap"][fsk["num"]] = self.len
            fsk["num"] += 1


def new_pkg():
    return {"pulse": [0] * PD_MAX_PULSES, "gap": [0] * PD_MAX_PULSES,
            "num": 0, "f1": 0, "f2": 0, "low": 0, "high": 0, "start": 0,
            "end": 0}


class Oracle:
    """pulse_detect state (ref struct pulse_detect, src/pulse_detect.c:30-54)."""

    def __init__(self, sample_rate=250_000, use_mag_est=False, minmax=False,
                 fixed_high_level=0, min_high_level=1000, high_low_ratio=8):
        self.rate = sample_rate
        self.minmax = minmax
        self.fixed = fixed_high_level
        self.min_high = min_high_level
        self.ratio = high_low_ratio
        self.state = IDLE
        self.plen = 0
        self.max_pulse = 0
        self.data_counter = 0
        self.lead_in = 0
        self.low = 0
        self.high = 0
        self.fsk = FskDet()
        self.pkg = new_pkg()
        self.fskpkg = new_pkg()

    def detect(self, am, fm, t0=0):
        """Feed one block; returns list of published packages (type, pkg)."""
        out = []
        n = len(am)
        while True:
            r = self._package(am, fm, n, t0)
            if not r:
                break
            out.append(r)
        return out

    def _publish_ook(self, t, n):
        self.pkg["low"] = self.low
        self.pkg["high"] = self.high
        self.pkg["end"] = t
        pkg = self.pkg
        self.pkg = new_pkg()
        keep_fsk = self.fskpkg
        self.fskpkg = new_pkg()
        # reference clears only on next package start; num survives; but
        # since we re-create on start anyway this is equivalent
        self.fskpkg = keep_fsk
        return ("OOK", pkg)

    def _publish_fsk(self, t, wrap):
        if wrap:
            self.fsk.wrap_up(self.fskpkg)
        self.fskpkg["f1"] = self.fsk.f1
        self.fskpkg["f2"] = self.fsk.f2
        self.fskpkg["low"] = self.low
        self.fskpkg["high"] = self.high
        self.fskpkg["end"] = t
        pkg = self.fskpkg
        self.fskpkg = new_pkg()
        return ("FSK", pkg)

    def _package(self, am_buf, fm_buf, length, t0):
        """One pulse_detect_package call. Returns package or None (out of data)."""
        s = self
        if length == 0:
            # flush (ref :203-278)
            if s.state == PULSE:
                if s.plen < PD_MIN_PULSE_SAMPLES:
                    if s.pkg["num"] <= 1:
                        s.state = IDLE
                        return None
                    s.state = GAP
                else:
                    s.pkg["pulse"][s.pkg["num"]] = s.plen
                    s.max_pulse = max(s.plen, s.max_pulse)
                    s.plen = 0
                    s.state = GAP_START
            if s.state == GAP_START:
                s.state = GAP
                if s.fskpkg["num"] > PD_MIN_PULSES:
                    r = s._publish_fsk(length - s.data_counter, not s.minmax)
                    s.state = IDLE
                    return r
            if s.state == GAP:
                s.pkg["gap"][s.pkg["num"]] = s.plen
                s.pkg["num"] += 1
                s.state = IDLE
                return s._publish_ook(length - s.data_counter, length)
            return None

        samples_per_ms = s.rate // 1000
        s.high = max(s.high, s.min_high)
        eop_on_spurious = 0

        while s.data_counter < length:
            i = s.data_counter
            am_n = am_buf[i]
            thr = tdiv(s.low + min(s.high, OOK_MAX_HIGH_LEVEL), 2)
            if s.fixed:
                thr = s.fixed
            hyst = tdiv(thr, 8)

            if s.state == IDLE:
                if am_n > thr + hyst and s.lead_in > OOK_EST_LOW_RATIO:
                    s.pkg = new_pkg()
                    s.fskpkg = new_pkg()
                    s.pkg["start"] = t0 + i
                    s.fskpkg["start"] = t0 + i
                    s.plen = 0
                    s.max_pulse = 0
                    s.fsk.init()
                    s.state = PULSE
                else:
                    delta = am_n - s.low
                    s.low += tdiv(delta, OOK_EST_LOW_RATIO)
                    s.low += 1 if delta > 0 else -1
                    s.high = max(s.ratio * s.low, s.min_high)
                    if s.lead_in <= OOK_EST_LOW_RATIO:
                        s.lead_in += 1
            elif s.state == PULSE:
                s.plen += 1
                if am_n < thr - hyst:
                    if s.plen < PD_MIN_PULSE_SAMPLES:
                        if s.pkg["num"] <= 1:
                            s.state = IDLE
                        else:
                            eop_on_spurious = 1
                            s.state = GAP
                    else:
                        s.pkg["pulse"][s.pkg["num"]] = s.plen
                        s.max_pulse = max(s.plen, s.max_pulse)
                        s.plen = 0
                        s.state = GAP_START
                else:
                    s.high += tdiv(am_n, OOK_EST_HIGH_RATIO) - tdiv(s.high, OOK_EST_HIGH_RATIO)
                    s.high = max(s.high, s.min_high)
                    s.pkg["f1"] += tdiv(fm_buf[i], OOK_EST_HIGH_RATIO) - tdiv(s.pkg["f1"], OOK_EST_HIGH_RATIO)
                if s.pkg["num"] == 0:
                    if s.minmax:
                        s.fsk.minmax(fm_buf[i], s.fskpkg)
                    else:
                        s.fsk.classic(fm_buf[i], s.fskpkg)
            elif s.state == GAP_START:
                s.plen += 1
                if am_n > thr + hyst:
                    s.plen += s.pkg["pulse"][s.pkg["num"]]
                    s.state = PULSE
                elif s.plen >= PD_MIN_PULSE_SAMPLES:
                    s.state = GAP
                    if s.fskpkg["num"] > PD_MIN_PULSES:
                        r = s._publish_fsk(t0 + i, not s.minmax)
                        self.pkg["end"] = t0 + i
                        s.state = IDLE
                        return r
                if s.pkg["num"] == 0:
                    if s.minmax:
                        s.fsk.minmax(fm_buf[i], s.fskpkg)
                    else:
                        s.fsk.classic(fm_buf[i], s.fskpkg)
            elif s.state == GAP:
                s.plen += 1
                if am_n > thr + hyst:
                    s.pkg["gap"][s.pkg["num"]] = s.plen
                    s.pkg["num"] += 1
                    if s.pkg["num"] >= PD_MAX_PULSES:
                        s.state = IDLE
                        return s._publish_ook(t0 + i, length)
                    s.plen = 0
                    s.state = PULSE
                if (eop_on_spurious
                        or (s.plen > PD_MAX_GAP_RATIO * s.max_pulse
                            and s.plen > PD_MIN_GAP_MS * samples_per_ms)
                        or s.plen > PD_MAX_GAP_MS * samples_per_ms):
                    s.pkg["gap"][s.pkg["num"]] = s.plen
                    s.pkg["num"] += 1
                    s.state = IDLE
                    return s._publish_ook(t0 + i, length)
            # NOTE: the C while loop increments data_counter here; on the
            # return paths above it does NOT, so the EOP sample is
            # re-processed by the next call.
            s.data_counter += 1

        s.data_counter = 0
        return None
