"""Device-kernel slicing bank: batch (package, spec) slicing on the
accelerator, memo-compatible with the host dispatch.

The SURVEY row-9 integration: a drain's unique pulse trains are sliced
against the PPM / PWM / PCM spec families in three batched XLA kernel
calls (ops/slice.py) instead of per-train host loops; outputs are
serialized into the exact record format the native C++ bank emits
(native/slicers.cpp emit(), so decode caches and memo plans are shared
byte-for-byte), merged with the remaining spec families (native bank when
available, exact Python slicers otherwise), and planned into train memos
via Registry._memo_plans. Capacity- or float-boundary-flagged lanes fall
back to the host slicer per (train, spec), so the event stream is
bit-identical to host dispatch (tests/test_device_dispatch.py).

Reference dispatch semantics: src/r_api.c:438-550; slicer semantics:
src/pulse_slicer.c:68-449.
"""

from __future__ import annotations

import numpy as np

from ..pulse import slicers
from ..pulse.data import PulseData

# modulations with a device kernel
_FAM_MODS = {
    "ppm": ("OOK_PULSE_PPM",),
    "pwm": ("OOK_PULSE_PWM", "FSK_PULSE_PWM"),
    "pcm": ("OOK_PULSE_PCM", "OOK_PULSE_RZ", "FSK_PULSE_PCM"),
    "mc": ("OOK_PULSE_MANCHESTER_ZEROBIT",
           "FSK_PULSE_MANCHESTER_ZEROBIT"),
    "dmc": ("OOK_PULSE_DMC",),
    "piwm_dc": ("OOK_PULSE_PIWM_DC",),
    "nrzs": ("OOK_PULSE_NRZS",),
    "rzi": ("OOK_PULSE_RZI",),
    "osv1": ("OOK_PULSE_PWM_OSV1",),
}


def _serialize(nr, fr, bits_per_row, syncs, rows128):
    """Record bytes in the native arena layout (native/slicers.cpp:156-166):
    int32 nr, int32 fr, u16 bits[nr], u16 syncs[nr] (padded to 4),
    u8 bb[fr * 128]."""
    head = bytearray()
    head += int(nr).to_bytes(4, "little")
    head += int(fr).to_bytes(4, "little")
    head += np.asarray(bits_per_row[:nr], "<u2").tobytes()
    head += np.asarray(syncs[:nr], "<u2").tobytes()
    if (4 * nr) & 3:
        head += b"\x00\x00"
    return bytes(head) + np.asarray(rows128[:fr], np.uint8).tobytes()


def serialize_bitbuffer(bb) -> bytes:
    nr = bb.num_rows
    fr = min(max(bb.free_row, nr), bb.bb.shape[0])
    return _serialize(nr, fr, np.asarray(bb.bits_per_row, "<u2"),
                      np.asarray(bb.syncs_before_row, "<u2"), bb.bb)


def _bucket(n, lo=64):
    b = lo
    while b < n:
        b *= 2
    return b


class DeviceBank:
    """SlicerBank-compatible bank whose slicing runs as batched device
    kernels for the PPM/PWM/PCM families."""

    def __init__(self, devices, sample_rate: int,
                 pcm_caps=None, ppm_caps=None):
        from ..ops.slice import (SliceCaps, dmc_bounds, mc_bounds,
                                 nrzs_bounds, osv1_bounds, pcm_bounds,
                                 piwm_dc_bounds, ppm_bounds, pwm_bounds,
                                 rzi_bounds)
        self.devices = list(devices)
        self.sample_rate = sample_rate
        self.meta = None
        self.fams = []
        mod_to_fam = {m: f for f, mods in _FAM_MODS.items() for m in mods}
        fam_idx = {f: [] for f in _FAM_MODS}
        self.rest_idx = []
        for i, d in enumerate(self.devices):
            f = mod_to_fam.get(d.modulation)
            if f is not None and d.decode_fn is not None:
                fam_idx[f].append(i)
            else:
                self.rest_idx.append(i)
        caps_small = ppm_caps or SliceCaps(events=4, rows=16, row_bytes=20)
        caps_pcm = pcm_caps or SliceCaps(events=4, rows=16, row_bytes=40)
        caps_mc = SliceCaps(events=8, rows=24, row_bytes=20)
        for fam, builder, caps in (
                ("ppm", ppm_bounds, caps_small),
                ("pwm", pwm_bounds, caps_small),
                ("pcm", pcm_bounds, caps_pcm),
                ("mc", mc_bounds, caps_mc),
                ("dmc", dmc_bounds, caps_mc),
                ("piwm_dc", piwm_dc_bounds, caps_mc),
                ("nrzs", nrzs_bounds, caps_pcm),
                ("rzi", rzi_bounds, caps_pcm),
                ("osv1", osv1_bounds, caps_pcm)):
            idx = fam_idx[fam]
            if idx:
                bounds = builder([self.devices[i] for i in idx],
                                 sample_rate)
                self.fams.append((fam, np.asarray(idx, np.int32),
                                  bounds, caps))
        self._restbank = None
        self._restbank_tried = False

    # -- rest-family slicing (native bank when available) ----------------

    def _rest_records(self, pulse, gap):
        """[(full_spec_idx, record_bytes), ...] for non-kernel specs,
        ordered by spec then temporal."""
        if not self.rest_idx:
            return []
        if not self._restbank_tried:
            self._restbank_tried = True
            from ..pulse import native_slicers
            if native_slicers.available():
                self._restbank = native_slicers.SlicerBank(
                    [self.devices[i] for i in self.rest_idx],
                    self.sample_rate)
        out = []
        if self._restbank is not None:
            summary, _ = self._restbank.slice(pulse, gap)
            for row in summary:
                out.append((self.rest_idx[int(row[0])],
                            self._restbank.record_bytes(int(row[1]))))
            return out
        pd = PulseData(sample_rate=self.sample_rate)
        pd.pulse = pulse.tolist()
        pd.gap = gap.tolist()
        for i in self.rest_idx:
            for bb in slicers.slice_pulses(pd, self.devices[i]):
                out.append((i, serialize_bitbuffer(bb)))
        return out

    def _host_lane(self, pulse, gap, dev):
        """Exact host slicing for a flagged (train, spec) lane."""
        pd = PulseData(sample_rate=self.sample_rate)
        pd.pulse = pulse.tolist()
        pd.gap = gap.tolist()
        return [serialize_bitbuffer(bb)
                for bb in slicers.slice_pulses(pd, dev)]

    # -- the batched kernel pass ------------------------------------------

    def batch_slice(self, trains):
        """Slice every train against every spec; one kernel call per family.

        ``trains`` is a list of (pulse int32[n], gap int32[n]). Returns a
        list (per train) of (summary int32[k,4], records {off: bytes}) in
        the native bank's layout/order contract.
        """
        from ..ops.slice import (slice_dmc, slice_mc, slice_nrzs,
                                 slice_osv1, slice_pcm, slice_piwm_dc,
                                 slice_ppm, slice_pwm, slice_rzi)
        kernels = {"ppm": slice_ppm, "pwm": slice_pwm, "pcm": slice_pcm,
                   "mc": slice_mc, "dmc": slice_dmc,
                   "piwm_dc": slice_piwm_dc, "nrzs": slice_nrzs,
                   "rzi": slice_rzi, "osv1": slice_osv1}

        B = len(trains)
        if B == 0:
            return []
        n_max = max(len(p) for p, _ in trains)
        N = _bucket(max(n_max, 1))
        Bpad = _bucket(B, lo=8)
        pulse = np.zeros((Bpad, N), np.int32)
        gap = np.zeros((Bpad, N), np.int32)
        n_pulses = np.zeros((Bpad,), np.int32)
        for b, (p, g) in enumerate(trains):
            pulse[b, :len(p)] = p
            gap[b, :len(g)] = g
            n_pulses[b] = len(p)

        fam_outs = []
        for fam, idx, bounds, caps in self.fams:
            out = kernels[fam](pulse, gap, n_pulses, bounds, caps)
            fam_outs.append((fam, idx, caps,
                             {k: np.asarray(v) for k, v in out.items()}))

        results = []
        for b, (p, g) in enumerate(trains):
            entries = []  # (full_spec, seq, bytes)
            for fam, idx, caps, out in fam_outs:
                ovf = out["ovf"][b]
                n_ev = out["n_events"][b]
                for j, full in enumerate(idx.tolist()):
                    if ovf[j]:
                        for e, blob in enumerate(
                                self._host_lane(p, g, self.devices[full])):
                            entries.append((full, e, blob))
                        continue
                    for e in range(int(n_ev[j])):
                        nr = int(out["num_rows"][b, j, e])
                        rows = np.zeros((nr, 128), np.uint8)
                        rows[:, :caps.row_bytes] = out["bytes"][b, j, e, :nr]
                        blob = _serialize(
                            nr, nr, out["bits_per_row"][b, j, e],
                            out["syncs"][b, j, e], rows)
                        entries.append((full, e, blob))
            for k, (full, blob) in enumerate(self._rest_records(
                    np.asarray(p, np.int32), np.asarray(g, np.int32))):
                entries.append((full, k, blob))
            entries.sort(key=lambda t: (t[0], t[1]))
            # content-dedup into offsets + summary rows
            by_content = {}
            records = {}
            summary = np.zeros((len(entries), 4), np.int32)
            for r, (full, _seq, blob) in enumerate(entries):
                off = by_content.get(blob)
                if off is None:
                    off = len(records)
                    by_content[blob] = off
                    records[off] = blob
                nr = int(np.frombuffer(blob[:4], np.int32)[0])
                bits = np.frombuffer(blob[8:8 + 2 * nr], "<u2")
                summary[r] = (full, off, nr,
                              int(bits.max()) if nr else 0)
            results.append((summary, records))
        return results
