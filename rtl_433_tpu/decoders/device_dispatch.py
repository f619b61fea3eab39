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


def _snap_record(snap, off):
    """record_bytes from an arena snapshot (native_slicers.py layout)."""
    nr = int(snap[off:off + 4].view(np.int32)[0])
    fr = int(snap[off + 4:off + 8].view(np.int32)[0])
    head = 8 + ((4 * nr + 3) & ~3)
    return snap[off: off + head + fr * 128].tobytes()


_gather_jit = None


def _gather_records(bytes_dev, syncs_dev, bs, js, es):
    """Jitted (record) gather: one compiled executable per bucketed index
    length instead of an eager op chain per call."""
    global _gather_jit
    import jax
    if _gather_jit is None:
        _gather_jit = jax.jit(
            lambda by, sy, b, j, e: (by[b, j, e], sy[b, j, e]))
    return _gather_jit(bytes_dev, syncs_dev, bs, js, es)


def _content_dup(out):
    """Device-side per-(train, spec) content dedup: dup[b, j, e] = first
    event index e' <= e whose record content (row count, per-row bit
    counts, syncs, row bytes) is identical to e's. Exact compares — no
    hashing — so grouping by the dup representative preserves the byte
    -level dedup semantics without transferring any record bytes."""
    import jax.numpy as jnp
    nb = out["bytes"]                 # [B, J, E, R, W] uint8
    nr = out["num_rows"]              # [B, J, E]
    bpr = out["bits_per_row"]         # [B, J, E, R]
    sy = out["syncs"]                 # [B, J, E, R]
    R = nb.shape[3]
    rows_ok = jnp.arange(R)[None, None, None, :] < nr[..., None]
    # pairwise (e, e') equality; rows at index >= num_rows are scratch
    # and masked out of the compare
    eq = nr[:, :, :, None] == nr[:, :, None, :]
    pad_ok = ~rows_ok[:, :, :, None, :]                 # [B, J, E, 1, R]
    eq &= ((bpr[:, :, :, None, :] == bpr[:, :, None, :, :])
           | pad_ok).all(-1)
    eq &= ((sy[:, :, :, None, :] == sy[:, :, None, :, :])
           | pad_ok).all(-1)
    beq = (nb[:, :, :, None] == nb[:, :, None, :]).all(-1)  # [B,J,E,E,R]
    eq &= (beq | pad_ok).all(-1)
    # only e' <= e counts; diagonal is always True so argmax is the first
    E = nb.shape[2]
    tri = jnp.arange(E)[None, :] >= jnp.arange(E)[:, None]  # e >= e'
    eq &= tri[None, None]
    return jnp.argmax(eq, axis=3).astype(jnp.int32)


# LazyRecords source kinds (columns in src_kind)
_SRC_EAGER = -1      # src_a indexes eager_blobs
_SRC_SNAP = -2       # src_a indexes snaps, src_b is the arena offset
# src_kind >= 0      # family index into fam_outs; (src_a, src_b) = (j, e)


class LazyRecords:
    """``{off: record_bytes}`` mapping whose kernel/native records
    serialize on first access.

    The cold-drain wall (round-4 profile) was serializing EVERY sliced
    record into bytes up front — ~6.5k records/train, of which the
    dispatch gates (decoders/gates.py) immediately discard all but a few
    dozen. Records therefore stay as (source, index) descriptors until a
    surviving candidate actually needs its bytes (decode-cache key, MIC
    gate, materialize); :meth:`freeze` then drops the bulky kernel-output
    references once the dispatch plan is built, keeping only the bytes the
    plan can ever touch.
    """

    __slots__ = ("_ready", "_kind", "_a", "_b", "_fams", "_snaps",
                 "_eager", "_train")

    def __init__(self, kind, a, b, fams, snaps, eager, train):
        self._ready = {}
        self._kind = kind
        self._a = a
        self._b = b
        self._fams = fams          # [(out, caps)] kernel outputs
        self._snaps = snaps        # [np.uint8 arena snapshot]
        self._eager = eager        # [bytes]
        self._train = train        # train index b into the kernel outputs

    def __getitem__(self, off):
        blob = self._ready.get(off)
        if blob is None:
            k = int(self._kind[off])
            if k == _SRC_EAGER:
                blob = self._eager[self._a[off]]
            elif k == _SRC_SNAP:
                blob = _snap_record(self._snaps[self._a[off]],
                                    int(self._b[off]))
            else:
                out, caps = self._fams[k]
                b, j, e = self._train, int(self._a[off]), int(self._b[off])
                nr = int(out["num_rows"][b, j, e])
                rows = np.zeros((nr, 128), np.uint8)
                rows[:, :caps.row_bytes] = out["bytes"][b, j, e, :nr]
                blob = _serialize(nr, nr, out["bits_per_row"][b, j, e],
                                  out["syncs"][b, j, e], rows)
            self._ready[off] = blob
        return blob

    def freeze(self, needed):
        """Materialize ``needed`` offsets, drop every source reference."""
        LazyRecords.freeze_many([(self, needed)])

    def materialize_many(self, offs):
        """Batch-materialize offsets without dropping the sources."""
        LazyRecords._materialize([(self, offs)])

    @staticmethod
    def freeze_many(items):
        """Batch-freeze across a whole drain: ONE jitted device gather +
        ONE transfer per kernel family for every surviving record of every
        train, instead of per-record (or even per-train) device
        round-trips — eager dispatch costs ~0.5 ms per op on CPU and a
        DMA each on TPU. ``items`` is [(LazyRecords, needed_offs)]."""
        LazyRecords._materialize(items)
        for rec, _needed in items:
            rec._kind = rec._a = rec._b = None
            rec._fams = rec._snaps = rec._eager = None

    @staticmethod
    def _materialize(items):
        by_fam = {}    # fams identity -> fam idx -> [(rec, off, b, j, e)]
        for rec, needed in items:
            for off in needed:
                if off in rec._ready:
                    continue
                k = int(rec._kind[off])
                if k >= 0:
                    fams_groups = by_fam.setdefault(id(rec._fams), {})
                    fams_groups.setdefault(k, []).append(
                        (rec, off, rec._train, int(rec._a[off]),
                         int(rec._b[off])))
                else:
                    rec[off]     # snap/eager: host-side, already cheap
        for rec, _needed in items:
            if rec._fams is None:
                continue
            groups = by_fam.pop(id(rec._fams), None)
            if not groups:
                continue
            fams = rec._fams
            for k, entries in groups.items():
                out, caps = fams[k][0], fams[k][1]
                n = len(entries)
                P = _bucket(n, lo=8)
                bs = np.zeros(P, np.int32)
                js = np.zeros(P, np.int32)
                es = np.zeros(P, np.int32)
                for i, (_r, _o, b, j, e) in enumerate(entries):
                    bs[i], js[i], es[i] = b, j, e
                bytes_np, syncs_np = _gather_records(
                    out["bytes"], out["syncs"], bs, js, es)
                bytes_np = np.asarray(bytes_np)
                syncs_np = np.asarray(syncs_np)
                for i, (r, off, b, j, e) in enumerate(entries):
                    nr = int(out["num_rows"][b, j, e])
                    rows = np.zeros((nr, 128), np.uint8)
                    rows[:, :caps.row_bytes] = bytes_np[i, :nr]
                    r._ready[off] = _serialize(
                        nr, nr, out["bits_per_row"][b, j, e],
                        syncs_np[i], rows)


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
        self._ovf_banks = {}

    # -- host-exact fallback slicing (native bank when available) --------

    def _get_ovf_bank(self, key):
        """Native bank over the flagged spec subset, cached per subset
        (cold drains flag a stable set, so this compiles once)."""
        from ..pulse import native_slicers
        if not native_slicers.available():
            return None
        bank = self._ovf_banks.get(key)
        if bank is None:
            if len(self._ovf_banks) >= 16:
                self._ovf_banks.clear()
            bank = native_slicers.SlicerBank(
                [self.devices[i] for i in key], self.sample_rate)
            self._ovf_banks[key] = bank
        return bank

    def _native_piece(self, bank, full_map, pulse, gap, snaps):
        """Slice one train on a native bank; return lazy summary columns.

        The bank's arena is reused across calls, so the used prefix is
        snapshotted; records parse out of the snapshot on demand
        (:class:`LazyRecords`)."""
        summary, arena = bank.slice(pulse, gap)
        k = len(summary)
        if k == 0:
            return None
        offs = summary[:, 1].astype(np.int64)
        last = int(offs.max())
        nr_l = int(arena[last:last + 4].view(np.int32)[0])
        fr_l = int(arena[last + 4:last + 8].view(np.int32)[0])
        used = last + 8 + ((4 * nr_l + 3) & ~3) + fr_l * 128
        snaps.append(arena[:used].copy())
        sid = len(snaps) - 1
        spec_l = summary[:, 0]
        # seq = occurrence index within spec (rows are spec-major temporal)
        starts = np.r_[0, np.flatnonzero(np.diff(spec_l)) + 1]
        runlen = np.diff(np.r_[starts, k])
        seq = np.arange(k, dtype=np.int64) - np.repeat(starts, runlen)
        # the native arena is content-unique per train, so the arena
        # offset doubles as the content-group id
        return (np.asarray(full_map, np.int64)[spec_l], seq,
                summary[:, 2].astype(np.int64),
                summary[:, 3].astype(np.int64),
                np.full(k, _SRC_SNAP, np.int64),
                np.full(k, sid, np.int64), offs, offs)

    def _python_rows(self, pulse, gap, fulls, eager):
        """Exact Python slicing for ``fulls`` (native lib unavailable):
        eager per-record columns."""
        pd = PulseData(sample_rate=self.sample_rate)
        pd.pulse = pulse.tolist()
        pd.gap = gap.tolist()
        cols = []
        for full in fulls:
            for e, bb in enumerate(slicers.slice_pulses(
                    pd, self.devices[full])):
                nr = bb.num_rows
                mb = max((int(x) for x in bb.bits_per_row[:nr]), default=0)
                eager.append(serialize_bitbuffer(bb))
                one = np.ones(1, np.int64)
                cols.append((one * full, one * e, one * nr, one * mb,
                             one * _SRC_EAGER, one * (len(eager) - 1),
                             one * 0, one * (len(eager) - 1)))
        return cols

    def _rest_cols(self, pulse, gap, snaps, eager):
        """Lazy summary columns for the non-kernel spec families."""
        if not self.rest_idx:
            return []
        if not self._restbank_tried:
            self._restbank_tried = True
            from ..pulse import native_slicers
            if native_slicers.available():
                self._restbank = native_slicers.SlicerBank(
                    [self.devices[i] for i in self.rest_idx],
                    self.sample_rate)
        if self._restbank is not None:
            piece = self._native_piece(self._restbank, self.rest_idx,
                                       pulse, gap, snaps)
            return [piece] if piece is not None else []
        return self._python_rows(pulse, gap, self.rest_idx, eager)

    # -- the batched kernel pass ------------------------------------------

    def batch_slice(self, trains):
        """Slice every train against every spec; one kernel call per family.

        ``trains`` is a list of (pulse int32[n], gap int32[n]). Returns a
        list (per train) of (summary int32[k,4], records) in the native
        bank's layout/order contract, where ``records`` is a
        :class:`LazyRecords` off->bytes mapping: summary rows (the gate
        inputs) are assembled vectorized from the kernel outputs, and
        record BYTES serialize only when a gate-surviving candidate needs
        them (``Registry._memo_plans`` groups live rows by content, so the
        native path's content-dedup semantics are preserved exactly).
        Capacity- or boundary-flagged lanes fall back to one native-bank
        pass per train (exact host semantics), Python slicers without the
        native lib.
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
            # only the small summary planes transfer to the host eagerly;
            # the record payloads ("bytes", "syncs" — the bulk of the
            # kernel output) stay on device and move per RECORD, and only
            # for candidates that survive the gates (LazyRecords): the
            # wholesale np.asarray of "bytes" was ~90% of the drain's
            # host time (and, on TPU, a giant needless DMA). Content
            # dedup likewise runs ON DEVICE (the "dup" plane) so the host
            # can group identical events without touching their bytes.
            out = dict(out)
            out["dup"] = _content_dup(out)
            for k in ("ovf", "n_events", "num_rows", "bits_per_row",
                      "dup"):
                out[k] = np.asarray(out[k])
            fam_outs.append((fam, idx, caps, out))
        rec_fams = [(out, caps) for _fam, _idx, caps, out in fam_outs]

        results = []
        for b, (p, g) in enumerate(trains):
            cols = []     # (full, seq, num_rows, max_bits, kind, a, b)
            snaps = []
            eager = []
            fallback = []
            for fi, (fam, idx, caps, out) in enumerate(fam_outs):
                ovf = np.asarray(out["ovf"][b], bool)
                n_ev = out["n_events"][b]
                E = out["num_rows"].shape[2]
                livem = (~ovf)[:, None] & \
                    (np.arange(E)[None, :] < n_ev[:, None])
                js, es = np.nonzero(livem)
                if js.size:
                    nr = out["num_rows"][b][js, es]
                    mb = out["bits_per_row"][b][js, es].max(axis=1)
                    cols.append((idx[js].astype(np.int64),
                                 es.astype(np.int64),
                                 nr.astype(np.int64), mb.astype(np.int64),
                                 np.full(js.size, fi, np.int64),
                                 js.astype(np.int64), es.astype(np.int64),
                                 out["dup"][b][js, es].astype(np.int64)))
                fallback += [int(idx[j]) for j in np.flatnonzero(ovf)]
            if fallback:
                fallback.sort()
                bank = self._get_ovf_bank(tuple(fallback))
                if bank is not None:
                    piece = self._native_piece(bank, fallback, p, g, snaps)
                    if piece is not None:
                        cols.append(piece)
                else:
                    cols += self._python_rows(p, g, fallback, eager)
            cols += self._rest_cols(np.asarray(p, np.int32),
                                    np.asarray(g, np.int32), snaps, eager)
            if not cols:
                empty = np.zeros(0, np.int64)
                results.append((np.zeros((0, 4), np.int32),
                                LazyRecords(empty, empty, empty,
                                            rec_fams, snaps, eager, b),
                                np.zeros(0, np.int32)))
                continue
            full = np.concatenate([c[0] for c in cols])
            seq = np.concatenate([c[1] for c in cols])
            nr = np.concatenate([c[2] for c in cols])
            mb = np.concatenate([c[3] for c in cols])
            kind = np.concatenate([c[4] for c in cols])
            sa = np.concatenate([c[5] for c in cols])
            sb = np.concatenate([c[6] for c in cols])
            gd = np.concatenate([c[7] for c in cols])
            order = np.lexsort((seq, full))
            k = len(order)
            summary = np.stack(
                [full[order], np.arange(k, dtype=np.int64),
                 nr[order], mb[order]], axis=1).astype(np.int32)
            records = LazyRecords(kind[order], sa[order], sb[order],
                                  rec_fams, snaps, eager, b)
            # content-group representative per position: first position
            # sharing (spec, source, content-id) — kernel content ids come
            # from the on-device dup plane, native ones from the
            # content-unique arena offset
            gkeys = np.stack([full[order], kind[order], sa[order],
                              gd[order]], axis=1)
            _uniq, inv = np.unique(gkeys, axis=0, return_inverse=True)
            first = np.full(len(_uniq), k, np.int64)
            np.minimum.at(first, inv, np.arange(k))
            group_of = first[inv].astype(np.int32)
            results.append((summary, records, group_of))
        return results
