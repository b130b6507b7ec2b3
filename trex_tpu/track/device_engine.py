"""DeviceTracker — the TPU-resident product tracking engine.

`track_engine=device` routes the per-frame tracking recurrence through
ops/device_tracker.track_scan (a jitted `lax.scan` on the accelerator)
while keeping FastTracker byte-compatibility: frames the scan flags
`needs_host` are replayed ONE FRAME AT A TIME through a host
FastTracker whose per-fish state is spliced in from the device carry,
and the scan resumes from the corrected carry at the next frame
(VERDICT r2 "per-frame host replay", not the whole-chunk fallback).
On the fused raw-frames path, history splits themselves run ON DEVICE
(ops/device_split: exact expectation + threshold-escalation executor),
so the assist is reserved for marginal float decisions, capacity
overflows, start-frame big-blob splits, and `huge` parents.

Two ingestion paths:

- `add_frame_blobs` / `finalize`: the TrackingState pull loop (pv
  re-track). Host builds the engine's candidate table per frame
  (engine.build_candidates — exact semantics incl. track-threshold
  children), ships compact blob tables to the device, chunk-scans.
- `track_frames`: raw frame batches (convert/bench path). Detection
  runs fused on-device (ops/runcc) and only flagged frames are
  labeled on the host.

The per-fish state splice reconstructs the FastTracker's tracklet
bookkeeping from the scan's seen-ring: `Individual.recent_number_
samples` (Individual.cpp:1802-1838) only reads tracklet spans clipped
to the last `frame_rate` frames, which the ring covers exactly, so
the walk and the ring agree wherever the scan itself is exact (the
differential guarantee of tests/test_device_tracker.py).
"""
from __future__ import annotations

import time as _time

import numpy as np

from .engine import EngineUnsupported, FastTracker
from .tracker import FrameStatistics


def check_device_supported(settings) -> None:
    s = settings
    if s["match_mode"] not in ("approximate", "automatic", "hungarian",
                               "tree"):
        raise EngineUnsupported(
            "device engine implements match_mode approximate/"
            "automatic/hungarian/tree (benchmark needs the host "
            "engines)")
    if s["calculate_posture"] and int(s["posture_closing_steps"]):
        raise EngineUnsupported(
            "posture_closing_steps needs the per-blob host chain "
            "(track_engine=object)")


def _rebuild_dacc(win: np.ndarray, got: np.ndarray, frame: int,
                  prev_dacc: np.ndarray, frame_times: dict,
                  settings) -> np.ndarray:
    """Accumulated-chain-walk section after a host assist: assigned
    fish reset; for unassigned fish recompute the EXACT f64 walk up
    through `frame` (full walk to query=frame+1 minus the first term
    = walk to query=prev+1), which also acts as an error barrier —
    the err column restarts at packing scale. `win` is the device
    (F, W, 5) window [frame, x, y, time, global step]; the scalar
    walk consumes the [:, :4] columns."""
    from .cache_batch import window_estimate_scalar

    dacc = np.asarray(prev_dacc).copy()
    dacc[got] = 0.0
    for fi in np.flatnonzero(~got):
        row = win[fi]
        pf = row[row[:, 0] > -1e8]
        if not len(pf):
            continue
        prev_f = int(pf[-1, 0])
        if prev_f >= frame:  # no gap to walk
            continue
        w4 = row[:, :4]
        fx, fy = window_estimate_scalar(
            w4, -(10 ** 9), frame + 1, 0.0, frame_times, settings)
        tx, ty = window_estimate_scalar(
            w4, -(10 ** 9), prev_f + 1, 0.0, frame_times, settings)
        dacc[fi, 0] = fx - tx
        dacc[fi, 1] = fy - ty
        dacc[fi, 2] = 4.0 * 1.1920929e-07 * (
            abs(dacc[fi, 0]) + abs(dacc[fi, 1]) + 1.0)
    return dacc


def _probs_for(h, fish) -> np.ndarray:
    """Per-fid assignment probabilities from a helper history record
    (-1 = unknown, the host Tracker's no-probability sentinel)."""
    if h is None:
        return np.full(len(fish), -1.0)
    lut = {int(fi): float(p) for fi, p in zip(h["fish"], h["prob"])}
    return np.array([lut.get(int(fi), -1.0) for fi in fish])


class DeviceTracker:
    """FastTracker-compatible surface backed by the device scan."""

    CHUNK = 256

    def __init__(self, settings, background: np.ndarray,
                 chunk: int = None, caps: dict = None,
                 split_caps: dict = None,
                 keep_individuals: bool = False,
                 posture_two_stage: bool = False):
        from ..ops.device_tracker import (default_split_spec,
                                          params_from_settings)

        check_device_supported(settings)
        self.settings = settings
        self.background = np.asarray(background)
        self.caps = caps
        # archive mode (see FastTracker): per-frame assignment blobs +
        # full posture geometry so build_individuals can feed the full
        # export surface. Committed device frames archive from the
        # host-built candidate tables via the scan's fish_row output;
        # assist/demoted frames archive inside the helper engine.
        self.archive_mode = bool(keep_individuals)
        self.frame_archive: dict[int, tuple] = {}
        self.posture_archive: dict[int, list] = {}
        self._individuals_cache = None
        self.predicted: dict[int, dict] = {}
        self.tag_assignments: dict[int, dict] = {}
        self.P = params_from_settings(settings)
        # on-device HistorySplit executor for the fused frames path
        # (the pv/blob path ships no pixel data to the device, so its
        # splits stay host-assisted)
        self.split_spec = default_split_spec(settings, self.P,
                                             split_caps)
        # on-device posture for the fused frames path (the pv path
        # runs the same native batch chain host-side per chunk).
        # posture_two_stage compiles tracking and posture as separate
        # device-resident programs — the counter to the relay's
        # composed-program while-loop pathology (ROUND3_NOTES.md)
        self.posture_two_stage = bool(posture_two_stage)
        self.posture_spec = None
        if self.P.do_posture:
            from ..ops.device_posture import (
                spec_from_settings as posture_spec_from_settings)

            self.posture_spec = posture_spec_from_settings(
                settings, crop_h=96, crop_w=96)
        self.posture_history: dict[int, dict] = {}
        self.F = self.P.max_fish
        self.chunk = chunk or self.CHUNK
        # host helper: candidate tables + history split + replay
        self._helper = FastTracker(settings, self.background,
                                   keep_individuals=keep_individuals)
        self._helper_dirty = True
        self.frame_rate = self._helper.frame_rate

        self.start_frame = -1
        self.end_frame = -1
        self.n_fish = 0
        self.history: dict[int, dict] = {}
        self.statistics: dict[int, FrameStatistics] = {}
        self.frame_times: dict[int, float] = {}
        self.assist_frames: list[int] = []

        # adaptive demotion: every assist costs a host replay PLUS a
        # fresh device relaunch for the rest of the chunk, so a high
        # assist rate makes the hybrid path far slower than the plain
        # host engine (each relaunch pays the accelerator link's
        # per-transfer latency). When the observed assist fraction
        # crosses the threshold, the engine demotes — the spliced
        # host FastTracker (the same one the assist replays through)
        # tracks all remaining frames directly, which is frame-exact
        # by construction and bounded below by host-engine speed.
        self.demote_threshold = 0.25
        # judge the rate over a real sample: startup frames cluster
        # assists (creations, first crossings) and a 16-frame window
        # demoted runs whose steady-state rate was under 10%
        self.demote_min_frames = 64
        self.demoted = False
        self._frames_done = 0

        self._carry_vec = None
        self._buf: list[tuple[int, float, list]] = []  # pv path

    # -- carry helpers ---------------------------------------------------
    # the carry lives HOST-side as one packed float32 vector
    # (ops/device_tracker.carry_to_vec layout); the device link moves
    # exactly one array per direction per chunk — the accelerator
    # tunnel's per-transfer latency makes a dict of small arrays ~17x
    # more expensive than the same bytes packed (measured round 3).

    def _ensure_carry(self, frame: int, time: float):
        if self._carry_vec is None:
            from ..ops.device_tracker import DECAY_WIN, carry_to_vec

            self.start_frame = frame
            F = self.F
            c = dict(
                last_x=np.zeros(F), last_y=np.zeros(F),
                last_time=np.zeros(F),
                last_frame=np.full(F, -(10 ** 9), np.float64),
                n_basic=np.zeros(F),
                seen=np.zeros((F, self.P.frame_rate)),
                n_fish=0, start_frame=frame, prev_time=time)
            if self.P.do_decay:
                win = np.zeros((F, DECAY_WIN, 5))
                win[:, :, 0] = -1e9
                c["win"] = win
            if self.P.do_posture:
                c["posture_dir"] = np.zeros((F, 2))
            self._carry_vec = carry_to_vec(c)

    @staticmethod
    def _resilient_get(launch):
        """Run a jitted scan launch and fetch its packed result
        through the shared relay-corruption retry guard
        (ops/device_tracker.launch_resilient); the sticky shape bucket
        in _flush keeps this to at most one retry per bucket-growth
        event."""
        import jax

        from ..ops.device_tracker import launch_resilient

        return launch_resilient(
            lambda: np.asarray(jax.device_get(launch())))

    # -- pv / blob-list ingestion ---------------------------------------

    def add_frame_blobs(self, frame: int, time: float, blobs: list):
        self._buf.append((frame, time, blobs))
        self.frame_times[frame] = time
        if len(self._buf) >= self.chunk:
            self._flush()

    def finalize(self):
        if self._buf:
            self._flush()
        return self

    def _tables_from_blobs(self, blobs: list):
        """engine.build_candidates over TrackBlob-likes -> (table,
        big_rows, raw arrays for the assist replay, per-source-row
        predictions or None)."""
        import ctypes

        eng = self._helper
        n = len(blobs)
        preds = None
        if self.archive_mode:
            preds = [getattr(b, "prediction", None) for b in blobs]
            if not any(p is not None for p in preds):
                preds = None
        if n == 0:
            z = (np.zeros((0, 3), np.int32), np.zeros(0, np.uint8),
                 np.zeros(1, np.int64), np.zeros(1, np.int64),
                 np.zeros((0, 8)))
            t, big = eng.build_candidates(*z)
            return t, big, z, preds
        lines = np.concatenate([np.asarray(b.lines, np.int32)
                                for b in blobs])
        have_px = all(b.pixels is not None for b in blobs)
        pixels = np.concatenate([b.pixels for b in blobs]) \
            if have_px else np.zeros(0, np.uint8)
        line_start = np.zeros(n + 1, np.int64)
        np.cumsum([len(b.lines) for b in blobs], out=line_start[1:])
        if have_px:
            pixel_start = np.zeros(n + 1, np.int64)
            np.cumsum([len(b.pixels) for b in blobs],
                      out=pixel_start[1:])
        else:
            pixel_start = np.full(n + 1, -1, np.int64)
        if all(b.stats is not None for b in blobs):
            stats = np.stack([b.stats for b in blobs])
        else:
            if not have_px:
                raise EngineUnsupported("blobs without pixels or stats")
            from ..ops.labeling import _lib

            eng = self._helper
            stats = np.zeros((n, 8))
            f64p = ctypes.POINTER(ctypes.c_double)
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            h, w = self.background.shape[:2]
            _lib().trex_blob_stats(
                np.ascontiguousarray(lines).ctypes.data_as(i32p),
                line_start.ctypes.data_as(i64p),
                np.ascontiguousarray(pixels).ctypes.data_as(
                    ctypes.c_char_p),
                pixel_start.ctypes.data_as(i64p), n,
                np.ascontiguousarray(
                    self.background).ctypes.data_as(ctypes.c_char_p),
                w, h, eng.track_thr, 1 if eng.absolute else 0,
                stats.ctypes.data_as(f64p))
        raw = (lines, pixels, line_start, pixel_start, stats)
        table, big = self._helper.build_candidates(*raw)
        return table, big, raw, preds

    @staticmethod
    def _need_rows(tables: list, use_runs: bool):
        """(B, R) row capacities the packed det array needs for these
        tables: max blob count and max total run count per frame."""
        B = max(1, max((t[0].n for t in tables), default=1))
        R = 0
        if use_runs:
            R = 1
            for t, *_ in tables:
                tot = 0
                for r in range(t.n):
                    if t.objs[r] is not None:
                        tot += len(t.objs[r].lines)
                    else:
                        tot += int(t.line_hi[r] - t.line_lo[r])
                R = max(R, tot)
        return B, R

    def _det_packed_from_tables(self, tables: list, pad_rows=None,
                                pad_frames: int = 0,
                                fix_rows: tuple = None):
        """Pad per-frame _CandTables into the packed det array
        (T, 6B [+4R]) consumed by ops/device_tracker.scan_packed.
        pad_rows (callable) buckets B and R (e.g. next power of two)
        and pad_frames pads T; fix_rows=(B, R) pins the row buckets
        outright. ONE fixed shape per flush (not a shrinking ladder)
        keeps exactly one compiled program alive — the axon
        remote-compile relay has been observed to corrupt a program's
        executable once a second, near-identical shape of the same
        scan is compiled (second execution fails with a buffer-count
        mismatch), and a single bucket also avoids the recompiles."""
        T = max(len(tables), pad_frames)
        use_runs = self.P.do_history_split and self.P.split_radius > 0
        if fix_rows is not None:
            B, R = fix_rows
        else:
            B, R = self._need_rows(tables, use_runs)
            if pad_rows is not None:
                B = pad_rows(B)
                if use_runs:
                    R = pad_rows(R)
        packed = np.zeros((T, 6 * B + 4 * R), np.float32)
        if use_runs:
            packed[:, 6 * B:6 * B + R] = -1          # runs_y pad
            packed[:, 6 * B + 3 * R:] = B            # runs_slot pad
        sq = self.P.cm_per_pixel * self.P.cm_per_pixel
        for i, (t, *_) in enumerate(tables):
            n = t.n
            if not n:
                continue
            packed[i, 0 * B:0 * B + n] = t.cx
            packed[i, 1 * B:1 * B + n] = t.cy
            packed[i, 2 * B:2 * B + n] = (t.bx0 + t.bx1 + 1) * 0.5
            packed[i, 3 * B:3 * B + n] = (t.by0 + t.by1 + 1) * 0.5
            packed[i, 4 * B:4 * B + n] = t.recount / sq
            packed[i, 5 * B:5 * B + n] = 1.0
            if use_runs:
                off = 0
                for r in range(n):
                    L = np.asarray(t.objs[r].lines) \
                        if t.objs[r] is not None \
                        else t.lines[t.line_lo[r]:t.line_hi[r]]
                    m = len(L)
                    base = 6 * B
                    packed[i, base + off:base + off + m] = L[:, 0]
                    packed[i, base + R + off:base + R + off + m] = \
                        L[:, 1]
                    packed[i, base + 2 * R + off:
                           base + 2 * R + off + m] = L[:, 2]
                    packed[i, base + 3 * R + off:
                           base + 3 * R + off + m] = r
                    off += m
        return packed, B, R

    def _flush(self):
        import jax
        import jax.numpy as jnp

        from ..ops.device_tracker import (make_aux, scan_packed,
                                          unpack_result)

        buf, self._buf = self._buf, []
        frames = [f for f, _, _ in buf]
        times = [t for _, t, _ in buf]
        self._ensure_carry(frames[0], times[0])
        tables = [self._tables_from_blobs(blobs)
                  for _, _, blobs in buf]

        def pow2(n):
            return 1 << max(0, int(np.ceil(np.log2(max(1, n)))))

        # one sticky (T, B, R) bucket for the whole flush (and
        # monotone across flushes): every splice iteration re-scans
        # the same shapes, so exactly ONE compiled program serves the
        # chunk (see _det_packed_from_tables on why the ladder of
        # shrinking shapes is unsafe on the relay backend, besides
        # costing a compile per rung)
        use_runs = self.P.do_history_split and self.P.split_radius > 0
        B_need, R_need = self._need_rows(tables, use_runs)
        self._bucket = (max(getattr(self, "_bucket", (1, 0, 1))[0],
                            pow2(B_need)),
                        max(getattr(self, "_bucket", (1, 0, 1))[1],
                            pow2(R_need) if use_runs else 0),
                        max(getattr(self, "_bucket", (1, 0, 1))[2],
                            pow2(len(buf))))
        B_fix, R_fix, T_fix = self._bucket

        i = 0
        while i < len(buf):
            if self._maybe_demote(frames[i], times[i]):
                for k in range(i, len(buf)):
                    self._host_step(frames[k], times[k], tables[k][2],
                                    tables[k][3])
                break
            span = len(buf) - i
            packed, B, R = self._det_packed_from_tables(
                tables[i:], pad_frames=T_fix,
                fix_rows=(B_fix, R_fix))
            T = packed.shape[0]
            t_pad = list(times[i:]) + [
                times[-1] + (k + 1) / max(1.0, self.frame_rate)
                for k in range(T - span)]
            f_pad = list(frames[i:]) + [
                frames[-1] + k + 1 for k in range(T - span)]
            aux = make_aux(self._carry_vec, t_pad, f_pad)
            vec = self._resilient_get(lambda: scan_packed(
                jnp.asarray(packed), jnp.asarray(aux), self.P, B, R))
            # hard evidence the device is live in THIS process —
            # feeds _accelerator_healthy's no-probe fallback
            from ..pipeline import note_device_compute_ok

            note_device_compute_ok()
            hist, carry_rows = unpack_result(vec, T, self.P)
            flags = hist["needs_host"][:span]
            stop = int(np.argmax(flags)) if flags.any() else len(flags)
            if 0 < stop < len(flags):
                # report n_fish as of the commit horizon, not chunk end
                hist["n_fish"] = np.int32(
                    carry_rows[stop - 1][5 * self.F
                                         + self.F * self.P.frame_rate])
            self._commit_history(frames[i:i + stop],
                                 times[i:i + stop], hist, stop)
            if self.archive_mode:
                self._archive_span(frames[i:], tables[i:], hist, stop)
            self._frames_done += stop
            if stop == len(flags):
                self._carry_vec = carry_rows[span - 1]
                self._host_posture_span(frames[i:], tables[i:],
                                        hist, stop)
                break
            if stop > 0:
                # per-frame carries ride the packed result: resume
                # from the row before the flagged frame directly
                self._carry_vec = carry_rows[stop - 1]
            # pv path: posture runs host-side over the committed span
            # (same native batch chain as FastTracker), walking the
            # carry's posture-direction section forward
            self._host_posture_span(frames[i:], tables[i:], hist,
                                    stop)
            j = i + stop
            self._assist(frames[j], times[j], tables[j], buf[j][2])
            i = j + 1

        self.end_frame = frames[-1]

    # -- fused raw-frame ingestion ---------------------------------------

    def track_frames(self, frames: np.ndarray, start_frame: int = 0):
        """Device-fused detection + tracking over a raw frame batch.
        Per chunk the link moves: frames up, aux vector up, one packed
        result down."""
        import jax
        import jax.numpy as jnp

        from ..ops.device_tracker import (_detect_kwargs,
                                          fused_scan_packed, make_aux,
                                          unpack_result)
        from ..ops.labeling import label_blobs_raw

        if self.archive_mode:
            raise EngineUnsupported(
                "archive mode (keep_individuals) needs host blob "
                "tables — feed frames through add_frame_blobs, not "
                "the fused raw-frames path")
        s = self.settings
        fr = float(s["frame_rate"] or 25)
        frames = np.asarray(frames)
        T = len(frames)
        idx = np.arange(start_frame, start_frame + T)
        times = idx / fr
        self._ensure_carry(int(idx[0]), float(times[0]))
        for k, t in zip(idx.tolist(), times.tolist()):
            self.frame_times[k] = float(t)
        caps = self.caps
        if caps is None:
            # capacity heuristic: runs scale with resolution; a frame
            # that still overflows falls back per-frame to the host
            hw = frames.shape[1] * frames.shape[2]
            caps = dict(max_runs=max(4096, hw // 128),
                        max_child_runs=max(4096, hw // 128),
                        max_pixels=max(1 << 16, hw // 8))
        kw = _detect_kwargs(s, caps)
        ddet = dict(threshold=int(s["detect_threshold"]),
                    absolute=bool(s["detect_threshold_is_absolute"]),
                    track_threshold=int(s["track_threshold"])
                    if s["track_background_subtraction"] else 0,
                    track_absolute=bool(
                        s["track_threshold_is_absolute"]))

        def raw_tuple(img):
            raw = label_blobs_raw(img, self.background, **ddet)
            return (raw["lines"], raw["pixels"], raw["line_start"],
                    raw["pixel_start"], raw["stats"])

        bg_dev = jnp.asarray(self.background)
        i = 0
        while i < T:
            if self._maybe_demote(int(idx[i]), float(times[i])):
                for k in range(i, T):
                    self._host_step(int(idx[k]), float(times[k]),
                                    raw_tuple(frames[k]))
                i = T
                break
            j = min(T, i + self.chunk)
            # fixed chunk shape: pad the tail chunk so the fused jit
            # compiles exactly once
            span = j - i
            fr_chunk = frames[i:j]
            t_chunk = times[i:j]
            x_chunk = idx[i:j]
            if span < self.chunk:
                pad = self.chunk - span
                fr_chunk = np.concatenate(
                    [fr_chunk, np.repeat(fr_chunk[-1:], pad, axis=0)])
                t_chunk = np.concatenate(
                    [t_chunk, t_chunk[-1] + (np.arange(pad) + 1) / fr])
                x_chunk = np.concatenate(
                    [x_chunk, x_chunk[-1] + np.arange(pad) + 1])
            aux = make_aux(self._carry_vec, t_chunk, x_chunk)
            vec = self._resilient_get(lambda: fused_scan_packed(
                jnp.asarray(fr_chunk), bg_dev, jnp.asarray(aux),
                self.P, split_spec=self.split_spec,
                posture_spec=self.posture_spec,
                two_stage=self.posture_two_stage, **kw))
            hist, carry_rows = unpack_result(vec, self.chunk, self.P)
            flags = (hist["needs_host"]
                     | hist["detect_overflow"])[:span]
            stop = int(np.argmax(flags)) if flags.any() else len(flags)
            if stop:
                hist["n_fish"] = np.int32(
                    carry_rows[stop - 1][5 * self.F
                                         + self.F * self.P.frame_rate])
            self._commit_history(idx[i:i + stop], times[i:i + stop],
                                 hist, stop, posture_from_hist=True)
            self._frames_done += stop
            if stop == len(flags):
                self._carry_vec = carry_rows[span - 1]
                i = j
                continue
            if stop > 0:
                self._carry_vec = carry_rows[stop - 1]
            fi = i + stop
            self._assist(int(idx[fi]), float(times[fi]),
                         (None, None, raw_tuple(frames[fi]), None),
                         None)
            i = fi + 1
        self.end_frame = int(idx[-1])
        return self

    # -- archives (archive mode) ------------------------------------------

    def _archive_span(self, frames, tables, hist, stop: int):
        """Record committed device frames' assignments as lean blobs
        (FastTracker._materialize_row over the host-built candidate
        table, rows from the scan's fish_row output)."""
        eng = self._helper
        rows_h = np.asarray(hist["fish_row"])
        for k in range(stop):
            f = int(frames[k])
            t, _, raw, preds = tables[k]
            eng._cur_stats = raw[4]
            eng._cur_preds = preds
            rows = rows_h[k]
            fids = np.flatnonzero(rows >= 0)
            out_f = []
            out_b = []
            for fid in fids.tolist():
                r = int(rows[fid])
                if r >= t.n:
                    continue
                b = eng._materialize_row(t, r)
                if b is None:
                    continue
                out_f.append(int(fid))
                out_b.append(b)
            self.frame_archive[f] = (out_f, out_b)
        self._individuals_cache = None

    @property
    def individuals(self):
        """Per-identity archive (see FastTracker.individuals)."""
        if not self.archive_mode:
            raise AttributeError(
                "individuals needs keep_individuals=True (archive "
                "mode); this engine kept positional history only")
        if self._individuals_cache is None:
            from .archive import build_individuals

            self._individuals_cache = build_individuals(self)
        return self._individuals_cache

    # -- host assist (per-frame replay) ----------------------------------

    def _host_posture_span(self, frames, tables, hist, stop: int):
        """Posture for `stop` committed pv-path frames on the host
        (track/posture.posture_batch — the chain FastTracker uses),
        walking the carry's posture-direction section forward and
        patching it back so the device resume and the assist replay
        see the post-span directions."""
        if not self.P.do_posture or not stop:
            return
        from ..ops.device_tracker import _track_vec_size
        from ..track.archive import compute_posture_rows

        eng = self._helper
        F = self.F
        base = _track_vec_size(self.P)
        # carry rows unpacked from the device result can be read-only
        # views — take ownership before patching the posture section
        self._carry_vec = np.array(self._carry_vec, np.float32)
        pdir = self._carry_vec[base:base + 2 * F] \
            .reshape(F, 2).astype(np.float64).copy()
        rows_h = np.asarray(hist["fish_row"])
        for k in range(stop):
            f = int(frames[k])
            rows = rows_h[k]
            fids = np.flatnonzero(rows >= 0)
            if not len(fids):
                continue
            t, _, raw, preds = tables[k]
            eng._cur_stats = raw[4]
            eng._cur_preds = preds
            line_arrays, pixel_arrays, kept, pred_of = [], [], [], []
            for fid in fids.tolist():
                r = int(rows[fid])
                if r >= t.n:
                    continue
                if t.objs[r] is not None:
                    b = t.objs[r]
                    if b.lines is None \
                            or getattr(b, "pixels", None) is None:
                        continue
                    line_arrays.append(np.asarray(b.lines, np.int32))
                    pixel_arrays.append(b.pixels)
                else:
                    if t.pixel_lo[r] < 0:
                        continue
                    line_arrays.append(
                        t.lines[t.line_lo[r]:t.line_hi[r]])
                    pixel_arrays.append(
                        t.pixels[t.pixel_lo[r]:t.pixel_hi[r]])
                kept.append(fid)
                pred_of.append(eng._row_prediction(t, r))
            if not kept:
                continue
            fid_arr = np.asarray(kept, np.int64)
            ok, lens, angles, out_dirs, recs, dir_reset = \
                compute_posture_rows(
                    self.settings, self.background, line_arrays,
                    pixel_arrays, pred_of, -pdir[fid_arr],
                    want_recs=self.archive_mode)
            if self.archive_mode:
                self.posture_archive[f] = [
                    (int(fid_arr[i]), recs[i])
                    for i in range(len(kept)) if recs[i] is not None]
                self._individuals_cache = None
            self.posture_history[f] = {
                "fish": fid_arr, "ok": np.asarray(ok, bool),
                "midline_length": lens, "angle": angles,
            }
            pdir[fid_arr[dir_reset]] = 0.0
            good = np.flatnonzero(ok)
            if len(good):
                pdir[fid_arr[good]] = out_dirs[good]
        self._carry_vec[base:base + 2 * F] = \
            pdir.astype(np.float32).ravel()

    def _sync_helper_state(self, frame: int, time: float):
        """Inject the device carry into the host FastTracker."""
        from ..ops.device_tracker import carry_from_vec_np

        eng = self._helper
        c = carry_from_vec_np(self._carry_vec, self.P)
        F = self.F
        eng.n_fish = int(c["n_fish"])
        eng.start_frame = self.start_frame
        eng.last_x[:] = np.asarray(c["last_x"], np.float64)
        eng.last_y[:] = np.asarray(c["last_y"], np.float64)
        eng.last_time[:] = np.asarray(c["last_time"], np.float64)
        eng.last_frame[:] = np.asarray(c["last_frame"], np.int64)
        eng.n_basic[:] = np.asarray(c["n_basic"], np.int64)
        if self.P.do_posture:
            eng._posture_dir[:F] = np.asarray(c["posture_dir"])
        if self.P.do_decay:
            # motion window (frame, x, y, time) for the helper's
            # decay estimates; the replay's scalar fallback walks
            # frame_times, so hand it the full history
            eng.win[:F] = np.asarray(c["win"])[:, :, :4]
        eng.frame_times = dict(self.frame_times)
        eng.frame_times[frame - 1] = float(c["prev_time"])
        eng.frame_times[frame] = time
        # tracklet bookkeeping from the seen-ring: runs of consecutive
        # seen bits, absolute frames; spans reaching the ring edge are
        # clipped to -inf (recent_number_samples clips at the window
        # lower bound anyway)
        seen = np.asarray(c["seen"])
        W = seen.shape[1]
        NEG = -(10 ** 9)
        eng.trk_start[:] = NEG
        eng.prev_trk_end[:] = NEG
        eng.trk_ring[:] = 0
        eng.trk_ring_n[:] = 0
        eng.closed_tracklets = [[] for _ in range(F)]
        for fid in range(int(c["n_fish"])):
            bits = seen[fid]
            if not bits.any():
                continue
            # bit k == seen at frame (frame - W + k)
            runs = []
            in_run = False
            for k in range(W):
                if bits[k] and not in_run:
                    s0 = frame - W + k
                    in_run = True
                elif not bits[k] and in_run:
                    runs.append([s0, frame - W + k - 1])
                    in_run = False
            if in_run:
                runs.append([s0, frame - 1])
            if runs and runs[0][0] == frame - W:
                runs[0][0] = NEG  # may extend past the ring
            cur = runs[-1]
            eng.trk_start[fid] = cur[0]
            closed = runs[:-1]
            if closed:
                eng.prev_trk_end[fid] = closed[-1][1]
                eng.closed_tracklets[fid] = [list(r) for r in closed]
                m = min(len(closed), eng.RING)
                eng.trk_ring[fid, :m] = np.asarray(closed[-m:],
                                                   np.int64)
                eng.trk_ring_n[fid] = m

    def _assist(self, frame: int, time: float, table_big_raw,
                blobs):
        """Replay one flagged frame through the host engine."""
        import jax.numpy as jnp

        t0 = _time.perf_counter()
        self._sync_helper_state(frame, time)
        eng = self._helper
        raw = table_big_raw[2]
        preds = table_big_raw[3] if len(table_big_raw) > 3 else None
        eng.add_frame(frame, time, *raw, predictions=preds)
        self.assist_frames.append(frame)
        self._frames_done += 1
        # harvest history + rebuild the carry
        got = self._harvest_host_frame(frame)
        from ..ops.device_tracker import carry_from_vec_np, carry_to_vec

        prev = carry_from_vec_np(self._carry_vec, self.P)
        seen = np.concatenate([prev["seen"][:, 1:], got[:, None]],
                              axis=1)
        c = dict(
            last_x=eng.last_x[:self.F], last_y=eng.last_y[:self.F],
            last_time=eng.last_time[:self.F],
            last_frame=np.clip(eng.last_frame[:self.F],
                               -(10 ** 9), None),
            n_basic=eng.n_basic[:self.F], seen=seen,
            n_fish=eng.n_fish, start_frame=self.start_frame,
            prev_time=time)
        if self.P.do_decay:
            # shift + append this frame's window entries for assigned
            # fish (exactly what the scan's carry update does); older
            # entries (with their global steps) ride from the previous
            # carry
            win = prev["win"].copy()
            fids = np.flatnonzero(got)
            if len(fids):
                win[fids, :-1] = win[fids, 1:]
                win[fids, -1, 0] = frame
                win[fids, -1, 1] = eng.last_x[fids]
                win[fids, -1, 2] = eng.last_y[fids]
                win[fids, -1, 3] = time
                win[fids, -1, 4] = time - float(prev["prev_time"])
            c["win"] = win
            c["dacc"] = _rebuild_dacc(
                win, got, frame,
                prev.get("dacc", np.zeros((self.F, 3))),
                self.frame_times, self.settings)
        if self.P.do_posture:
            c["posture_dir"] = eng._posture_dir[:self.F]
        self._carry_vec = carry_to_vec(c)
        st = self.statistics[frame]
        self.statistics[frame] = FrameStatistics(
            number_fish=st.number_fish,
            adding_seconds=_time.perf_counter() - t0,
            match_improvements=st.match_improvements)

    def _harvest_host_frame(self, frame: int):
        """Copy the helper engine's results for `frame` into this
        tracker's tables. Returns the per-fish seen mask."""
        eng = self._helper
        got = eng.last_frame[:self.F] == frame
        h = eng.history.get(frame)
        fish = np.flatnonzero(got)
        self.history[frame] = {
            "fish": fish.astype(np.int64),
            "x": eng.last_x[fish].copy(),
            "y": eng.last_y[fish].copy(),
            "prob": _probs_for(h, fish),
        }
        self.statistics[frame] = eng.statistics[frame]
        self.n_fish = max(self.n_fish, eng.n_fish)
        if self.P.do_posture:
            ph = eng.posture_history.get(frame)
            if ph is not None:
                self.posture_history[frame] = ph
        if self.archive_mode:
            fa = eng.frame_archive.get(frame)
            if fa is not None:
                self.frame_archive[frame] = fa
            pa = eng.posture_archive.get(frame)
            if pa is not None:
                self.posture_archive[frame] = pa
            self._individuals_cache = None
        return got

    def _maybe_demote(self, frame: int, time: float) -> bool:
        """Sticky switch to pure host tracking once assists dominate
        (see the constructor's demotion comment). Syncs the helper
        engine from the device carry on entry; afterwards the helper
        IS the tracker and no device launch happens again."""
        if self.demoted:
            return True
        if (self._frames_done >= self.demote_min_frames
                and len(self.assist_frames)
                > self.demote_threshold * self._frames_done):
            self._sync_helper_state(frame, time)
            self.demoted = True
        return self.demoted

    def _host_step(self, frame: int, time: float, raw, preds=None):
        """One frame fully on the (already-synced) host engine."""
        self._helper.add_frame(frame, time, *raw, predictions=preds)
        self._harvest_host_frame(frame)
        self._frames_done += 1

    # -- result harvesting ------------------------------------------------

    def _commit_history(self, frames, times, hist, stop: int,
                        posture_from_hist: bool = False):
        fx = np.asarray(hist["fish_x"])
        fy = np.asarray(hist["fish_y"])
        seen = np.asarray(hist["fish_seen"])
        n_assigned = np.asarray(hist["n_assigned"])
        fprob = np.asarray(hist["fish_prob"])
        for k in range(stop):
            f = int(frames[k])
            fid = np.flatnonzero(seen[k])
            self.history[f] = {
                "fish": fid.astype(np.int64),
                "x": fx[k, fid].astype(np.float64),
                "y": fy[k, fid].astype(np.float64),
                "prob": fprob[k, fid].astype(np.float64),
            }
            self.statistics[f] = FrameStatistics(
                number_fish=int(n_assigned[k]))
            if posture_from_hist and self.P.do_posture:
                rows = np.asarray(hist["fish_row"][k])
                pf = np.flatnonzero(rows >= 0)
                self.posture_history[f] = {
                    "fish": pf.astype(np.int64),
                    "ok": np.asarray(hist["p_ok"][k])[pf],
                    "midline_length":
                        np.asarray(hist["p_len"][k])[pf],
                    "angle": np.asarray(hist["p_ang"][k])[pf],
                }
        if stop:
            self.n_fish = max(self.n_fish, int(hist["n_fish"]))

    def positions(self) -> dict:
        """Dense history arrays: fish_x/fish_y (T, F), fish_seen."""
        return positions_of(self)


def positions_of(tracker) -> dict:
    """Dense (T, F) position history from any history engine
    (FastTracker or DeviceTracker share the history-dict schema)."""
    F = tracker.F
    if tracker.start_frame < 0:
        return dict(frames=np.zeros(0, np.int64),
                    fish_x=np.zeros((0, F)),
                    fish_y=np.zeros((0, F)),
                    fish_seen=np.zeros((0, F), bool))
    frames = np.arange(tracker.start_frame, tracker.end_frame + 1)
    T = len(frames)
    fx = np.zeros((T, F))
    fy = np.zeros((T, F))
    seen = np.zeros((T, F), bool)
    for i, f in enumerate(frames):
        h = tracker.history.get(int(f))
        if not h:
            continue
        fid = np.asarray(h["fish"], np.int64)
        ok = fid < F
        fx[i, fid[ok]] = np.asarray(h["x"])[ok]
        fy[i, fid[ok]] = np.asarray(h["y"])[ok]
        seen[i, fid[ok]] = True
    out = dict(frames=frames, fish_x=fx, fish_y=fy, fish_seen=seen)
    ph = getattr(tracker, "posture_history", None)
    if ph:
        plen = np.zeros((T, F))
        pang = np.zeros((T, F))
        pok = np.zeros((T, F), bool)
        for i, f in enumerate(frames):
            h = ph.get(int(f))
            if not h:
                continue
            fid = np.asarray(h["fish"], np.int64)
            keep = fid < F
            pok[i, fid[keep]] = np.asarray(h["ok"])[keep]
            plen[i, fid[keep]] = np.asarray(h["midline_length"])[keep]
            pang[i, fid[keep]] = np.asarray(h["angle"])[keep]
        out.update(midline_length=plen, midline_angle=pang,
                   posture_ok=pok)
    return out


def export_positions(tracker, path) -> None:
    """Position-history npz for the history engines (fast/device)."""
    np.savez_compressed(path, **positions_of(tracker))
