"""Device-resident run-based connected components + blob statistics.

The TPU counterpart of native/labeling.cpp (the reference's commons
CPULabeling::run + RawProcessing::generate_binary, used from
BackgroundSubtraction.cpp:126-347): a batch of frames goes in, compact
fixed-capacity per-frame blob tables come out — detect-threshold blobs,
track-threshold children (pixel::threshold_blob semantics: the tracking
re-threshold applied inside each detect blob), RLE runs for both, and
fused per-blob statistics (pixel count, track recount, bbox, mask
centroid sums).

Algorithm (all shapes static; one jit for the whole batch):

1. threshold masks: detect = diff >= detect_threshold (and img != 0,
   matching the native labeler), track = detect & (track diff >= t2).
2. run extraction: run starts/ends via row-local shifts; the run id
   image is a cumsum over scan order; `jnp.nonzero(size=max_runs)`
   compacts starts/ends into (y, x0, x1) run tables.
3. connected components over the run graph: foreground pixels compact
   to `max_pixels`; each pixel knows its run and the three runs above
   it (8-connectivity). Labels = min run index per component, found by
   iterated bidirectional min-propagation (segment-min down, scatter-
   min up) + pointer jumping (path halving) — O(log diameter)
   iterations of O(pixels) work, not O(diameter) full-frame sweeps.
4. per-blob stats: canonical labels sort-unique into blob slots;
   segment ops over runs give count/bbox/centroid-sums; a segment sum
   over pixels gives the fused track-threshold recount
   (pv::Blob::recount).

Centroid sums are f32: exact while a blob's coordinate sum stays below
2^24 (true for any fish-sized blob; the engine targets those).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _run_tables(mask: jax.Array, max_runs: int):
    """Extract horizontal runs of a (H, W) bool mask.

    Returns dict with run tables (size max_runs, padded):
      y, x0, x1   int32 run coordinates (padded entries: y = -1)
      n_runs      int32 scalar
      run_id_flat (H*W + 1,) int32: run index per pixel, max_runs for
                  background; the trailing element is a gather-safe
                  sentinel (max_runs).
      overflow    bool: more than max_runs runs existed
    """
    h, w = mask.shape
    hw = h * w
    left = jnp.pad(mask[:, :-1], ((0, 0), (1, 0)))
    right = jnp.pad(mask[:, 1:], ((0, 0), (0, 1)))
    starts = mask & ~left
    ends = mask & ~right
    sflat = starts.reshape(-1)
    mflat = mask.reshape(-1)
    csum = jnp.cumsum(sflat.astype(jnp.int32))
    n_runs = csum[-1]
    run_id = jnp.where(mflat, csum - 1, max_runs)
    run_id = jnp.minimum(run_id, max_runs)  # overflow runs collapse
    run_id_flat = jnp.concatenate(
        [run_id, jnp.full((1,), max_runs, jnp.int32)])
    (start_idx,) = jnp.nonzero(sflat, size=max_runs, fill_value=hw)
    (end_idx,) = jnp.nonzero(ends.reshape(-1), size=max_runs,
                             fill_value=hw)
    valid = start_idx < hw
    y = jnp.where(valid, start_idx // w, -1).astype(jnp.int32)
    x0 = jnp.where(valid, start_idx % w, 0).astype(jnp.int32)
    x1 = jnp.where(valid, end_idx % w, -1).astype(jnp.int32)
    return {
        "y": y, "x0": x0, "x1": x1,
        "n_runs": n_runs,
        "run_id_flat": run_id_flat,
        "overflow": n_runs > max_runs,
    }


def _label_runs(mask: jax.Array, runs: dict, max_runs: int,
                max_pixels: int):
    """Connected-component labels over the run graph (8-connectivity).

    Returns (labels (max_runs,) int32 — min run index per component,
    pixel dict for downstream segment ops, overflow bool).
    """
    h, w = mask.shape
    hw = h * w
    mflat = mask.reshape(-1)
    (pix,) = jnp.nonzero(mflat, size=max_pixels, fill_value=hw)
    n_pix = jnp.sum(mflat)
    rid = runs["run_id_flat"]
    r_pix = rid[jnp.minimum(pix, hw)]  # max_runs for padding
    py = pix // w
    px = pix % w
    ups = []
    for dx in (-1, 0, 1):
        up = pix - w + dx
        ok = (py > 0) & (px + dx >= 0) & (px + dx < w) & (pix < hw)
        ups.append(jnp.where(ok, rid[jnp.clip(up, 0, hw)], max_runs))

    R = max_runs
    init = jnp.concatenate(
        [jnp.arange(R, dtype=jnp.int32), jnp.full((1,), R, jnp.int32)])

    def body(state):
        L, _ = state
        lr = L[r_pix]
        cand = jnp.minimum(jnp.minimum(L[ups[0]], L[ups[1]]), L[ups[2]])
        new = L
        # propagate the min over a run's upper neighborhood down to it
        down = jax.ops.segment_min(cand, r_pix, num_segments=R + 1)
        new = jnp.minimum(new, down)
        # and each pixel's label up to its upper-neighbor runs
        for u in ups:
            new = jnp.minimum(
                new, jax.ops.segment_min(lr, u, num_segments=R + 1))
        new = new.at[R].set(R)
        # pointer jumping (path halving): labels point at runs whose
        # own label is <=, so chasing them twice shortcuts chains
        new = new[new]
        new = new[new]
        return new, jnp.any(new != L)

    L, _ = jax.lax.while_loop(
        lambda s: s[1], body, (init, jnp.bool_(True)))
    pixels = {"idx": pix, "run": r_pix, "n": n_pix,
              "y": py.astype(jnp.int32), "x": px.astype(jnp.int32)}
    return L[:R], pixels, n_pix > max_pixels


def _blob_stats(runs: dict, labels: jax.Array, max_runs: int,
                max_blobs: int):
    """Compact canonical labels into blob slots + per-blob statistics.

    Returns (stats dict, slot_of_run (max_runs,) int32 in [0, max_blobs]
    — max_blobs marks invalid/overflow runs).
    """
    R = max_runs
    valid = runs["y"] >= 0
    can = jnp.where(valid, labels, R)
    uniq = jnp.unique(can, size=max_blobs + 1, fill_value=R)
    slot = jnp.searchsorted(uniq, can).astype(jnp.int32)
    slot = jnp.minimum(slot, max_blobs)
    n_blobs = jnp.sum(uniq[:max_blobs] < R)
    # a slot is real iff its uniq entry is a real canonical label
    nseg = max_blobs + 1
    length = jnp.where(valid, runs["x1"] - runs["x0"] + 1, 0)
    flen = length.astype(jnp.float32)
    count = jax.ops.segment_sum(flen, slot, num_segments=nseg)
    sum_x = jax.ops.segment_sum(
        (runs["x0"] + runs["x1"]).astype(jnp.float32) * 0.5 * flen,
        slot, num_segments=nseg)
    sum_y = jax.ops.segment_sum(
        runs["y"].astype(jnp.float32) * flen, slot, num_segments=nseg)
    big = jnp.int32(1 << 30)
    x0 = jax.ops.segment_min(jnp.where(valid, runs["x0"], big), slot,
                             num_segments=nseg)
    y0 = jax.ops.segment_min(jnp.where(valid, runs["y"], big), slot,
                             num_segments=nseg)
    x1 = jax.ops.segment_max(jnp.where(valid, runs["x1"], -1), slot,
                             num_segments=nseg)
    y1 = jax.ops.segment_max(jnp.where(valid, runs["y"], -1), slot,
                             num_segments=nseg)
    n_lines = jax.ops.segment_sum(valid.astype(jnp.int32), slot,
                                  num_segments=nseg)
    stats = {
        "count": count[:max_blobs],
        "sum_x": sum_x[:max_blobs],
        "sum_y": sum_y[:max_blobs],
        "x0": x0[:max_blobs], "y0": y0[:max_blobs],
        "x1": x1[:max_blobs], "y1": y1[:max_blobs],
        "n_lines": n_lines[:max_blobs],
        "first_run": uniq[:max_blobs],
        "n_blobs": n_blobs,
        "overflow": jnp.sum(uniq < R) > max_blobs,
    }
    return stats, slot


def _detect_single(frame: jax.Array, background: jax.Array,
                   detect_threshold: int, detect_absolute: bool,
                   track_threshold: int, track_absolute: bool,
                   max_runs: int, max_pixels: int, max_blobs: int,
                   max_child_runs: int, max_children: int):
    f = frame.astype(jnp.int16)
    b = background.astype(jnp.int16)
    adiff = jnp.abs(f - b)
    sdiff = b - f
    nz = frame != 0
    det = ((adiff if detect_absolute else sdiff)
           >= detect_threshold) & nz
    out = {}
    runs = _run_tables(det, max_runs)
    labels, pixels, pix_overflow = _label_runs(det, runs, max_runs,
                                               max_pixels)
    stats, slot = _blob_stats(runs, labels, max_runs, max_blobs)
    out["det"] = stats
    out["det_runs"] = {
        "y": runs["y"], "x0": runs["x0"], "x1": runs["x1"],
        "slot": jnp.where(runs["y"] >= 0, slot, max_blobs),
    }
    out["overflow"] = runs["overflow"] | pix_overflow | stats["overflow"]

    if track_threshold > 0:
        tmask = ((adiff if track_absolute else sdiff)
                 >= track_threshold) & det
        # fused recount (pv::Blob::recount at track_threshold) per
        # detect blob, summed over the compact detect pixel list
        tflat = jnp.concatenate(
            [tmask.reshape(-1), jnp.zeros((1,), bool)])
        tpix = tflat[jnp.minimum(pixels["idx"],
                                 frame.size)].astype(jnp.float32)
        pslot = slot[jnp.minimum(pixels["run"], max_runs - 1)]
        pslot = jnp.where(pixels["run"] >= max_runs, max_blobs, pslot)
        tc = jax.ops.segment_sum(tpix, pslot,
                                 num_segments=max_blobs + 1)
        out["det"]["track_count"] = tc[:max_blobs]

        cruns = _run_tables(tmask, max_child_runs)
        clabels, _, c_pix_overflow = _label_runs(
            tmask, cruns, max_child_runs, max_pixels)
        cstats, cslot = _blob_stats(cruns, clabels, max_child_runs,
                                    max_children)
        # child -> parent: the detect run under the child's first run
        first_start = jnp.where(
            cstats["first_run"] < max_child_runs,
            cruns["y"][jnp.minimum(cstats["first_run"],
                                   max_child_runs - 1)]
            * frame.shape[1]
            + cruns["x0"][jnp.minimum(cstats["first_run"],
                                      max_child_runs - 1)],
            frame.size)
        prun = runs["run_id_flat"][jnp.minimum(first_start, frame.size)]
        parent = slot[jnp.minimum(prun, max_runs - 1)]
        parent = jnp.where(prun >= max_runs, max_blobs, parent)
        cstats["parent"] = parent
        # every child pixel passes track_threshold by construction
        cstats["track_count"] = cstats["count"]
        out["child"] = cstats
        out["child_runs"] = {
            "y": cruns["y"], "x0": cruns["x0"], "x1": cruns["x1"],
            "slot": jnp.where(cruns["y"] >= 0, cslot, max_children),
        }
        out["overflow"] = (out["overflow"] | cruns["overflow"]
                           | c_pix_overflow | cstats["overflow"])
    return out


@partial(jax.jit, static_argnames=(
    "detect_threshold", "detect_absolute", "track_threshold",
    "track_absolute", "max_runs", "max_pixels", "max_blobs",
    "max_child_runs", "max_children"))
def detect_batch_runs(frames: jax.Array, background: jax.Array,
                      detect_threshold: int, detect_absolute: bool,
                      track_threshold: int = 0,
                      track_absolute: bool = True,
                      max_runs: int = 4096, max_pixels: int = 65536,
                      max_blobs: int = 512, max_child_runs: int = 4096,
                      max_children: int = 512) -> dict:
    """Batched device detection: frames (B, H, W) uint8 -> blob tables.

    Per frame: detect blobs (stats + runs), optional track-threshold
    children (stats + runs + parent slot), and overflow flags (any cap
    exceeded -> the host must fall back to the native labeler for that
    frame).
    """
    fn = partial(
        _detect_single,
        detect_threshold=detect_threshold,
        detect_absolute=detect_absolute,
        track_threshold=track_threshold,
        track_absolute=track_absolute,
        max_runs=max_runs, max_pixels=max_pixels, max_blobs=max_blobs,
        max_child_runs=max_child_runs, max_children=max_children)
    return jax.vmap(lambda fr: fn(fr, background))(frames)


def detect_batch_runs_sharded(frames, background, mesh,
                              axis: str = "data", **kwargs) -> dict:
    """Multi-chip batched detection: the frame batch shards over the
    mesh's `axis`; every per-frame output inherits that sharding, so
    detection scales linearly across chips with no collectives (the
    SURVEY §5.8 DP-over-tiles mapping). The background replicates.

    `kwargs` are detect_batch_runs' threshold/capacity options."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    frames = jax.device_put(
        jnp.asarray(frames), NamedSharding(mesh, P(axis)))
    background = jax.device_put(
        jnp.asarray(background), NamedSharding(mesh, P()))
    with mesh:
        return detect_batch_runs(frames, background, **kwargs)
