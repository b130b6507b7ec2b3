#!/usr/bin/env python3
"""Headline benchmark — prints ONE JSON line.

Metric (BASELINE.json): frames/sec/chip at 256-individual bg-subtract
tracking (+ identity-CNN crops/sec as secondary detail). vs_baseline is
the realtime factor vs the reference's headline claim of >=1x realtime
at 256 individuals (README.md:17) at 25 fps video.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

VIDEO_FPS = 25.0
N_FISH = 256
SIZE = 1024
N_FRAMES = 60


def synth_frames(n_frames, n_fish=N_FISH, size=SIZE, seed=0):
    """Synthetic 256-fish video: dark elongated blobs on bright bg."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(30, size - 30, (n_fish, 2))
    vel = rng.normal(0, 2.0, (n_fish, 2))
    stamp = np.zeros((9, 15), np.uint8)
    stamp[2:7, 1:14] = 90
    stamp[3:6, 0:15] = 110
    bg = np.full((size, size), 200, np.uint8)
    frames = []
    for _ in range(n_frames):
        img = bg.copy()
        vel += rng.normal(0, 0.6, vel.shape)
        np.clip(vel, -4, 4, out=vel)
        pos += vel
        pos = np.clip(pos, 20, size - 25)
        for (x, y) in pos:
            xi, yi = int(x), int(y)
            region = img[yi : yi + 9, xi : xi + 15]
            np.minimum(region, 200 - stamp[: region.shape[0],
                                           : region.shape[1]], out=region)
        frames.append(img)
    return bg, frames


def bench_tracking():
    from trex_tpu.config import reset_global_settings
    from trex_tpu.ops.labeling import label_blobs
    from trex_tpu.track import TrackBlob, Tracker

    s = reset_global_settings()
    s.set("track_max_individuals", N_FISH)
    s.set("track_max_speed", 300)
    s.set("cm_per_pixel", 1.0)
    s.set("frame_rate", int(VIDEO_FPS))
    s.set("track_threshold", 20)
    s.set("track_threshold_is_absolute", False)
    s.set("track_background_subtraction", True)
    s.set("track_size_filter", [[20, 400]])
    s.set("calculate_posture", False)
    s.set("match_mode", "automatic")

    bg, frames = synth_frames(N_FRAMES)
    tracker = Tracker(s, background=bg)

    from trex_tpu.pipeline import detect_frame
    import concurrent.futures as cf

    def preprocess(i):
        blobs = detect_frame(frames[i], bg, s)
        return tracker.preprocess_frame(i, blobs, time=i / VIDEO_FPS)

    # warmup frame (imports, jit, pools)
    tracker.add(preprocess(0))

    # pipelined like the Segmenter/TrackingState engines: detection +
    # prefilter in a worker pool, Tracker.add serialized in order
    workers = 6
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=workers) as pool:
        futures = {}
        next_submit = next_track = 1
        while next_track < len(frames):
            while next_submit < len(frames) \
                    and len(futures) < workers * 2:
                futures[next_submit] = pool.submit(preprocess, next_submit)
                next_submit += 1
            tracker.add(futures.pop(next_track).result())
            next_track += 1
    dt = time.perf_counter() - t0
    fps = (len(frames) - 1) / dt
    n_tracked = np.mean([st.number_fish
                         for st in tracker.statistics.values()])
    return fps, n_tracked


def bench_vi_crops():
    import jax
    import jax.numpy as jnp

    from trex_tpu.models import VITrainer, build

    model = build("v118_3", 100)
    trainer = VITrainer(model, 100, (80, 80, 1))
    batch = 1024
    images = jnp.zeros((batch, 80, 80, 1), jnp.float32)
    step = trainer._eval_step
    step(trainer.state, images).block_until_ready()  # compile
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        out = step(trainer.state, images)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_visual_fields():
    """Device visual-field throughput: 256 fish x 2 eyes x 512 bins."""
    import jax.numpy as jnp

    from trex_tpu.ops.raycast import visual_field

    rng = np.random.default_rng(0)
    F, P = 256, 128
    pts = rng.uniform(0, SIZE, (F * P, 2)).astype(np.float32)
    ids = np.repeat(np.arange(F, dtype=np.int32), P)
    valid = np.ones(F * P, bool)
    eye_pos = rng.uniform(0, SIZE, (F, 2, 2)).astype(np.float32)
    eye_angle = rng.uniform(-3, 3, (F, 2)).astype(np.float32)
    args = (jnp.asarray(pts), jnp.asarray(ids), jnp.asarray(valid),
            jnp.asarray(eye_pos), jnp.asarray(eye_angle),
            jnp.float32(SIZE * 1.5))
    out = visual_field(*args)
    out["depth0"].block_until_ready()
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = visual_field(*args)
    out["depth0"].block_until_ready()
    dt = time.perf_counter() - t0
    return iters / dt  # full 256-fish field sets per second


def main():
    track_fps, n_tracked = bench_tracking()
    crops_per_sec = bench_vi_crops()
    vf_per_sec = bench_visual_fields()
    realtime_factor = track_fps / VIDEO_FPS
    print(json.dumps({
        "metric": "frames/sec/chip at 256-individual bg-subtract tracking",
        "value": round(track_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(realtime_factor, 3),
        "detail": {
            "realtime_factor_at_25fps": round(realtime_factor, 3),
            "mean_individuals_tracked": round(float(n_tracked), 1),
            "vi_crops_per_sec_v118_3_b1024": round(crops_per_sec, 1),
            "visual_field_256fish_sets_per_sec": round(vf_per_sec, 1),
            "synthetic_video": f"{SIZE}x{SIZE}@{int(VIDEO_FPS)}fps "
                               f"{N_FISH} individuals",
        },
    }))


if __name__ == "__main__":
    main()
