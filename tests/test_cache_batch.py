"""Equivalence of the vectorized cache computation with the per-fish
reference implementation (Individual.cache_for_frame)."""
import numpy as np
import pytest

from tests.test_tracking import _blob_at, _settings
from trex_tpu.track import Individual
from trex_tpu.track.cache_batch import compute_caches


def _random_individuals(n_fish=12, n_frames=25, seed=0, decay=0.7,
                        drop_prob=0.15):
    s = _settings()
    s.set("track_speed_decay", decay)
    rng = np.random.default_rng(seed)
    frame_times = {f: f / 25 for f in range(n_frames + 1)}
    inds = []
    for i in range(n_fish):
        ind = Individual(i, s)
        x, y = rng.uniform(30, 150, 2)
        vx, vy = rng.normal(0, 3, 2)
        start = int(rng.integers(0, 5))
        for f in range(start, n_frames):
            if f > start and rng.random() < drop_prob:
                continue  # gap
            x += vx + rng.normal(0, 1)
            y += vy + rng.normal(0, 1)
            ind.add(f, f / 25, _blob_at(int(x) % 180, int(y) % 180))
        if not ind.empty():
            inds.append(ind)
    return s, inds, frame_times


@pytest.mark.parametrize("decay,drop", [(0.7, 0.0), (0.7, 0.2),
                                        (1.0, 0.1), (0.0, 0.0)])
def test_batch_matches_scalar(decay, drop):
    s, inds, frame_times = _random_individuals(decay=decay,
                                               drop_prob=drop, seed=3)
    frame = 25
    time = frame / 25
    batch = compute_caches(inds, frame, time, frame_times, 0, s)
    for ind in inds:
        ref = ind.cache_for_frame(frame, time, frame_times, 0)
        got = batch[ind.identity]
        assert got.previous_frame == ref.previous_frame
        assert got.local_tdelta == pytest.approx(ref.local_tdelta)
        assert got.last_seen_px == pytest.approx(ref.last_seen_px)
        assert got.estimated_px == pytest.approx(ref.estimated_px,
                                                 abs=1e-6), ind.identity
        assert got.time_probability == pytest.approx(
            ref.time_probability, abs=1e-9)
        assert got.valid_frame == ref.valid_frame


def test_empty_and_manual_fallbacks():
    s, inds, frame_times = _random_individuals(n_fish=3, seed=7)
    inds[0].manual_frames.add(inds[0].end_frame)
    empty = Individual(99, s)
    batch = compute_caches(inds + [empty], 25, 1.0, frame_times, 0, s)
    assert batch[99].individual_empty
    ref = inds[0].cache_for_frame(25, 1.0, frame_times, 0)
    assert batch[inds[0].identity].time_probability == pytest.approx(
        ref.time_probability)


def test_distributed_helpers_single_host():
    """parallel/distributed.py degrades gracefully on one host: no
    coordinator -> initialize() returns False; hybrid_mesh builds a
    host-local mesh usable with the standard shardings; the global
    batch assembles from local data."""
    import numpy as np

    from trex_tpu.parallel.distributed import (global_batch_array,
                                               hybrid_mesh, initialize,
                                               process_batch_slice)

    assert initialize() is False  # no coordinator configured

    mesh = hybrid_mesh(("data", "model"), model_axis_size=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.size == 8  # conftest forces 8 virtual devices

    sl = process_batch_slice(32)
    assert sl == slice(0, 32)

    x = np.arange(32 * 4, dtype=np.float32).reshape(32, 4)
    arr = global_batch_array(mesh, x)
    np.testing.assert_array_equal(np.asarray(arr), x)

    # a jitted reduction over the sharded batch runs on the mesh
    import jax

    y = jax.jit(lambda a: a.sum())(arr)
    assert float(y) == float(x.sum())
