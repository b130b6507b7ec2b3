"""Version x feature matrix round-trip fuzz for the .results codec
(VERDICT r4 item 7: the layout was transcribed from Output.cpp but the
writer only exercised the V_39 default path; this drives every
supported on-disk version across feature combinations, and pins the
V_39 byte layout against a committed golden)."""
import hashlib
from pathlib import Path

import numpy as np
import pytest

from trex_tpu.export.results_binary import (
    CURRENT,
    V_18,
    V_19,
    V_20,
    V_23,
    V_24,
    V_26,
    V_27,
    V_28,
    V_30,
    V_33,
    V_34,
    V_35,
    V_36,
    V_37,
    V_38,
    V_39,
    ResultsBlob,
    ResultsFile,
    ResultsIndividual,
    ResultsMidline,
    ResultsOutline,
    read_results,
    write_results,
)

GOLDEN = Path(__file__).parent / "data" / "golden_v39.results"


def _mk_blob(rng, with_pred: bool, with_parent: bool) -> ResultsBlob:
    y0 = int(rng.integers(0, 40))
    k = int(rng.integers(1, 5))
    lines = np.array([[y0 + i, int(rng.integers(0, 20)),
                       20 + int(rng.integers(0, 20))] for i in range(k)],
                     np.int32)
    pred = None
    if with_pred:
        pred = {"clid": int(rng.integers(0, 200)),
                "p": int(rng.integers(0, 255)),
                "pose": [(int(rng.integers(0, 100)),
                          int(rng.integers(0, 100)))],
                "outlines": [np.array([3, 9, 27], np.int32)],
                "original": np.array([5, 6], np.int32)}
    return ResultsBlob(lines=lines, flags=0x8 if with_pred else 0,
                       parent_id=int(rng.integers(1, 9999))
                       if with_parent else -1, prediction=pred)


def _mk_results(rng, postures: bool, predictions: bool, parents: bool,
                extras: bool) -> ResultsFile:
    res = ResultsFile()
    res.gui_frame = 7
    res.consecutive = [(0, 4), (6, 9)]
    res.video_resolution = (32, 24)
    res.video_length = 10
    res.average = rng.integers(0, 255, (24, 32), np.uint8)
    res.analysis_range = (-1, 9)
    res.creation_time = 1_700_000_000_000_000
    res.settings = "track_threshold = 15\n"
    res.cmd_line = "trex -i x.pv"
    res.frame_properties = [(f, f * 40_000, 2) for f in range(5)]
    res.active = {f: [0, 1] for f in range(5)}
    if extras:
        res.rec_data = {2: {1234: np.array([0.25, 0.75], np.float32)}}
        res.categorize = {"labels": ["a", "b"],
                          "probs": {1: {77: 1}},
                          "ranged": [(0, 2, 1, [5, 6, 7])]}
        res.tags = {3: {1: (88, 0.5)}}
        res.auto_assign = {0: [(0, 3, [11, 12, 13, 14])]}
    for fid in range(2):
        ind = ResultsIndividual(id=fid, name=f"fish{fid}")
        n = 4
        ind.frames = np.arange(n, dtype=np.int64)
        ind.positions = rng.random((n, 2)).astype(np.float32) * 30
        ind.angles = rng.random(n).astype(np.float32)
        ind.blobs = [_mk_blob(rng, predictions, parents)
                     for _ in range(n)]
        ind.thresholded_size = {f: int(rng.integers(10, 90))
                                for f in range(n)}
        if postures:
            for f in range(n):
                m = ResultsMidline()
                m.len = 12.5
                m.angle = 0.3
                m.offset = (1.0, 2.0)
                m.front = (3.0, 4.0)
                m.tail_index = 5
                m.head_index = 1
                m.segments = rng.random((6, 4)).astype(np.float32)
                ind.midlines[f] = m
                o = ResultsOutline()
                o.first = (9.0, 8.0)
                o.points = rng.integers(0, 65535, 12).astype(np.uint16)
                o.scale = 0.25
                ind.outlines[f] = o
        if extras:
            ind.qrcodes = {1: (4, 0.75, 9)}
            ind.auto_matched = [2, 3]
        res.individuals.append(ind)
    return res


ALL_VERSIONS = list(range(V_18, CURRENT + 1))


@pytest.mark.parametrize("version", ALL_VERSIONS)
@pytest.mark.parametrize("postures,predictions,parents,extras", [
    (False, False, False, False),
    (True, False, False, False),
    (True, True, True, True),
    (False, True, False, True),
])
def test_matrix_roundtrip(tmp_path, version, postures, predictions,
                          parents, extras):
    rng = np.random.default_rng(version * 100 + postures * 8
                                + predictions * 4 + parents * 2 + extras)
    res = _mk_results(rng, postures, predictions, parents, extras)
    p = tmp_path / f"v{version}.results"
    write_results(p, res, version=version)
    back = read_results(p)
    assert back.version == version

    # unconditional payloads
    assert back.gui_frame == res.gui_frame
    assert back.settings == res.settings
    assert len(back.individuals) == len(res.individuals)
    assert len(back.frame_properties) == len(res.frame_properties)
    assert back.active == res.active

    # version-gated top-level features
    if version >= V_28:
        assert back.consecutive == res.consecutive
        assert back.video_resolution == res.video_resolution
        np.testing.assert_array_equal(back.average, res.average)
    else:
        assert back.consecutive == []
    assert (back.analysis_range == res.analysis_range) == (version >= V_30)
    assert (back.creation_time == res.creation_time) == (version >= V_34)
    assert (back.cmd_line == res.cmd_line) == (version >= V_23)
    if extras:
        assert set(back.rec_data) == set(res.rec_data)
        np.testing.assert_allclose(back.rec_data[2][1234],
                                   res.rec_data[2][1234])
        assert (back.categorize is not None) == (version >= V_33)
        if version >= V_33:
            assert back.categorize["labels"] == ["a", "b"]
            assert back.categorize["ranged"] == res.categorize["ranged"]
        assert (back.tags == res.tags) == (version >= V_35)
        assert (back.auto_assign == res.auto_assign) == (version >= V_39)
    if version >= 30:  # V_31: per-frame active count
        assert all(a == 2 for _, _, a in back.frame_properties)

    # per-individual payloads
    for got, want in zip(back.individuals, res.individuals):
        assert got.id == want.id and got.name == want.name
        np.testing.assert_array_equal(got.frames, want.frames)
        np.testing.assert_allclose(got.positions, want.positions,
                                   rtol=1e-6)
        np.testing.assert_allclose(got.angles, want.angles, rtol=1e-6)
        for gb, wb in zip(got.blobs, want.blobs):
            np.testing.assert_array_equal(gb.lines, wb.lines)
            want_parent = wb.parent_id if parents and version >= V_26 \
                or parents and 21 <= version <= 24 else -1
            assert gb.parent_id == want_parent
            if predictions and version >= V_36:
                assert gb.prediction["clid"] == wb.prediction["clid"]
                np.testing.assert_array_equal(
                    gb.prediction["outlines"][0],
                    wb.prediction["outlines"][0])
                if version >= V_37:
                    np.testing.assert_array_equal(
                        gb.prediction["original"],
                        wb.prediction["original"])
                else:
                    assert gb.prediction["original"] is None
            else:
                assert gb.prediction is None
        if version >= V_19:
            assert got.thresholded_size == want.thresholded_size
        if postures:
            assert set(got.midlines) == set(want.midlines)
            for f, m in got.midlines.items():
                wm = want.midlines[f]
                assert m.len == pytest.approx(wm.len)
                np.testing.assert_allclose(m.segments, wm.segments,
                                           rtol=1e-6)
                if version >= V_24:
                    assert (m.tail_index, m.head_index) == (5, 1)
            for f, o in got.outlines.items():
                wo = want.outlines[f]
                np.testing.assert_array_equal(o.points, wo.points)
                assert o.first == pytest.approx(wo.first)
                assert o.scale == pytest.approx(
                    wo.scale if version >= V_38 else 0.1)
        if extras:
            assert (got.qrcodes == want.qrcodes) == (version >= V_34)
            assert (got.auto_matched == want.auto_matched) == \
                (version >= V_39)


def test_v39_byte_golden(tmp_path):
    """Deterministic V_39 write must byte-match the committed golden —
    any layout refactor shows up as a diff against fixed bytes."""
    rng = np.random.default_rng(4242)
    res = _mk_results(rng, postures=True, predictions=True,
                      parents=True, extras=True)
    p = tmp_path / "fresh.results"
    write_results(p, res)
    fresh = p.read_bytes()
    assert GOLDEN.exists(), (
        "golden missing: copy the freshly written file to "
        f"{GOLDEN} once and commit it")
    golden = GOLDEN.read_bytes()
    assert hashlib.sha256(fresh).hexdigest() == \
        hashlib.sha256(golden).hexdigest(), (
        "V_39 byte layout changed vs committed golden "
        f"({len(fresh)} vs {len(golden)} bytes)")
    # and the golden still parses
    back = read_results(GOLDEN)
    assert back.version == CURRENT and len(back.individuals) == 2


def test_bad_version_rejected(tmp_path):
    res = ResultsFile()
    with pytest.raises(ValueError):
        write_results(tmp_path / "x.results", res, version=V_18 - 1)
    with pytest.raises(ValueError):
        write_results(tmp_path / "x.results", res, version=CURRENT + 1)
