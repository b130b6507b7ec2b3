"""Vectors ported from the reference's own unit tests
(Application/Tests/test_matching.cpp): PredictionFilter parsing
(PredictionFilterTests.Basic:2101), the pairing-table optimal
assignment (TestPairing.TestInit:1604), and the three-termite split
(TestSplitting.Basic:2069) against the real reference image asset."""
from pathlib import Path

import numpy as np
import pytest

TERMITES = Path("/root/reference/images/termites_three.png")


def test_prediction_filter_basic():
    """PredictionFilterTests.Basic (test_matching.cpp:2101-2122)."""
    from trex_tpu.detect.prediction_filter import PredictionFilter

    classes = {0: "dog", 1: "bird", 2: "fish", 42: "toothbrush"}

    f = PredictionFilter.from_str("[0,2,toothbrush]", classes)
    assert f.to_str() == "[0,2,42]"
    assert f.allowed(0) and f.allowed(2) and f.allowed(42)
    assert not f.allowed(1)

    f = PredictionFilter.from_str("-[dog,2,toothbrush]", classes)
    assert f.to_str() == "-[0,2,42]"
    assert f.allowed(1)
    assert not f.allowed(0) and not f.allowed(2) and not f.allowed(42)
    # the positive side holds the complement over the class map
    assert f.detect_only == [1]

    # duplicate names deduplicate (test_matching.cpp:2119)
    f = PredictionFilter.from_str("-[dog,2,toothbrush,dog]", classes)
    assert f.to_str() == "-[0,2,42]"

    with pytest.raises(ValueError, match="Unknown detection class"):
        PredictionFilter.from_str("[cat]", classes)


def test_prediction_filter_settings_path():
    from trex_tpu.config import reset_global_settings
    from trex_tpu.detect.prediction_filter import filter_from_settings

    s = reset_global_settings()
    assert filter_from_settings(s) is None
    s["detect_classes"] = {0: "dog", 2: "fish"}
    s["detect_only_classes"] = "-[fish]"
    f = filter_from_settings(s)
    assert f.allowed(0) and not f.allowed(2)
    s["detect_only_classes"] = [0, "fish"]
    f = filter_from_settings(s)
    assert f.detect_only == [0, 2]


def test_pairing_table_optimal_assignment():
    """TestPairing.TestInit (test_matching.cpp:1604-1671): edges below
    match_min_probability never enter the table; the optimal pairing
    gives fish0 -> blob0 (0.5) and fish1 -> blob2 (0.8) in both
    automatic and hungarian modes."""
    from trex_tpu.track import PairedProbabilities, match

    p_min = 0.1

    def table():
        paired = PairedProbabilities()
        # fish0: {b0: 0.5, b1: 0.01(below p_min -> dropped), b2: 0}
        for fid, edges in ((0, {0: 0.5, 1: 0.01, 2: 0.0}),
                           (1, {0: 0.0, 1: 0.5, 2: 0.8})):
            for bi, p in edges.items():
                if p > p_min:
                    paired.add(fid, bi, p)
        return paired

    for mode in ("automatic", "hungarian", "tree"):
        res = match(table(), mode=mode)
        got = {fid: bi for bi, fid in res.pairings.items()}
        assert got == {0: 0, 1: 2}, (mode, got)
    # the reference excludes `approximate` from this vector
    # (test_matching.cpp:1674 comments it out) because blob-order
    # greedy is legitimately suboptimal here: b1 is claimed by fish1
    # before b2 is considered.
    res = match(table(), mode="approximate")
    got = {fid: bi for bi, fid in res.pairings.items()}
    assert got == {0: 0, 1: 1}


@pytest.mark.skipif(not TERMITES.exists(), reason="asset not available")
def test_split_three_termites():
    """TestSplitting.Basic (test_matching.cpp:2069-2091): the touching
    three-termite blob splits into exactly 3 pieces."""
    import cv2

    from trex_tpu.config import reset_global_settings
    from trex_tpu.ops.labeling import label_blobs
    from trex_tpu.track.blob import TrackBlob
    from trex_tpu.track.splitting import split_blob

    s = reset_global_settings()
    img = cv2.imread(str(TERMITES), cv2.IMREAD_GRAYSCALE)
    assert img is not None
    # reference: zero background, blobs = nonzero pixels
    comps = label_blobs(img)
    assert comps, "no blobs found in termites_three.png"
    big = max(comps, key=lambda c: c.num_pixels)
    blob = TrackBlob(np.asarray(big.lines), big.pixels)
    bg = np.zeros(img.shape, np.uint8)
    # the reference splits with threshold escalation against a black
    # background (SplitBlob::split(3, ...)); our split_blob takes the
    # same (blob, want, background) inputs
    pieces = split_blob(blob, 3, bg, s)
    assert len(pieces) == 3, f"expected 3 pieces, got {len(pieces)}"


def test_commandline_spaced_path_and_flags():
    """CommandLineTest.ParsesSpacedPathAndFlags + quoted negatives
    (test_commandline.cpp:62-121)."""
    from trex_tpu.cli.trex import parse_args

    out = parse_args(["-i", "/Users/tristan/Downloads/videos",
                      "2/test.pv", "-load", "-parm2", "value"])
    assert out["source"] == "/Users/tristan/Downloads/videos 2/test.pv"
    assert out["load"] is True
    assert out["parm2"] == "value"

    out = parse_args(["-enabled", "-name", "Alice", "Bob",
                      "-threshold", "'-7'", "-extra", "spare"])
    assert out["enabled"] is True
    assert out["name"] == "Alice Bob"
    assert out["threshold"] == "-7"
    assert out["extra"] == "spare"

    # unquoted negative numbers are values, not flags
    out = parse_args(["-threshold", "-7"])
    assert out["threshold"] == "-7"


class _MockFS:
    """Injectable filesystem mirroring the reference's
    FilesystemInterface mocks (test_patharray.cpp:390-412)."""

    def __init__(self, files, folders=()):
        self._files = set(files)
        self._folders = set(folders)

    def find_files(self, parent):
        return sorted(self._files)

    def is_folder(self, path):
        return path in self._folders

    def exists(self, path):
        return path in self._files


def test_patharray_printf_variants():
    """PathArrayTest.ParsePath / From10ToEnd / ConsecutiveFiles_10_100 /
    3DigitsPadded / 03DigitsPadded / FilenamesWithSpaces
    (test_patharray.cpp:388-744)."""
    from trex_tpu.io.patharray import resolve_paths

    fs = _MockFS({f"/path/to/file{i:02d}" for i in range(3)})
    assert resolve_paths("/path/to/file%0.2d", fs) == [
        "/path/to/file00", "/path/to/file01", "/path/to/file02"]
    assert resolve_paths("/path/to/file%1.2d", fs) == [
        "/path/to/file01", "/path/to/file02"]

    fs = _MockFS({"/path/to/file010", "/path/to/file011"})
    assert resolve_paths("/path/to/file%10.3d", fs) == [
        "/path/to/file010", "/path/to/file011"]

    fs = _MockFS({f"/path/to/file{i:06d}.mp4" for i in range(10, 101)})
    got = resolve_paths("/path/to/file%10.100.6d.mp4", fs)
    assert len(got) == 91
    assert got[0] == "/path/to/file000010.mp4"
    assert got[-1] == "/path/to/file000100.mp4"

    fs = _MockFS({"/path/to/file000", "/path/to/file001"})
    for pat in ("/path/to/file%3d", "/path/to/file%03d"):
        assert resolve_paths(pat, fs) == [
            "/path/to/file000", "/path/to/file001"]

    fs = _MockFS({"/path to/file 000", "/path to/file 001"})
    assert resolve_paths("/path to/file %3d", fs) == [
        "/path to/file 000", "/path to/file 001"]


def test_patharray_star_and_array():
    """PathArrayTest.ParsePath_Star / StarWithSubdirectories /
    ArrayFormat (test_patharray.cpp:444-846)."""
    from trex_tpu.io.patharray import resolve_paths

    fs = _MockFS({"/path/to/file1", "/path/to/file2", "/path/to/file3"})
    assert resolve_paths("/path/to/file*", fs) == [
        "/path/to/file1", "/path/to/file2", "/path/to/file3"]

    # subdirectory contents are not direct children and never match
    fs = _MockFS({"/path/to/file_a.txt", "/path/to/file_b.log",
                  "/path/to/another_file.txt", "/path/to/subdir",
                  "/path/to/subdir/file_c.txt"},
                 folders={"/path/to", "/path/to/subdir"})
    assert resolve_paths("/path/to/*", fs) == [
        "/path/to/another_file.txt", "/path/to/file_a.txt",
        "/path/to/file_b.log", "/path/to/subdir"]

    got = resolve_paths('["path/to/file1","/other/path"]', _MockFS(set()))
    assert got == ["path/to/file1", "/other/path"]


def test_patharray_basename_and_sanitize():
    """FindBasenameTest + SanitizeFilenameTest
    (test_patharray.cpp:849-901)."""
    from trex_tpu.io.patharray import find_basename, sanitize_filename

    assert find_basename([]) == ""
    assert find_basename(["/path/to/file.txt"]) == "file"
    assert find_basename(["/path/to/file.txt", "/path/to/another_file.txt",
                          "/path/to/yet_another.txt"]) == "to"
    assert find_basename(["/path/to/file0001.txt", "/path/to/file0002.txt",
                          "/path/to/file0005.txt"]) == "to"
    assert find_basename(["/first/path/to/file.txt",
                          "/second/path/to/file.txt"]) == "file"

    assert sanitize_filename("") == ""
    assert sanitize_filename("valid_filename.txt") == "valid_filename.txt"
    assert sanitize_filename("s/a*n:i?t|i<z>e>d_filename.txt") == \
        "sanitized_filename.txt"
    assert sanitize_filename("filename.txt  ") == "filename.txt"
    assert sanitize_filename("file name.txt") == "file name.txt"


def test_r3g3b2_conversion_vectors():
    """VecToR3G3B2Test/R3G3B2ToVecTest/ConvertTo+From vectors
    (test_pixels.cpp:629-744): the bit layout is
    [e0:2][e1:3][e2:3] and the inverse is a pure shift expansion."""
    import numpy as np

    from trex_tpu.io.encoding import bgr_to_r3g3b2, r3g3b2_to_bgr

    v = bgr_to_r3g3b2(np.array([[[255, 128, 64]]], np.uint8))[0, 0]
    assert v == 0b11100010

    back = r3g3b2_to_bgr(np.array([[0b11100010]], np.uint8))[0, 0]
    assert tuple(back) == (192, 128, 64)

    # pure channels + white/black (VecToR3G3B2Test.BasicConversion)
    for color, want in (((255, 0, 0), 0b11000000),
                        ((0, 255, 0), 0b00111000),
                        ((0, 0, 255), 0b00000111),
                        ((255, 255, 255), 0b11111111),
                        ((0, 0, 0), 0b00000000)):
        got = bgr_to_r3g3b2(np.array([[color]], np.uint8))[0, 0]
        assert got == want, (color, bin(got), bin(want))


def test_rgb8_threshold_vector():
    """BackgroundThresholding.RGB8AbsoluteDifferenceSimulatedBlob
    (test_pixels.cpp:1073-1167): which pixels survive |diff| >= 25, on
    the grayscale equivalents of the rgb blob/background (the reference
    asserts the rgb8 and gray paths produce the same lines)."""
    import numpy as np

    from trex_tpu.io.encoding import _bgr_luma, storage_to_gray

    bg_rgb = np.array([[(30,) * 3, (50,) * 3, (70,) * 3, (90,) * 3],
                       [(40,) * 3, (60,) * 3, (80,) * 3, (100,) * 3]],
                      np.uint8)
    blob = np.array([(25, 25, 25), (110, 110, 110), (80, 80, 80),
                     (10, 200, 10), (30, 30, 30), (95, 95, 95),
                     (200, 200, 200), (100, 100, 100)], np.uint8)
    gray_blob = storage_to_gray(blob, "rgb8")
    gray_bg = _bgr_luma(bg_rgb[..., 0], bg_rgb[..., 1],
                        bg_rgb[..., 2]).reshape(-1)
    keep = np.abs(gray_blob.astype(int) - gray_bg.astype(int)) >= 25
    # expected survivors: (0,1), (0,3), (1,1), (1,2)
    assert keep.tolist() == [False, True, False, True,
                             False, True, True, False]
    # luma matches cv2 exactly (storage_to_gray feeds the tracking
    # threshold, which must agree with the reference's gray path)
    import cv2

    rgb = np.vstack([blob[None]]).reshape(1, -1, 3)
    assert np.array_equal(
        storage_to_gray(blob, "rgb8"),
        cv2.cvtColor(rgb, cv2.COLOR_BGR2GRAY).reshape(-1))


def test_segmenter_exact_frames_and_conversion_range(tmp_path):
    """SegmenterExactFramesTest (test_segmenter.cpp:143-235): a 12-frame
    synthetic moving-square sequence converts frame-exactly; with
    video_conversion_range=[4,-1] the output has 8 frames whose
    source_index keeps the +4 offset."""
    import cv2

    from trex_tpu.config import reset_global_settings
    from trex_tpu.io.pv import PVFile
    from trex_tpu.pipeline import Segmenter

    src_dir = tmp_path / "source"
    src_dir.mkdir()
    for i in range(12):
        frame = np.zeros((48, 64, 3), np.uint8)
        x = 4 + i * 3
        cv2.rectangle(frame, (x, 18), (x + 8, 26), (255, 255, 255), -1)
        frame[0, 0] = (i, 255 - i, (i * 37) % 256)
        cv2.imwrite(str(src_dir / f"frame_{i:04d}.png"), frame)

    def convert(range_setting, out_name):
        s = reset_global_settings()
        s["detect_type"] = "background_subtraction"
        s["track_background_subtraction"] = True
        s["calculate_posture"] = False
        s["meta_encoding"] = "gray"
        s["frame_rate"] = 25
        s["track_threshold"] = 15
        s["detect_threshold"] = 15
        s["cm_per_pixel"] = 1.0
        s["average_samples"] = 4
        s["detect_size_filter"] = [[1, 10000]]
        s["track_size_filter"] = [[1, 10000]]
        s["track_max_individuals"] = 1
        if range_setting is not None:
            s["video_conversion_range"] = range_setting
        seg = Segmenter(s, str(src_dir / "frame_%04d.png"),
                        tmp_path / out_name, track=False)
        seg.run()
        return PVFile.open(tmp_path / out_name)

    with convert(None, "full.pv") as f:
        assert len(f) == 12
        for i in range(12):
            fr = f.read_frame(i)
            assert fr.source_index == i, (i, fr.source_index)

    with convert([4, -1], "offset.pv") as f:
        assert len(f) == 8
        assert f.header.conversion_start == 4
        for i in range(8):
            fr = f.read_frame(i)
            assert fr.source_index == i + 4, (i, fr.source_index)
