"""PV container tests: roundtrip, byte-layout invariants, LZO framing.

Byte layout per reference Application/src/ProcessedVideo/pv.cpp:1053-1099
and docs/formats.rst (PreprocessedVideo section)."""
import struct

import numpy as np
import pytest

from trex_tpu.io import lzo
from trex_tpu.io.pv import (
    CURRENT_VERSION,
    PVFile,
    PVFrame,
    PVHeader,
    lines_num_pixels,
    pack_lines,
    serialize_frame,
    unpack_lines,
)


def _blob(y0=10, x0=5, rows=3, width=4):
    lines = np.array([[y0 + i, x0, x0 + width - 1] for i in range(rows)],
                     dtype=np.int32)
    px = np.arange(lines_num_pixels(lines), dtype=np.uint8)
    return lines, px


def test_pack_lines_layout():
    lines = np.array([[7, 3, 10], [7, 15, 20], [8, 2, 5]], dtype=np.int32)
    data = pack_lines(lines)
    assert len(data) == 12  # 4 bytes per line
    x0s = np.frombuffer(data, "<u2")[0::2]
    x1p = np.frombuffer(data, "<u2")[1::2]
    assert list(x0s) == [3, 15, 2]
    # x1 in upper 15 bits, eol bit 0 set on last line of each y
    assert list(x1p >> 1) == [10, 20, 5]
    assert list(x1p & 1) == [0, 1, 1]
    back = unpack_lines(data, 7)
    np.testing.assert_array_equal(back, lines)


def test_pack_lines_rejects_row_gap():
    with pytest.raises(ValueError):
        pack_lines(np.array([[1, 0, 3], [3, 0, 3]]))


def test_frame_payload_layout():
    f = PVFrame(timestamp=1000, source_index=5)
    lines, px = _blob()
    f.add_object(lines, px)
    payload, compressed = serialize_frame(f, "gray")
    assert not compressed
    ts, n, src = struct.unpack_from("<QHi", payload, 0)
    assert (ts, n, src) == (1000, 1, 5)
    start_y, flags, mask_n = struct.unpack_from("<HBH", payload, 14)
    assert (start_y, flags, mask_n) == (10, 0, 3)
    # trailing u16 prediction count == 0
    assert struct.unpack_from("<H", payload, len(payload) - 2)[0] == 0


def test_file_roundtrip(tmp_path):
    h = PVHeader(encoding="gray", width=64, height=48,
                 average=np.full((48, 64), 100, np.uint8),
                 name="testproj", timestamp=1_700_000_000_000_000)
    path = tmp_path / "a.pv"
    frames = []
    with PVFile.create(path, h) as f:
        f.set_metadata({"cm_per_pixel": 0.5, "detect_type": "yolo"})
        for i in range(5):
            fr = PVFrame(timestamp=1000 * (i + 1), source_index=i)
            lines, px = _blob(y0=5 + i)
            fr.add_object(lines, px)
            lines2, px2 = _blob(y0=30, x0=20, rows=2, width=7)
            fr.add_object(lines2, px2)
            f.add_frame(fr)
            frames.append(fr)

    with PVFile.open(path) as f:
        h2 = f.header
        assert h2.version == CURRENT_VERSION
        assert h2.encoding == "gray"
        assert (h2.width, h2.height) == (64, 48)
        assert h2.num_frames == 5
        assert h2.name == "testproj"
        assert h2.timestamp == 1_700_000_000_000_000
        np.testing.assert_array_equal(h2.average[:, :, 0],
                                      np.full((48, 64), 100))
        meta = h2.metadata_dict()
        assert meta["cm_per_pixel"] == 0.5
        assert meta["detect_type"] == "yolo"
        for i, orig in enumerate(frames):
            fr = f.read_frame(i)
            assert fr.timestamp == orig.timestamp
            assert fr.source_index == i
            assert fr.n == 2
            for j in range(2):
                np.testing.assert_array_equal(fr.masks[j], orig.masks[j])
                np.testing.assert_array_equal(fr.pixels[j], orig.pixels[j])


def test_large_frame_gets_compressed(tmp_path):
    h = PVHeader(encoding="gray", width=400, height=300)
    path = tmp_path / "c.pv"
    rng = np.random.default_rng(0)
    with PVFile.create(path, h) as f:
        fr = PVFrame(timestamp=1)
        # a big blob -> payload >= 15000 bytes triggers LZO
        lines = np.array([[y, 0, 299] for y in range(100)], dtype=np.int32)
        px = rng.integers(90, 110, lines_num_pixels(lines), dtype=np.uint8)
        fr.add_object(lines, px)
        f.add_frame(fr)
        offset = f.header.index_table[0]
    raw = path.read_bytes()
    assert raw[offset] == 1  # compression flag set
    comp_size, uncomp_size = struct.unpack_from("<II", raw, offset + 1)
    assert uncomp_size >= 15000
    payload = lzo.decompress(raw[offset + 9 : offset + 9 + comp_size],
                             uncomp_size)
    assert struct.unpack_from("<Q", payload, 0)[0] == 1
    with PVFile.open(path) as f:
        fr = f.read_frame(0)
        np.testing.assert_array_equal(fr.pixels[0], px)


def test_binary_encoding_no_pixels(tmp_path):
    h = PVHeader(encoding="binary", width=32, height=32)
    path = tmp_path / "b.pv"
    with PVFile.create(path, h) as f:
        fr = PVFrame(timestamp=1)
        lines, _ = _blob()
        fr.add_object(lines)
        f.add_frame(fr)
    with PVFile.open(path) as f:
        fr = f.read_frame(0)
        assert fr.pixels[0] is None
        np.testing.assert_array_equal(fr.masks[0], lines)


def test_monotonic_timestamps_enforced(tmp_path):
    h = PVHeader(encoding="gray", width=8, height=8)
    with PVFile.create(tmp_path / "m.pv", h) as f:
        fr = PVFrame(timestamp=10)
        lines, px = _blob(rows=1, width=2)
        fr.add_object(lines, px)
        f.add_frame(fr)
        fr2 = PVFrame(timestamp=10)
        fr2.add_object(lines, px)
        with pytest.raises(ValueError):
            f.add_frame(fr2)


def test_empty_objects_dropped():
    fr = PVFrame()
    fr.add_object(np.zeros((0, 3), np.int32))
    assert fr.n == 0


def test_index_table_allows_random_access(tmp_path):
    h = PVHeader(encoding="gray", width=16, height=16)
    path = tmp_path / "r.pv"
    with PVFile.create(path, h) as f:
        for i in range(10):
            fr = PVFrame(timestamp=100 * (i + 1), source_index=i)
            lines, px = _blob(y0=i, rows=1, width=i + 1)
            fr.add_object(lines, px)
            f.add_frame(fr)
    with PVFile.open(path) as f:
        fr = f.read_frame(7)
        assert fr.source_index == 7
        assert lines_num_pixels(fr.masks[0]) == 8


def _fill_frame(i, w=50, h=50):
    from trex_tpu.io.pv import PVFrame

    fr = PVFrame(timestamp=1000 + i * 40000)
    lines = np.array([[10 + i % 5, 5, 9], [11 + i % 5, 5, 9]], np.int32)
    fr.add_object(lines, pixels=np.full(10, 30 + i, np.uint8))
    return fr


def test_pv_modify_jump_around(tmp_path):
    """PVTest.JumpAroundInFile (test_sam3interactivesession.cpp:167):
    write 10 frames, reopen MODIFY, reset_to_frame(2), append two
    frames, reopen read -> 4 frames."""
    from trex_tpu.io.pv import PVFile, PVHeader

    p = tmp_path / "test.pv"
    h = PVHeader(width=50, height=50, encoding="gray",
                 average=np.zeros((50, 50), np.uint8), source="virtual")
    with PVFile.create(p, h) as f:
        for i in range(10):
            f.add_frame(_fill_frame(i))
        assert f.header.num_frames == 10

    f = PVFile.open_modify(p)
    f.reset_to_frame(2)
    assert f.header.num_frames == 2
    f.add_frame(_fill_frame(2))
    assert f.header.num_frames == 3
    f.add_frame(_fill_frame(3))
    assert f.header.num_frames == 4
    f.close()

    with PVFile.open(p) as rd:
        assert len(rd) == 4
        for i in range(4):
            fr = rd.read_frame(i)
            assert fr.n == 1
            assert fr.timestamp == 1000 + i * 40000
            assert fr.pixels[0][0] == 30 + i


def test_pv_modify_append_without_reset(tmp_path):
    """MODIFY without reset: appending continues after the last
    frame (pv::File WRITE->MODIFY reopen)."""
    from trex_tpu.io.pv import PVFile, PVHeader

    p = tmp_path / "t.pv"
    h = PVHeader(width=50, height=50, encoding="gray",
                 average=np.zeros((50, 50), np.uint8))
    with PVFile.create(p, h) as f:
        for i in range(3):
            f.add_frame(_fill_frame(i))
    f = PVFile.open_modify(p)
    f.add_frame(_fill_frame(3))
    f.close()
    with PVFile.open(p) as rd:
        assert len(rd) == 4
        assert rd.read_frame(3).timestamp == 1000 + 3 * 40000


def test_pv_reset_to_zero(tmp_path):
    from trex_tpu.io.pv import PVFile, PVHeader

    p = tmp_path / "z.pv"
    h = PVHeader(width=50, height=50, encoding="gray",
                 average=np.zeros((50, 50), np.uint8))
    with PVFile.create(p, h) as f:
        for i in range(5):
            f.add_frame(_fill_frame(i))
    f = PVFile.open_modify(p)
    f.reset_to_frame(0)
    assert f.header.num_frames == 0
    f.add_frame(_fill_frame(0))
    f.close()
    with PVFile.open(p) as rd:
        assert len(rd) == 1


def test_correct_illegal_lines_on_read(tmp_path):
    """correct_illegal_lines: overlapping lines from old writers are
    sorted and clamped on read, with the pixel array re-sliced to
    match (grabber doc; off by default so normal reads pay nothing)."""
    import numpy as np

    from trex_tpu.config import reset_global_settings
    from trex_tpu.io.pv import PVFile, PVFrame, PVHeader

    s = reset_global_settings()
    bg = np.full((20, 20), 99, np.uint8)
    p = tmp_path / "ill.pv"
    with PVFile.create(p, PVHeader(width=20, height=20,
                                   average=bg)) as f:
        fr = PVFrame(timestamp=100)
        # lines overlap on row 5: [2..8] and [6..10]
        lines = np.array([[5, 2, 8], [5, 6, 10]], np.int32)
        px = np.concatenate([np.arange(7), 50 + np.arange(5)]) \
            .astype(np.uint8)
        fr.add_object(lines, px)
        f.add_frame(fr)

    # default: raw lines come back verbatim (overlap preserved)
    with PVFile.open(p) as f:
        fr = f.read_frame(0)
    assert fr.masks[0].shape == (2, 3)
    assert fr.masks[0][1][1] == 6

    s.set("correct_illegal_lines", True)
    with PVFile.open(p) as f:
        fr = f.read_frame(0)
    m = fr.masks[0]
    # second line clamped past the first: [5, 9, 10]
    assert m.tolist() == [[5, 2, 8], [5, 9, 10]]
    # pixels re-sliced: 7 from the first line, the LAST 2 of the second
    np.testing.assert_array_equal(
        fr.pixels[0], np.array([0, 1, 2, 3, 4, 5, 6, 53, 54],
                               np.uint8))
