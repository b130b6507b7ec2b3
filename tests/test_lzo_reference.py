"""Differential test of the fresh LZO1X codec (native/lzo1x.cpp)
against the reference's vendored minilzo (compiled from
/root/reference/Application/src/ProcessedVideo/lzo/minilzo.c — build
artifacts land in a temp dir, the reference tree stays untouched).

Both directions on fuzz corpora:
- ours-compress -> minilzo-decompress (bitstream validity)
- minilzo-compress -> ours-decompress (decoder completeness)
"""
import ctypes
import pathlib
import subprocess

import numpy as np
import pytest

from trex_tpu.io import lzo as our_lzo

MINILZO_DIR = pathlib.Path(
    "/root/reference/Application/src/ProcessedVideo/lzo")


@pytest.fixture(scope="module")
def minilzo(tmp_path_factory):
    if not (MINILZO_DIR / "minilzo.c").exists():
        pytest.skip("reference minilzo.c not available")
    out = tmp_path_factory.mktemp("minilzo") / "libminilzo.so"
    try:
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC",
             "-I", str(MINILZO_DIR),
             "-o", str(out), str(MINILZO_DIR / "minilzo.c")],
            check=True, capture_output=True, timeout=120)
    except Exception as e:
        pytest.skip(f"minilzo build failed: {e}")
    lib = ctypes.CDLL(str(out))
    # lzo_uint is lzo_ulong_t (unsigned long on this ABI)
    ulp = ctypes.POINTER(ctypes.c_ulong)
    lib.lzo1x_1_compress.restype = ctypes.c_int
    lib.lzo1x_1_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong, ctypes.c_char_p, ulp,
        ctypes.c_void_p]
    lib.lzo1x_decompress.restype = ctypes.c_int
    lib.lzo1x_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong, ctypes.c_char_p, ulp,
        ctypes.c_void_p]
    return lib


def _mlzo_compress(lib, data: bytes) -> bytes:
    out = ctypes.create_string_buffer(len(data) + len(data) // 16 + 128)
    out_len = ctypes.c_ulong(0)
    wrk = ctypes.create_string_buffer(16384 * 8)  # LZO1X_1_MEM_COMPRESS
    rc = lib.lzo1x_1_compress(data, len(data), out,
                              ctypes.byref(out_len), wrk)
    assert rc == 0
    return out.raw[: out_len.value]


def _mlzo_decompress(lib, data: bytes, orig_len: int) -> bytes:
    out = ctypes.create_string_buffer(orig_len + 16)
    out_len = ctypes.c_ulong(orig_len)
    rc = lib.lzo1x_decompress(data, len(data), out,
                              ctypes.byref(out_len), None)
    assert rc == 0, f"minilzo decompress rc={rc}"
    return out.raw[: out_len.value]


def _corpora():
    rng = np.random.default_rng(1234)
    out = []
    for n in (1, 2, 15, 64, 255, 4096, 70000):
        out.append(rng.integers(0, 256, n).astype(np.uint8).tobytes())
        out.append(np.zeros(n, np.uint8).tobytes())
        # pv-like: long constant stretches + sparse values
        a = np.full(n, 200, np.uint8)
        idx = rng.integers(0, n, max(1, n // 20))
        a[idx] = rng.integers(0, 256, len(idx)).astype(np.uint8)
        out.append(a.tobytes())
        # short-period repeats (match-length edge cases)
        out.append((bytes(rng.integers(0, 256, 7).astype(np.uint8))
                    * (n // 7 + 1))[:n])
    return out


def test_ours_decodes_minilzo(minilzo):
    for data in _corpora():
        comp = _mlzo_compress(minilzo, data)
        back = our_lzo.decompress(comp, len(data))
        assert bytes(back) == data


def test_minilzo_decodes_ours(minilzo):
    for data in _corpora():
        comp = our_lzo.compress(data)
        back = _mlzo_decompress(minilzo, bytes(comp), len(data))
        assert back == data


def test_fuzz_roundtrip_cross(minilzo):
    rng = np.random.default_rng(99)
    for _ in range(200):
        n = int(rng.integers(1, 3000))
        kind = rng.integers(0, 3)
        if kind == 0:
            data = rng.integers(0, 256, n).astype(np.uint8)
        elif kind == 1:
            data = np.full(n, int(rng.integers(0, 256)), np.uint8)
            data[rng.random(n) < 0.1] = 7
        else:
            period = int(rng.integers(1, 40))
            data = np.resize(
                rng.integers(0, 256, period).astype(np.uint8), n)
        data = data.tobytes()
        assert bytes(our_lzo.decompress(
            _mlzo_compress(minilzo, data), len(data))) == data
        assert _mlzo_decompress(
            minilzo, bytes(our_lzo.compress(data)), len(data)) == data
