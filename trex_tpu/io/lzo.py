"""ctypes binding for the native LZO1X codec (native/lzo1x.cpp).

The .pv container LZO-compresses frame payloads (reference pv.cpp:713-774);
this module provides `compress`/`decompress` over our fresh C++
implementation of the public LZO1X bitstream.
"""
from __future__ import annotations

import ctypes
import pathlib
import threading

_lib = None
_load_lock = threading.Lock()


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _load_lock:
        return _load_locked()


def _load_locked():
    # double-checked: concurrent first calls must share ONE CDLL —
    # two instances would leave one without restype/argtypes and a
    # void* return truncated to c_int segfaults
    global _lib
    if _lib is not None:
        return _lib
    root = pathlib.Path(__file__).resolve().parents[2]
    so = root / "trex_tpu" / "_native" / "libtrexnative.so"
    if not so.exists():
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "trex_native_build", root / "native" / "build.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        so = mod.build()
    lib = ctypes.CDLL(str(so))
    lib.trex_lzo1x_worst_case.restype = ctypes.c_size_t
    lib.trex_lzo1x_worst_case.argtypes = [ctypes.c_size_t]
    for fn in (lib.trex_lzo1x_compress, lib.trex_lzo1x_decompress):
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
    _lib = lib
    return lib


class LZOError(RuntimeError):
    pass


_ERRORS = {
    -1: "input overrun", -2: "output overrun",
    -3: "lookbehind underrun", -4: "stream corrupt", -5: "bad arguments",
}


def compress(data: bytes) -> bytes:
    lib = _load()
    cap = lib.trex_lzo1x_worst_case(len(data))
    out = ctypes.create_string_buffer(cap)
    out_len = ctypes.c_size_t(0)
    rc = lib.trex_lzo1x_compress(data, len(data), out, cap, ctypes.byref(out_len))
    if rc != 0:
        raise LZOError(f"lzo1x compress failed: {_ERRORS.get(rc, rc)}")
    return out.raw[: out_len.value]


def decompress(data: bytes, uncompressed_size: int) -> bytes:
    lib = _load()
    out = ctypes.create_string_buffer(uncompressed_size or 1)
    out_len = ctypes.c_size_t(0)
    rc = lib.trex_lzo1x_decompress(
        data, len(data), out, uncompressed_size, ctypes.byref(out_len)
    )
    if rc != 0:
        raise LZOError(f"lzo1x decompress failed: {_ERRORS.get(rc, rc)}")
    if out_len.value != uncompressed_size:
        raise LZOError(
            f"lzo1x decompress size mismatch: got {out_len.value}, "
            f"expected {uncompressed_size}"
        )
    return out.raw[: out_len.value]
