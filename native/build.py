#!/usr/bin/env python3
"""Build the native C++ support library (libtrexnative.so).

Contains host-side hot paths that stay off the TPU: the LZO1X codec for
.pv frame payloads, and (as they land) connected-component labeling and
pv frame encode/decode fast paths.
"""
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).parent
OUT = HERE.parent / "trex_tpu" / "_native"
SOURCES = sorted(HERE.glob("*.cpp"))


def build(force: bool = False) -> pathlib.Path:
    OUT.mkdir(exist_ok=True)
    target = OUT / "libtrexnative.so"
    if not force and target.exists():
        newest = max(s.stat().st_mtime for s in SOURCES)
        if target.stat().st_mtime >= newest:
            return target
    import os

    # portable baseline by default (x86-64-v2-ish via -O3 alone);
    # opt into host tuning with TREX_NATIVE_MARCH=native — the
    # reference ships portable conda binaries the same way
    march = os.environ.get("TREX_NATIVE_MARCH", "")
    cmd = [
        # -ffp-contract=off: kernels that mirror numpy float32 math
        # (posture resample/walk) must not fuse mul+add into FMA, or
        # results drift 1 ulp from the python reference paths
        "g++", "-O3", "-ffp-contract=off",
        "-std=c++20", "-shared", "-fPIC",
        "-fvisibility=default", "-o", str(target),
    ]
    if march:
        cmd.insert(2, f"-march={march}")
    cmd += [str(s) for s in SOURCES] + ["-lpthread"]
    subprocess.run(cmd, check=True)
    return target


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
