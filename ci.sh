#!/usr/bin/env bash
# CI entrypoint (the counterpart of the reference's
# Application/Tests/run_unix.bash driven from its 3-OS conda CI):
#   1. build the native library from source (portable flags)
#   2. run the full pytest suite on a virtual 8-device CPU mesh
#   3. run the golden-fixture harness end-to-end (3 match modes)
set -euo pipefail
cd "$(dirname "$0")"

echo "== native build =="
python native/build.py --force

echo "== test suite =="
python -m pytest tests/ -q

echo "== golden harness =="
if [ -d /root/reference/videos/test_frames ]; then
    python tools/run_harness.py
else
    echo "(fixture not available; skipped)"
fi

echo "CI OK"
