"""Test configuration: run everything on a virtual 8-device CPU mesh so no
TPU is required for CI (mirrors the reference's CPU-runnable test strategy,
Application/Tests/run_unix.bash)."""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture()
def settings():
    """A fresh global settings registry per test."""
    from trex_tpu.config import reset_global_settings

    s = reset_global_settings()
    yield s
    reset_global_settings()


REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def fixture_frames_dir():
    import pathlib

    p = pathlib.Path(REFERENCE) / "videos" / "test_frames"
    if not p.exists():
        pytest.skip("reference fixture frames not available")
    return p


@pytest.fixture(scope="session")
def fixture_settings_path():
    import pathlib

    p = pathlib.Path(REFERENCE) / "videos" / "test.settings"
    if not p.exists():
        pytest.skip("reference fixture settings not available")
    return p
