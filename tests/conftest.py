"""Test configuration: run everything on a virtual 8-device CPU mesh so no
TPU is required for CI (mirrors the reference's CPU-runnable test strategy,
Application/Tests/run_unix.bash)."""
import os

# The shell environment on this machine pre-sets JAX_PLATFORMS=axon (one
# real TPU chip) and jax is PRE-IMPORTED by a sitecustomize hook, so env
# vars alone are too late — force the platform via jax.config before any
# backend initializes. Tests run on a virtual 8-device CPU mesh; set
# TREX_TEST_TPU=1 to run the suite against the real chip instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if not os.environ.get("TREX_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # hermetic: the sitecustomize force-registers the accelerator
    # backend in SUBPROCESSES regardless of JAX_PLATFORMS, so the
    # auto-promotion probe would intermittently report healthy and
    # route tests onto the real (flaky-tunnel) device. This env var
    # makes _accelerator_healthy return False everywhere, including
    # CLI subprocess tests.
    os.environ["TREX_NO_ACCELERATOR"] = "1"
    import jax

    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_global_settings():
    """Every test starts from default global settings — the CLI and
    many helpers read the process-global registry, so one test's
    s.set() must not leak into the next (a leaked averaging_method
    once silently changed the golden fixture's background)."""
    from trex_tpu.config import reset_global_settings

    reset_global_settings()
    yield


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
