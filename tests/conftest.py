"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
compile and execute without TPU hardware (the reference's analog: RTL tested
under Cyclesim without an FPGA — SURVEY.md §4).
"""

import os
import sys

# Tests run on hermetic CPU devices by default. The baked sitecustomize
# registers the remote-TPU (axon) plugin at *interpreter boot* whenever
# PALLAS_AXON_POOL_IPS is set — that both overrides JAX_PLATFORMS=cpu and
# couples every jax init to tunnel availability (which can wedge and hang
# the process). Registration has already happened by the time conftest
# runs, so the only clean fix is to re-exec pytest once with a scrubbed
# environment before anything imports jax.
#
# The opt-in TPU lane (VCT_TPU_TESTS=1 python -m pytest -m tpu) keeps the
# real backend instead: tests marked `tpu` exercise the Mosaic-compiled
# Pallas kernels and fused sessions on the actual chip and self-skip when
# the backend is not TPU.
TPU_LANE = os.environ.get("VCT_TPU_TESTS") == "1"

import jax  # noqa: E402

if not TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The registration may have force-configured the axon platform already
    # (jax is imported at boot); override through the live config, which
    # wins over both the boot-time setting and the env var.
    jax.config.update("jax_platforms", "cpu")
else:
    # persistent cache: remote Pallas compiles through the tunnel are slow
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pathlib

import numpy as np
import pytest

TEST_DATA = pathlib.Path("/root/reference/jpeg/test_data")
REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def mouse_jpg() -> bytes:
    return (TEST_DATA / "Mouse480.jpg").read_bytes()


@pytest.fixture(scope="session")
def mini64_frames():
    """The three mini64x64 raw YUV fixtures as Frames keyed by subsampling."""
    from video_coding_tpu.common.frame import Frame, ChromaSubsampling

    frames = {}
    for sub, name in [(ChromaSubsampling.C420, "mini64x64.420"),
                      (ChromaSubsampling.C422, "mini64x64.422"),
                      (ChromaSubsampling.C444, "mini64x64.444")]:
        f = Frame.create(sub, 64, 64)
        with open(TEST_DATA / name, "rb") as fh:
            f.input(fh)
        frames[sub] = f
    return frames


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0 ** 2 / mse))


@pytest.fixture(scope="session")
def psnr_fn():
    return psnr
