"""Test harness config: force an 8-device virtual CPU mesh so multi-chip
sharding paths compile and execute without TPU hardware."""
import os

# Force CPU regardless of the ambient JAX_PLATFORMS (the machine exports
# the axon TPU platform; tests must run on the virtual 8-device CPU mesh)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from synapta_tpu.utils.jaxsetup import setup_jax  # noqa: E402
setup_jax()

import pytest  # noqa: E402

GOLDEN_DIR = Path("/root/reference/extracted_visuals_excelSS")


@pytest.fixture(scope="session")
def golden_segments_path():
    return GOLDEN_DIR / "textbook_001_visual_segments.json"


@pytest.fixture(scope="session")
def golden_csv_path():
    return GOLDEN_DIR / "textbook_001_visual_summary.csv"
