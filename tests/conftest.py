import os

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4): must be set before
# jax initialises.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    from lanemapping_tpu.config.config import Config
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return Config.fromfile(os.path.join(repo, "configs", "tiny_test.py"))
