import os

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4).  The axon TPU
# sitecustomize calls jax.config.update("jax_platforms", "axon,cpu") at
# interpreter start, which overrides the JAX_PLATFORMS env var — so the CPU
# pin must also go through jax.config, before any backend initialises.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture()
def tiny_cfg():
    # function-scoped: several tests mutate the config (net type, data roots)
    from lanemapping_tpu.config.config import Config
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return Config.fromfile(os.path.join(repo, "configs", "tiny_test.py"))
