"""Test configuration: force an 8-virtual-device CPU platform.

The environment registers a remote TPU backend at interpreter startup (and
overrides JAX_PLATFORMS), so tests explicitly pin jax to the host CPU
platform with 8 virtual devices — multi-chip sharding tests then run without
TPU hardware, as planned in SURVEY.md section 4.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# persistent compile cache: the suite's dominant cost is re-compiling the
# same 8-device shard_map / scan programs on every run; cache entries are
# keyed by HLO hash + device topology, so repeat runs skip XLA entirely
jax.config.update("jax_compilation_cache_dir", str(
    __import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache_cpu"
))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multi_modal_gnn_tpu.utils.platform import force_cpu_devices  # noqa: E402

force_cpu_devices(8)

assert jax.default_backend() == "cpu", f"tests require CPU backend, got {jax.default_backend()}"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from multi_modal_gnn_tpu.config import Config  # noqa: E402
from multi_modal_gnn_tpu.data.synthetic import SyntheticSpec, make_synthetic_bundle  # noqa: E402


@pytest.fixture(scope="session")
def config() -> Config:
    return Config()


@pytest.fixture(scope="session")
def tiny_bundle(config):
    return make_synthetic_bundle(SyntheticSpec.tiny(), config)


@pytest.fixture(scope="session")
def tiny_graph(tiny_bundle):
    return tiny_bundle.graph


@pytest.fixture()
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
