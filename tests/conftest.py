"""Test harness: 8 virtual CPU devices so mesh/sharding paths run
without TPU hardware (SURVEY.md §4 — the multi-host-simulation layer the
reference lacks).

Note: this image boots an `axon` TPU PJRT plugin from sitecustomize and
pins jax_platforms=axon, so the env var alone is not enough — we must
override the config after jax import, before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache makes repeated suite runs much faster
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_dataset(tmp_path_factory):
    """Small synthetic next-item dataset shared across tests."""
    from recboard_tpu.data import synthetic

    root = str(tmp_path_factory.mktemp("data"))
    synthetic.make_synthetic_dataset(
        root, "Tiny_000_LOU", num_users=60, num_items=40, avg_len=10.0, seed=7
    )
    from recboard_tpu.data.datasets import NextItemRecDataSet

    return NextItemRecDataSet(root, "Tiny_000_LOU")


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
