"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import.

Multi-chip sharding logic is validated on virtual CPU devices; the driver
separately dry-runs the multi-chip path, and benchmarks run on real TPU.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# NOTE: the TPU platform plugin in this environment ignores the
# JAX_PLATFORMS env var; the config update below is what actually forces
# the virtual 8-device CPU mesh for tests.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from signature_kmers_tpu.utils.jaxcache import enable_cache  # noqa: E402

enable_cache()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Synthesized training corpus shared by the end-to-end tests."""
    from tests.fixtures.gen_corpus import generate_corpus

    root = tmp_path_factory.mktemp("corpus")
    generate_corpus(root)
    return root
