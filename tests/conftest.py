"""Test bootstrap: force CPU JAX with 8 faked devices (SURVEY §7.4).

Must run before jax is imported anywhere, hence the env mutation at module
import time (pytest imports conftest first).  Every distributed/mesh test
relies on the 8 virtual CPU devices; TPU-only tests live in tests/tpu and
opt in explicitly via the `tpu` marker.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) imports jax at
# interpreter startup, freezing jax_platforms=axon before this file runs —
# override through the config API, which wins over the frozen env read.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _isolate_matmul_precision():
    """CLI mains call apply_precision(), which sets the GLOBAL
    jax_default_matmul_precision for the process — without this reset, a
    CLI e2e test leaks its precision into every later test (observed as a
    marginal 2e-6 flake in grid-vs-pair loss equality).  Restore the value
    around every test."""
    before = jax.config.jax_default_matmul_precision
    cache_before = jax.config.jax_compilation_cache_dir
    yield
    if jax.config.jax_default_matmul_precision != before:
        jax.config.update("jax_default_matmul_precision", before)
    if jax.config.jax_compilation_cache_dir != cache_before:
        # --compilation_cache_dir is global config too; a leaked tmp-path
        # cache dir would have every later test try to write a deleted dir.
        # The singleton handle is pinned at first use — reset it as well.
        from jax.experimental.compilation_cache import compilation_cache

        jax.config.update("jax_compilation_cache_dir", cache_before)
        compilation_cache.reset_cache()


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    """A shared synthetic train+dev dataset (see icl.testing.synth)."""
    from icl.testing.synth import SynthConfig, generate_dataset

    d = str(tmp_path_factory.mktemp("synthdata"))
    cfg = SynthConfig(num_images=10, seed=7)
    generate_dataset(d, "train", cfg)
    generate_dataset(d, "dev", SynthConfig(num_images=4, seed=8))
    return d


@pytest.fixture(scope="session")
def emb(synth_dir):
    from icl.data.embeddings import EmbeddingStore

    return EmbeddingStore.load(os.path.join(synth_dir, "embeddings.txt"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
