"""Persistent XLA compilation cache (--compilation_cache_dir).

Compiled programs must be reusable across PROCESS RESTARTS (SURVEY §5.6
config surface; production motivation: a serve restart re-pays its multi-
second warm-up compiles and a repeated 50k predict sweep its ~47 s first-
run compile wall without this).  Tiny test programs compile in
milliseconds — below jax's default ≥1 s persistence threshold — so these
tests lower the thresholds to observe entries at all; the conftest autouse
fixture restores the cache-dir config after each test.
"""

import os

import jax
import pytest


@pytest.fixture()
def _low_thresholds():
    t, s = (jax.config.jax_persistent_cache_min_compile_time_secs,
            jax.config.jax_persistent_cache_min_entry_size_bytes)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", t)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", s)


def test_enable_compilation_cache_writes_entries(tmp_path, _low_thresholds):
    import jax.numpy as jnp

    from icl.runtime import enable_compilation_cache

    d = tmp_path / "xla_cache"
    enable_compilation_cache(str(d))
    assert d.is_dir()   # created by the helper

    @jax.jit
    def f(x):
        return jnp.tanh(x) @ x.T

    f(jnp.ones((16, 16), jnp.float32)).block_until_ready()
    entries = [e for e in os.listdir(d) if e.endswith("-cache")]
    assert entries, "no cache entries written"


def test_cli_flag_populates_cache(synth_dir, tmp_path, _low_thresholds):
    """The flag plumbs through runtime.init from a task CLI, and a second
    run finds the first run's entries (the restart-reuse contract)."""
    from icl.cli import nonvisual as nv_cli

    d = tmp_path / "cli_cache"
    argv = ["--train", "--data_dir", synth_dir, "--data_split", "train",
            "--epochs", "1", "--batch_size", "8", "--hidden_width", "4",
            "--ckpt_every", "0", "--seed", "1",
            "--model_file", str(tmp_path / "m_cc"),
            "--compilation_cache_dir", str(d)]
    nv_cli.main(list(argv))
    entries = {e for e in os.listdir(d) if e.endswith("-cache")}
    assert entries, "CLI run wrote no cache entries"
    mtimes = {e: os.path.getmtime(d / e) for e in entries}
    nv_cli.main(list(argv))
    after = {e for e in os.listdir(d) if e.endswith("-cache")}
    assert entries <= after
    # reuse, not rewrite: the first run's entries were not re-persisted
    unchanged = [e for e in entries
                 if os.path.getmtime(d / e) == mtimes[e]]
    assert unchanged, "second run rewrote every entry instead of reusing"
