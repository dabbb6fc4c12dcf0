"""Numerical-sanity config (SURVEY §5.2): train steps stay NaN-free under
jax.debug_nans — the rebuild's analog of sanitizer CI (the reference had
nothing; single-threaded Python)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icl.data.pipeline import load_mention_dataset
from icl.models import NonvisualModel
from icl.models.nonvisual import mean_pool_tokens
from icl.train import create_train_state, make_mention_train_step


def test_train_step_under_debug_nans(synth_dir, emb):
    ds = load_mention_dataset(synth_dir, "train", "nonvisual", emb)
    table = jnp.asarray(emb.table)
    model = NonvisualModel(hidden=8)
    pooled = mean_pool_tokens(table, jnp.asarray(ds.token_ids[:1]),
                              jnp.asarray(ds.lengths[:1]))
    with jax.debug_nans(True):
        st = create_train_state(model, (pooled,), seed=0)
        step = make_mention_train_step(donate=False)
        st, m = step(st, table, jnp.asarray(ds.token_ids),
                     jnp.asarray(ds.lengths), jnp.asarray(ds.labels),
                     jnp.ones(len(ds.ids), bool))
    assert np.isfinite(float(m["loss"]))
