"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    assert len(jax.devices()) == 8
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, (params, batch) = ge.entry()
    out = jax.jit(fn)(params, batch)
    assert np.isfinite(float(out[0]))
