"""Driver contract: entry() jits single-chip; dryrun_multichip runs the
full multi-device step on the virtual mesh (SURVEY.md §4.9)."""

import sys

import jax
import numpy as np
import pytest


sys.path.insert(0, ".")


def test_entry_compiles_and_steps():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert bool(jax.numpy.all(jax.numpy.isfinite(out.x)))
    assert int(out.step) == int(args[0].step) + 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
