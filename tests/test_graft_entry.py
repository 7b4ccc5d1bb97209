"""Driver-contract tests: entry() compiles; dryrun_multichip runs a full
sharded pretrain step on the virtual 8-device mesh."""

import jax
import pytest


def test_entry_compiles():
    import __graft_entry__ as g

    fn, (variables, pts) = g.entry()
    out = jax.jit(fn)(variables, pts)
    proj, backbone = out
    assert proj.shape == (8, 256)
    assert backbone.shape == (8, 512)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
