"""Driver contract: entry() compiles and dryrun_multichip runs on 8 devices."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 128, 128, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_eight_devices(devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_subset(devices):
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)
