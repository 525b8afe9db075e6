"""The driver compile-checks `__graft_entry__` every round — pin both gates
on the CPU backend so an API change can never silently break them. (conftest
already forces CPU and an 8-device virtual mesh.)"""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    kp, valid, refined = out
    assert kp.shape[-1] == 2 and valid.ndim == 2
    assert np.isfinite(np.asarray(refined)).all()


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
