"""The driver entry points must compile and run on the virtual mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_entry_forward_jits():
    import __graft_entry__ as g

    fn, args = g.entry()
    rgba, vmin, vmax = jax.jit(fn)(*args)
    assert rgba.shape == (128, 256, 4) and rgba.dtype == np.uint8
    assert float(vmax) > float(vmin)


def test_dryrun_multichip_eight():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
