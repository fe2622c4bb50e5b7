"""Multi-chip dryrun on the virtual 8-device CPU mesh (the driver contract).

The two heavy tests are marked ``slow``: the driver itself executes these
EXACT functions on every round (dryrun_multichip(N) -> MULTICHIP_r*.json,
entry() compile-check -> bench), so the default suite run keeps only the
cheap import/shape contract and `-m slow` re-runs the full thing locally.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")


def test_entry_contract():
    """Default-on fast leg: the module exposes both driver hooks with the
    right shapes of argument lists (full executions are the driver's job
    each round and available via `pytest -m slow`)."""
    import inspect
    import __graft_entry__

    assert callable(__graft_entry__.entry)
    sig = inspect.signature(__graft_entry__.dryrun_multichip)
    assert list(sig.parameters) == ["n_devices"]


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import jax
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    # abstract compile check only (the full SD UNet is heavy on CPU)
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 6, 36, 64, 4)
