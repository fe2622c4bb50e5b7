"""Multi-chip dryrun on the virtual 8-device CPU mesh (the driver contract)."""

import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import jax
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    # abstract compile check only (the full SD UNet is heavy on CPU)
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 6, 36, 64, 4)
