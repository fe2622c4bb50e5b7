"""Preemption-safe + async checkpointing (train/checkpoint.py additions).

The reference has no failure handling (SURVEY.md section 5.3: its
``resume_from_checkpoint`` is accepted and ignored); these tests pin the
TPU-native replacement — an async orbax session and a SIGTERM-to-flag
guard the trainers poll between epoch dispatches.
"""

import os
import signal

import numpy as np
import jax.numpy as jnp

from eeg2video_tpu.train.checkpoint import (CheckpointSession, PreemptionGuard,
                                            restore_checkpoint)


def test_session_async_saves_and_restore(tmp_path):
    d = str(tmp_path / "ckpt")
    with CheckpointSession(d, max_to_keep=2) as s:
        s.save(1, {"w": jnp.arange(4.0), "step": jnp.asarray(1)})
        s.save(2, {"w": jnp.arange(4.0) * 2, "step": jnp.asarray(2)})
    out, step = restore_checkpoint(d)
    assert step == 2
    np.testing.assert_array_equal(np.asarray(out["w"]), [0, 2, 4, 6])


def test_preemption_guard_sets_flag_and_restores_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.preempted
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.preempted  # converted to a flag, process survives
    assert signal.getsignal(signal.SIGTERM) is prev


def test_preempted_train_loop_saves_resumable_state(tmp_path):
    """A toy epoch loop shaped like cli.train_tuneavideo's: preemption after
    epoch 2 of 10 saves {params, opt_state, step} and exits; the restore
    carries the exact state."""
    d = str(tmp_path / "ckpt")
    state = {"params": jnp.zeros(3), "opt": jnp.zeros(3), "step": jnp.asarray(0)}
    ran = []
    with CheckpointSession(d) as session, PreemptionGuard() as guard:
        for epoch in range(1, 11):
            state = {"params": state["params"] + 1.0, "opt": state["opt"] + 0.5,
                     "step": state["step"] + 5}
            ran.append(epoch)
            if epoch == 2:
                os.kill(os.getpid(), signal.SIGTERM)
            if guard.preempted:
                session.save(epoch, state)
                break
    assert ran == [1, 2]
    out, step = restore_checkpoint(d)
    assert step == 2
    np.testing.assert_array_equal(np.asarray(out["params"]), [2, 2, 2])
    assert int(out["step"]) == 10
