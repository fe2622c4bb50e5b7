"""Checkpoint / resume via orbax — real recovery, unlike the reference whose
``resume_from_checkpoint`` parameter is accepted and ignored
(reference train_finetune_videodiffusion.py:91; SURVEY.md section 5.3-5.4).

Saves {params, opt_state, step} atomically; also provides torch-artifact
loaders for the reference's ``.pt`` checkpoints ({'state_dict': ...} dicts,
e.g. seq2seqmodel.pt / eeg2text_40_classes.pt) so reference-trained weights
drop straight in through the convert.* mappings.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _mgr(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str, step: int, tree: Any, max_to_keep: int = 3):
    """Save a pytree (params / opt_state / anything) at ``step``."""
    import orbax.checkpoint as ocp

    mgr = _mgr(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(tree))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       template: Any = None):
    """Restore the latest (or given) step.  ``template`` (a matching pytree of
    arrays/ShapeDtypeStructs) restores with correct dtypes/shardings."""
    import orbax.checkpoint as ocp

    mgr = _mgr(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        mgr.close()
        return None, None
    if template is not None:
        out = mgr.restore(step, args=ocp.args.StandardRestore(template))
    else:
        out = mgr.restore(step)
    mgr.close()
    return out, step


def restore_train_state(directory: str, state, step: Optional[int] = None):
    """Resume a full TrainState from a {params, opt_state, step} checkpoint
    (what cli.train_tuneavideo saves); params-only checkpoints (older
    format, or exported weights) restore with the optimizer state freshly
    initialized.  ``state`` provides the template — including shardings, so
    a mesh-placed state restores sharded."""
    template = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step}
    try:
        out, at = restore_checkpoint(directory, step=step, template=template)
        return state.replace(params=out["params"], opt_state=out["opt_state"],
                             step=out["step"]), at
    except Exception:
        out, at = restore_checkpoint(directory, step=step)
        params = out["params"] if isinstance(out, dict) and "params" in out else out
        params = jax.tree.unflatten(jax.tree.structure(state.params),
                                    jax.tree.leaves(params))
        return state.replace(params=params), at


class CheckpointSession:
    """Persistent async checkpointing for a long training run.

    ``save_checkpoint`` opens a manager, blocks until the write is durable,
    and closes it — right for one-shot saves, wasteful inside a training
    loop where the device would idle on host serialization.  A session keeps
    one orbax ``CheckpointManager`` open and lets saves run asynchronously:
    ``save`` returns once the arrays are snapshotted to host memory and the
    directory write continues on orbax's background thread while the next
    epoch trains.  ``close`` (or context exit) drains pending writes.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = _mgr(directory, max_to_keep)

    def save(self, step: int, tree: Any):
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(tree))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PreemptionGuard:
    """Convert SIGTERM/SIGINT into a cooperative shutdown flag.

    The reference has no failure handling at all (SURVEY.md section 5.3: its
    ``resume_from_checkpoint`` is ignored and the only recovery point is the
    every-100-epochs ``save_pretrained``).  TPU pods ARE preempted
    (maintenance events deliver SIGTERM); trainers poll ``preempted``
    between epoch dispatches and save a final resumable checkpoint instead
    of dying mid-epoch.  Installed handlers chain to (and are restored to)
    the previous ones on exit; a second signal falls through to the previous
    handler immediately, so a double Ctrl-C still force-kills.
    """

    def __init__(self, signals=None):
        import signal as _signal

        self._signal = _signal
        self._signals = signals or (_signal.SIGTERM, _signal.SIGINT)
        self._prev = {}
        self.preempted = False

    def _handler(self, signum, frame):
        if self.preempted:  # second signal: defer to the original handler
            prev = self._prev.get(signum)
            if callable(prev):
                return prev(signum, frame)
            raise KeyboardInterrupt
        self.preempted = True

    def __enter__(self):
        try:
            for s in self._signals:
                self._prev[s] = self._signal.signal(s, self._handler)
        except ValueError:
            # signal handlers only install from the main thread (e.g. the
            # trainer embedded in a server worker): restore what we set and
            # degrade to a guard that never trips
            for s, prev in self._prev.items():
                self._signal.signal(s, prev)
            self._prev = {}
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            self._signal.signal(s, prev)
        return False


def load_torch_state_dict(path: str):
    """Load a reference ``.pt`` checkpoint into a {name: np.ndarray} dict.
    Handles both raw state dicts and the {'state_dict': ...} wrapper the
    reference uses (eeg_text.py:175, my_autoregressive_transformer.py:391)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, dict):  # whole-module torch.save(net) (EEG_VP L167)
        obj = obj.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in obj.items()}
