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
