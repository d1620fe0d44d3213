"""Training-state checkpointing: params + optimizer state + RNG key + epoch.

The reference has NO model-weight checkpointing at all (no torch.save
anywhere; persistence is results-level only — SURVEY.md §5.4, reference
vihds/utils.py:101-156).  This module fills that gap with orbax-backed
save/restore so long runs survive preemption.
"""

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(directory, max_to_keep=3):
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save(directory, epoch, params, opt_state, key, extra=None):
    """Write a checkpoint for ``epoch`` under ``directory``.

    ``key`` is a raw uint32 PRNG key array (jax.random.PRNGKey)."""
    mgr = _manager(directory)
    state = {
        "params": params,
        "opt_state": opt_state,
        "key": np.asarray(key),
        "extra": extra or {},
    }
    mgr.save(epoch, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_epoch(directory):
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore(directory, epoch=None, template=None):
    """Load the checkpoint at ``epoch`` (default: latest).  Returns
    (epoch, state dict) or (None, None) when nothing is saved."""
    mgr = _manager(directory)
    step = epoch if epoch is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return None, None
    if template is not None:
        state = mgr.restore(step, args=ocp.args.StandardRestore(template))
    else:
        state = mgr.restore(step)
    mgr.close()
    if state.get("key") is not None:
        state["key"] = jax.numpy.asarray(np.asarray(state["key"]), dtype=jax.numpy.uint32)
    return step, state
