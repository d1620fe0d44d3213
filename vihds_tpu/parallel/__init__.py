"""Multi-chip execution: device mesh + sharding of the (batch, IWAE) axes.

The reference is strictly single-process, single-device (SURVEY.md §2.4; its
config picks exactly one torch device, reference vihds/config.py:161-178).
The math exposes two embarrassingly parallel axes — the data batch B and the
IWAE sample count K, which only meet again in per-datapoint logsumexps and the
batch mean — so the TPU-native design shards both over a
``Mesh(('data', 'sample'))``:

  * batch-indexed inputs shard over 'data';
  * the latent draw u[B, K, n_theta] (created inside jit) is constrained to
    P('data', 'sample', None), which makes every [B, K, ...] intermediate —
    including the entire ODE trajectory — shard over both axes;
  * parameters/optimizer state are replicated; XLA/GSPMD inserts the psum for
    the gradient all-reduce and the cross-'sample' logsumexp collectives.

The same jitted step runs unchanged on 1 chip or a pod slice.
"""

import contextlib

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH = None


def active_mesh():
    return _ACTIVE_MESH


@contextlib.contextmanager
def use_mesh(mesh):
    """Make ``mesh`` the ambient mesh for sharding constraints inside jit."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


def make_mesh(n_data=None, n_sample=None, devices=None):
    """Build a (data, sample) mesh over the available devices.

    With no arguments, all devices go on the 'sample' axis (IWAE samples are
    the larger parallel axis at the reference's K=200/1000 regimes).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None and n_sample is None:
        n_data, n_sample = 1, n
    elif n_data is None:
        n_data = n // n_sample
    elif n_sample is None:
        n_sample = n // n_data
    assert n_data * n_sample == n, "mesh (%d, %d) != %d devices" % (n_data, n_sample, n)
    arr = np.array(devices).reshape(n_data, n_sample)
    return Mesh(arr, ("data", "sample"))


def constrain_u(u, mesh=None):
    """Shard the latent draw over (data, sample); no-op without a mesh."""
    mesh = mesh if mesh is not None else _ACTIVE_MESH
    if mesh is None:
        return u
    return jax.lax.with_sharding_constraint(u, NamedSharding(mesh, P("data", "sample", None)))


def batch_shardings(mesh):
    """Sharding pytree for a batch AttrDict: batch-indexed leaves over 'data',
    the time vector replicated."""
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    from vihds_tpu.utils.attrdict import AttrDict

    return AttrDict(observations=data_sh, inputs=data_sh, dev_1hot=data_sh, times=repl)


def shard_step(step, mesh):
    """jit a (params, opt_state, batch, mask, key) train step with replicated
    params and 'data'-sharded batch."""
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, repl, batch_shardings(mesh), data_sh, repl),
    )
