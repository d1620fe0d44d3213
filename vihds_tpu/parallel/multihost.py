"""Multi-host (pod-slice) initialisation helpers.

One process per host, jax.distributed coordination, and a global
(data, sample) mesh spanning every chip in the slice.  The per-host batch
pipeline feeds each process its own shard of the data axis via
``jax.make_array_from_process_local_data``; the jitted train step is the same
one used on a single chip (GSPMD inserts the cross-host collectives over
DCN/ICI).

This module cannot be exercised in this environment (one chip, one host); it
is covered indirectly by the virtual-device mesh tests
(tests/test_parallel.py) which validate the sharding program itself.
"""

import jax

from vihds_tpu import parallel


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialise jax.distributed (no-op when single-process).

    On TPU pods the three arguments are discovered from the environment;
    pass them explicitly for CPU/GPU clusters.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count(), jax.process_index()


def global_mesh(n_data=None, n_sample=None):
    """A mesh over every device in the slice (all processes)."""
    return parallel.make_mesh(n_data=n_data, n_sample=n_sample, devices=jax.devices())


def host_local_batch_to_global(mesh, batch):
    """Assemble a globally-sharded batch from per-process host shards.

    Each process passes its local slice of the batch (equal row counts); the
    result is addressable inside jit exactly like a single-host batch.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vihds_tpu.utils.attrdict import AttrDict

    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def to_global(x, sharding):
        return jax.make_array_from_process_local_data(sharding, x)

    return AttrDict(
        observations=to_global(batch.observations, data_sh),
        inputs=to_global(batch.inputs, data_sh),
        dev_1hot=to_global(batch.dev_1hot, data_sh),
        times=to_global(batch.times, repl),
    )
