"""Multi-host (pod-slice) initialisation helpers.

One process per host, jax.distributed coordination, and a global
(data, sample) mesh spanning every chip in the slice.  The per-host batch
pipeline feeds each process its own shard of the data axis via
``jax.make_array_from_process_local_data``; the jitted train step is the same
one used on a single chip (GSPMD inserts the cross-host collectives over
DCN/ICI).

Product callers: ``run_xval``/``call_run_xval`` call ``initialize_from_args``
(``--distributed auto`` on a pod slice; explicit ``HOST:PORT,NPROC,PID`` on
CPU clusters), build the global mesh with the ordinary ``--mesh`` flags, and
``Training`` feeds globally-sharded batches / gates artifact writes on
``is_main()``.  Real pod hardware is unreachable from this environment (one
chip, one host); the path is exercised by tests/test_multihost.py (2-process
value/grad match) and tests/test_multihost_cli.py (2-process CLI e2e whose
artifacts match the single-process run, plus a 2-process checkpoint/resume
run that replays the continuous run's validation trajectory).
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


def initialize_from_args(args):
    """Product entry: wire ``--distributed`` (or env) into jax.distributed.

    Accepted values of ``args.distributed`` / ``$VIHDS_DISTRIBUTED``:

    * ``auto`` — ``jax.distributed.initialize()`` with no arguments: on TPU
      pod slices every worker discovers the coordinator, process count and
      process id from the TPU environment, so the pod launch is simply
      ``VIHDS_DISTRIBUTED=auto python -m vihds_tpu.run_xval spec.yaml
      --mesh auto ...`` run on every host (this is the capability leap over
      the reference's single-device config, vihds/config.py:161-178).
    * ``HOST:PORT,NPROC,PID`` — explicit triple for CPU/GPU clusters and the
      2-process CLI e2e test (tests/test_multihost_cli.py).
    * ``None``/empty — single-process (no-op).

    Must be called before any other JAX device use.  Returns
    ``(process_count, process_index)``.
    """
    import os

    spec = getattr(args, "distributed", None) or os.environ.get("VIHDS_DISTRIBUTED")
    if not spec:
        return 1, 0
    if spec == "auto":
        jax.distributed.initialize()
    else:
        try:
            addr, nproc, pid = spec.rsplit(",", 2)
        except ValueError:
            raise SystemExit(
                "--distributed expects 'auto' or 'HOST:PORT,NPROC,PID'; got %r" % spec
            )
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=int(nproc), process_id=int(pid)
        )
    n, i = jax.process_count(), jax.process_index()
    print("jax.distributed: process %d of %d (%d local / %d global devices)"
          % (i, n, jax.local_device_count(), jax.device_count()))
    return n, i


def is_main():
    """True on the process that owns artifact/TensorBoard writes."""
    return jax.process_index() == 0


def broadcast_string(s, max_len=4096):
    """Replicate a process-0 string to every process.

    Rides the same collective path the arrays use (fixed-size uint8 buffer
    through ``multihost_utils.broadcast_one_to_all``).  Used to share the
    process-0 results/checkpoint directory with the trainer-less non-main
    processes of a ``--distributed`` launch."""
    import numpy as np
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, dtype=np.uint8)
    if s:
        raw = s.encode("utf-8")
        if len(raw) > max_len:
            raise ValueError("broadcast_string: %d bytes > max_len %d" % (len(raw), max_len))
        buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out)).rstrip(b"\x00").decode("utf-8")


def is_multiprocess_mesh(mesh):
    """True when ``mesh`` spans devices owned by more than one process."""
    if mesh is None:
        return False
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


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
