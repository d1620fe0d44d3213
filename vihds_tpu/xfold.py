"""Vmapped k-fold cross-validation: every fold of an experiment trains and
evaluates inside ONE batched compiled program.

The reference loops folds serially in Python (reference
vihds/call_run_xval.py:12-31) — k full training runs back to back.  On TPU
the per-dispatch tunnel/host latency, not device compute, dominates this
workload (BASELINE.md), so running the folds as a leading ``jax.vmap`` axis
of the SAME jitted train/eval steps collapses k folds' worth of dispatches
and transfers into one stream: one train dispatch per eval boundary and one
eval round per boundary cover every fold.  Device arithmetic is identical to
the sequential path (same step functions, vmapped), so each fold's training
matches its sequential run up to float32 reassociation.

Enabled with ``--vmap_folds`` on ``call_run_xval``.  With ``--mesh auto``
the fold axis itself is sharded over the devices (when some device count
> 1 divides ``folds``) — folds never communicate, so the partitioned
program has zero collectives.  Falls back to the sequential driver (with a
printed reason) for configurations the batched program cannot express:
non-merged (``merge: false``) datasets, heldout splits, an explicit
``--mesh_data``/``--mesh_sample`` factorisation (the sequential driver
shards each fold over the requested (data, sample) mesh), ``--mesh auto``
when no device count divides the folds, or folds whose padded
batch or eval-chunk counts differ (a common chunk grid would change those
folds' eval RNG streams vs the sequential driver).  ``--profile_dir``
works here too (round 5): it captures one post-compile batched train
dispatch covering every fold.

Checkpoint/resume IS supported (round 4): the batched fold state is one
stacked pytree, saved at checkpoint boundaries through the same orbax
layer the sequential driver uses (``checkpoints_vmap/`` under the results
dir) together with the per-fold NaN-freeze mask; a resumed run replays
``epoch_perm(seed, e)`` batch orders exactly, like the sequential path.
Like the sequential path, resume restores the TRAINING state only — the
best-val cache/log state starts fresh (the first post-resume improvement
re-dumps it).
"""

import copy
import math
import os
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from vihds_tpu import plotting_hooks
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.training import (
    HostWorker,
    build_epoch_stacks,
    make_optimizer,
    make_results,
    make_step_fns,
    reshape_eval_theta,
    steps_cache_get,
    steps_cache_key,
    steps_cache_put,
    update_summaries,
)
from vihds_tpu.utils import TrainingLogData
from vihds_tpu.utils.attrdict import AttrDict
from vihds_tpu.vae import VAE


class FoldLazyEval:
    """Fold-stacked analogue of training.LazyEvalSplit: the vmapped eval's
    [F, n_chunks, chunk, ...] device outputs, fetched per KEY on demand —
    each fetch is ONE host transfer covering every fold, and only the keys
    a consumer actually reads move (round 5: TB boundaries pull the
    on-device-reduced tb stats, the predictive moments/theta move only for
    improving or plotting folds).  Per-fold merged dicts accumulate in
    ``self.merged`` (None for NaN-frozen folds)."""

    SCALAR_KEYS = ("per_item_elbo",)
    TB_KEYS = ("tb_packed", "tb_logw_row")
    SUMMARY_KEYS = ("bk_stats", "log_p_by_species", "q_mu", "q_prec")
    RESULT_KEYS = (
        "q_mu", "q_prec",
        "iw_predict_mu", "iw_predict_std", "iw_states", "iw_variance",
    )

    def __init__(self, stacked_dev, ns, n_chunks, chunk, alive=None, unpack=None):
        self._dev = dict(stacked_dev)
        self._theta_dev = self._dev.pop("theta_bkn", None)
        self._ns, self._n_chunks, self._chunk = ns, n_chunks, chunk
        self._unpack = unpack  # (n_signals, n_theta) for tb_packed slicing
        self.merged = [
            None if (alive is not None and not alive[f]) else AttrDict()
            for f in range(len(ns))
        ]

    def _fetch(self, k):
        v = self._dev.pop(k, None)
        if v is None:
            return
        v = np.asarray(v)  # one transfer, all folds
        nc, c = self._n_chunks, self._chunk
        for f, m in enumerate(self.merged):
            if m is None:
                continue
            part, n = v[f], self._ns[f]
            if k == "bk_stats":
                part = np.moveaxis(part, 1, 0).reshape(4, nc * c, *part.shape[3:])[:, :n]
                for name, arr in zip(("log_w", "log_p_obs", "log_q", "log_p"), part):
                    m[name] = arr
            elif k == "tb_logw_row":
                m[k] = part[0]
            elif k == "tb_packed":
                part = part.reshape(nc * c, *part.shape[2:])[:n]
                S, nt = self._unpack
                m["per_item_elbo"] = part[:, 0]
                m["tb_stats"] = part[:, 1:4 + S]
                m["q_mu"] = part[:, 4 + S:4 + S + nt]
                m["q_prec"] = part[:, 4 + S + nt:]
            else:
                m[k] = part.reshape(nc * c, *part.shape[2:])[:n]

    def want_scalars(self):
        if self._unpack is not None and "tb_packed" in self._dev:
            self._fetch("tb_packed")
        else:
            self._fetch("per_item_elbo")
        for m in self.merged:
            if m is not None and "elbo" not in m:
                m["elbo"] = float(np.mean(m["per_item_elbo"]))
        return self.merged

    def want_tb(self):
        for k in self.TB_KEYS:
            self._fetch(k)
        return self.merged

    def want_summaries(self):
        for k in self.SUMMARY_KEYS:
            self._fetch(k)
        return self.merged

    def want_results(self):
        for k in self.RESULT_KEYS:
            self._fetch(k)
        return self.merged

    def fetch_theta(self, f):
        """Per-fold theta transfer (device-side [F] slice, ships one fold)."""
        m = self.merged[f]
        if m is not None and "theta" not in m and self._theta_dev is not None:
            m["theta"] = reshape_eval_theta(
                np.asarray(self._theta_dev[f]), self._n_chunks, self._chunk, self._ns[f]
            )
        return m


class UnsupportedVmapXval(ValueError):
    """The batched driver cannot express this configuration exactly; the
    caller falls back to the sequential fold loop.  A dedicated type so
    run_all_folds does not swallow unrelated config errors raised while
    building datasets/model."""


def unsupported_reason(args, settings):
    """None if the vmapped driver can run this configuration, else why not."""
    if not settings.data.merge:
        return "merge: false datasets group by file, not by fold"
    if getattr(args, "heldout", None):
        return "--heldout is a single split, not a k-fold"
    if args.folds < 2:
        return "needs folds >= 2"
    return None


def make_fold_mesh(folds, devices=None):
    """A 1-D ('fold',) mesh over the largest device count that divides
    ``folds`` — the fold axis is embarrassingly parallel (folds never
    communicate), so sharding it partitions the whole cross-validation with
    ZERO collectives.  None when only one device would be used."""
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    n_dev = 1
    for d in range(min(folds, len(devices)), 1, -1):
        if folds % d == 0:
            n_dev = d
            break
    if n_dev < 2:
        return None
    return Mesh(np.array(devices[:n_dev]), ("fold",))


class VmapXval:
    """All k folds of a cross-validation as one vmapped training run.

    With ``fold_mesh`` the leading fold axis is additionally SHARDED over
    the mesh devices (in_shardings P('fold') on every fold-stacked input):
    folds are independent, so GSPMD partitions the entire program with no
    collectives — k-fold cross-validation scales embarrassingly across
    chips.
    """

    def __init__(self, args, settings, fold_mesh=None):
        self.args = args
        self.settings = settings
        self.folds = args.folds
        self.fold_mesh = fold_mesh

        self.pairs = []
        for split in range(1, self.folds + 1):
            a = copy.copy(args)
            a.heldout = None
            a.split = split
            self.pairs.append(build_datasets(a, settings))

        self.program = ParamProgram(parse_parameters(settings.params))
        self.model = VAE(settings, self.pairs[0], self.program)

        p = settings.params
        self.n_batch = min(p.n_batch, min(pair.n_train for pair in self.pairs))
        batch_counts = {math.ceil(pair.n_train / self.n_batch) for pair in self.pairs}
        if len(batch_counts) != 1:
            # padding a shorter fold up to a larger batch count would create a
            # fully-masked batch (0/0 ELBO); the sequential driver handles it
            raise UnsupportedVmapXval(
                "folds have unequal padded batch counts %s" % sorted(batch_counts)
            )
        self.n_batches = batch_counts.pop()
        # The eval chunk grid must also be common across folds: eval_split
        # does jax.random.split(key, n_chunks), so padding a fold up to a
        # LARGER chunk count than the sequential driver would use changes
        # that fold's eval u-draws (split(key, 1) != split(key, 2)[0]) —
        # breaking the exact-equivalence contract, not just reassociation.
        for name, hosts_n in (
            ("valid", [pair.n_test for pair in self.pairs]),
            ("train", [pair.n_train for pair in self.pairs]),
        ):
            chunk_counts = {math.ceil(n / self.n_batch) for n in hosts_n}
            if len(chunk_counts) != 1:
                raise UnsupportedVmapXval(
                    "folds have unequal %s eval chunk counts %s"
                    % (name, sorted(chunk_counts))
                )
        self.steps_per_epoch = self.n_batches
        self.tx = make_optimizer(p, self.steps_per_epoch)

        self.train_hosts = [pair.train.batch() for pair in self.pairs]
        self.valid_hosts = [pair.test.batch() for pair in self.pairs]

        self._priors = AttrDict(
            (k, jnp.asarray(v)) for k, v in self.program.runtime_priors().items()
        )

        self.fold_names = ["%d_of_%d" % (f + 1, self.folds) for f in range(self.folds)]
        if settings.trainer is not None:
            root = settings.trainer.tb_log_dir
            self.train_paths = [os.path.join(root, "train_%s" % n) for n in self.fold_names]
            self.valid_paths = [os.path.join(root, "valid_%s" % n) for n in self.fold_names]
            self.cache_dirs = [os.path.join(root, ".vihds_cache_%s" % n) for n in self.fold_names]
            for d in self.train_paths + self.valid_paths:
                os.makedirs(d, exist_ok=True)
        else:
            self.train_paths = self.valid_paths = [None] * self.folds
            self.cache_dirs = [".vihds_cache_%s" % n for n in self.fold_names]

        self._build_steps()

    # ------------------------------------------------------------------ steps
    def _fold_shardings(self):
        """(fold-axis sharding, replicated sharding) or (None, None)."""
        if self.fold_mesh is None:
            return None, None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return (
            NamedSharding(self.fold_mesh, P("fold")),
            NamedSharding(self.fold_mesh, P()),
        )

    def _build_steps(self):
        base = steps_cache_key(
            self.settings, self.program, self.model, self.args,
            self.n_batch, self.steps_per_epoch, False, self.train_hosts[0], self.fold_mesh,
        )
        n_max = max(h.observations.shape[0] for h in self.train_hosts)
        key = ("vmap_folds", self.folds, n_max) + base
        cached = steps_cache_get(key)
        if cached is not None:
            self._train_v, self._eval_jits = cached
            return
        train_epoch, eval_split = make_step_fns(self.model, self.program, self.tx, self.args)
        self._eval_split_raw = eval_split

        def batched_train(params_v, opt_v, keys_v, stacks_v, data_v, times, priors):
            # times and priors are shared across folds (same merged grid,
            # same spec); everything else — including each fold's
            # device-resident train split (padded to a common N, see
            # _train_data_folds) — carries the leading fold axis
            return jax.vmap(
                lambda pp, oo, kk, ss, dd: train_epoch(pp, oo, kk, ss, dd, times, priors)
            )(params_v, opt_v, keys_v, stacks_v, data_v)

        fold_sh, repl = self._fold_shardings()
        if fold_sh is not None:
            # shard every fold-stacked input over the mesh — the folds never
            # communicate, so the partitioned program has zero collectives
            self._train_v = jax.jit(
                batched_train,
                in_shardings=(fold_sh, fold_sh, fold_sh, fold_sh, fold_sh, repl, repl),
                donate_argnums=(0, 1),
            )
        else:
            self._train_v = jax.jit(batched_train, donate_argnums=(0, 1))
        # jitted vmapped eval per (n_samples, with_theta) — static_argnames
        # does not survive the vmap wrapper, so close over them instead
        self._eval_jits = {}
        steps_cache_put(key, (self._train_v, self._eval_jits))

    def _train_data_folds(self):
        """[F, N_max, ...] device-resident train splits for the on-device
        batch gather (train_epoch's ``data`` arg), uploaded ONCE per run.
        Folds whose split is smaller than N_max pad by repeating row 0 —
        pad rows are never indexed (epoch_perm draws over each fold's own
        n_train; index-grid pad slots point at row 0 with mask 0)."""
        cached = getattr(self, "_train_data_v", None)
        if cached is not None:
            return cached
        from vihds_tpu.training import split_device_data

        hosts = [split_device_data(h) for h in self.train_hosts]
        n_max = max(h.observations.shape[0] for h in hosts)

        def pad(x):
            n = x.shape[0]
            if n == n_max:
                return x
            return np.concatenate([x, np.broadcast_to(x[:1], (n_max - n,) + x.shape[1:])])

        self._train_data_v = AttrDict(
            (k, jnp.asarray(np.stack([pad(np.asarray(h[k])) for h in hosts])))
            for k in hosts[0]
        )
        return self._train_data_v

    def _eval_v(self, params_v, stacks_v, times, keys_v, n_samples, with_theta):
        k = (int(n_samples), bool(with_theta))
        fn = self._eval_jits.get(k)
        if fn is None:
            eval_split = getattr(self, "_eval_split_raw", None)
            if eval_split is None:  # steps came from the cross-instance cache
                eval_split = make_step_fns(self.model, self.program, self.tx, self.args)[1]
                self._eval_split_raw = eval_split

            def batched_eval(params_v, stacks_v, times, keys_v, priors):
                return jax.vmap(
                    lambda pp, ss, kk: eval_split(pp, ss, times, kk, priors, n_samples, with_theta)
                )(params_v, stacks_v, keys_v)

            fold_sh, repl = self._fold_shardings()
            if fold_sh is not None:
                fn = jax.jit(
                    batched_eval, in_shardings=(fold_sh, fold_sh, repl, fold_sh, repl)
                )
            else:
                fn = jax.jit(batched_eval)
            self._eval_jits[k] = fn
        return fn(params_v, stacks_v, times, keys_v, self._priors)

    # ------------------------------------------------------------------- eval
    def _eval_stacks(self, hosts):
        """Per-fold chunked index stacks, padded to a COMMON chunk grid:
        [F, n_chunks, chunk, ...] arrays (pad rows repeat index 0 and are
        trimmed per fold after the transfer, like Training._eval_full)."""
        chunk = self.n_batch
        ns = [h.observations.shape[0] for h in hosts]
        n_chunks = math.ceil(max(ns) / chunk)
        per_fold = []
        for h, n in zip(hosts, ns):
            idx = np.concatenate([np.arange(n), np.zeros(n_chunks * chunk - n, int)])
            idx = idx.reshape(n_chunks, chunk)
            per_fold.append(
                dict(
                    observations=h.observations[idx],
                    inputs=h.inputs[idx],
                    dev_1hot=h.dev_1hot[idx],
                )
            )
        stacks = AttrDict(
            (k, jnp.asarray(np.stack([p[k] for p in per_fold])))
            for k in per_fold[0]
        )
        return stacks, ns, n_chunks, chunk

    def _eval_folds(self, params_v, hosts, n_samples, keys_v, with_theta,
                    defer_theta=False, alive=None):
        """One vmapped eval dispatch for a split of every fold; returns one
        merged dict per fold (theta deferred per fold when requested; None
        for NaN-frozen folds, whose host-side merge is skipped)."""
        stacks, ns, n_chunks, chunk = self._eval_stacks(hosts)
        times = jnp.asarray(hosts[0].times)
        stacked = self._eval_v(
            params_v, stacks, times, keys_v, n_samples, with_theta or defer_theta
        )
        unpack = (len(self.settings.data.signals), self.program.n_theta)
        return FoldLazyEval(dict(stacked), ns, n_chunks, chunk, alive, unpack=unpack)

    def _fold_proxy(self, f):
        """Duck-typed stand-in for a Training instance, for plotting hooks."""
        return SimpleNamespace(
            settings=self.settings,
            program=self.program,
            model=self.model,
            train_data=self.train_hosts[f],
            valid_data=self.valid_hosts[f],
        )

    # -------------------------------------------------------------------- run
    def run(self):
        """Train every fold; returns a list of per-fold Results (None for
        folds that hit the NaN abort before caching a best-val)."""
        args = self.args
        F = self.folds
        seed = self.settings.seed or 0

        if self.settings.trainer is not None:
            from torch.utils.tensorboard import SummaryWriter

            train_writers = [SummaryWriter(p) for p in self.train_paths]
            valid_writers = [SummaryWriter(p) for p in self.valid_paths]
        else:
            train_writers = [None] * F
            valid_writers = [None] * F
        # figure rendering rides one background thread (training.HostWorker);
        # VIHDS_SYNC_EVAL keeps it inline for deterministic schedules
        self._host_worker = (
            HostWorker()
            if (self.settings.trainer is not None and not os.environ.get("VIHDS_SYNC_EVAL"))
            else None
        )

        # Mirror the sequential driver exactly: every fold starts from the
        # SAME seed-derived key, so init params and every u draw match what
        # run_on_split would have produced for that fold.
        key = jax.random.PRNGKey(seed)
        key, k_init = jax.random.split(key)
        params1 = self.model.init_params(k_init)
        stack_f = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * F), t
        )
        params_v = stack_f(params1)
        opt_v = stack_f(self.tx.init(params1))
        keys_v = jnp.stack([key] * F)

        n_trains = [pair.n_train for pair in self.pairs]
        times = jnp.asarray(self.train_hosts[0].times)
        log_datas = [TrainingLogData() for _ in range(F)]
        valid_outputs = [None] * F
        empty_cache = [True] * F
        alive = [True] * F

        # Checkpoint/resume of the batched fold state: ONE stacked pytree
        # (params_v, opt_v, keys_v) + the per-fold NaN-freeze mask, through
        # the same orbax layer as the sequential driver.  epoch_perm derives
        # batch orders from (seed, epoch) alone, so a resumed run replays
        # exactly the orders the uninterrupted run would have seen.
        from vihds_tpu import checkpoint as ckpt

        ckpt_every = getattr(args, "checkpoint_epoch", 0) or 0
        ckpt_dir = None
        if ckpt_every or getattr(args, "resume_from", None):
            if self.settings.trainer is not None:
                ckpt_dir = os.path.join(
                    self.settings.trainer.tb_log_dir, "checkpoints_vmap"
                )
        start_epoch = 1
        resume_from = getattr(args, "resume_from", None)
        if resume_from:
            template = {
                "params": params_v,
                "opt_state": opt_v,
                "key": np.asarray(keys_v),
                "extra": {"epoch": 0, "alive": np.ones(F, bool)},
            }
            step, state = ckpt.restore(resume_from, template=template)
            if state is not None:
                params_v = state["params"]
                opt_v = state["opt_state"]
                keys_v = jnp.asarray(np.asarray(state["key"]), jnp.uint32)
                alive = [bool(b) for b in np.asarray(state["extra"]["alive"])]
                start_epoch = int(state["extra"]["epoch"]) + 1
                print("Resumed vmapped folds from %s at epoch %d" % (resume_from, start_epoch - 1))

        def next_boundary(e):
            te = args.test_epoch
            cands = [args.epochs, ((e - 1) // te + 1) * te]
            if ckpt_every:
                cands.append(((e - 1) // ckpt_every + 1) * ckpt_every)
            return min(cands)

        print("---------------------------")
        print("Training: %d folds vmapped (one batched program)" % F)
        # --profile_dir captures ONE post-compile batched train dispatch
        # (all folds in the trace — the single-split driver's "one
        # post-compile epoch" convention lifted to the fold-stacked program)
        profile_dir = getattr(args, "profile_dir", None)
        traced = False
        epoch = start_epoch
        while any(alive) and epoch < args.epochs + 1:
            start = time.time()
            end_epoch = next_boundary(epoch)
            n_ep = end_epoch - epoch + 1
            fold_stacks = []
            dead_stack = None
            for f in range(F):
                if not alive[f]:
                    # NaN-frozen fold: the device program still needs its
                    # [F, ...] slice, but its contents are irrelevant (params
                    # are already NaN and its elbos are ignored) — skip the
                    # per-epoch RandomState permutations and gather row 0.
                    if dead_stack is None:
                        n_steps = n_ep * self.n_batches
                        dead_stack = dict(
                            idx=np.zeros((n_steps, self.n_batch), np.int32),
                            mask=np.ones((n_steps, self.n_batch), np.float32),
                        )
                    fold_stacks.append(dead_stack)
                    continue
                fold_stacks.append(
                    build_epoch_stacks(
                        seed, epoch, end_epoch,
                        self.n_batch, self.n_batches, n_trains[f],
                    )
                )
            stacks_v = AttrDict(
                (k, jnp.asarray(np.stack([s[k] for s in fold_stacks])))
                for k in fold_stacks[0]
            )
            trained = list(alive)  # folds that actually trained this dispatch
            from vihds_tpu import profiling

            do_trace = bool(profile_dir) and not traced and epoch > start_epoch
            with profiling.trace(profile_dir if do_trace else None):
                params_v, opt_v, keys_v, elbos_v = self._train_v(
                    params_v, opt_v, keys_v, stacks_v, self._train_data_folds(),
                    times, self._priors
                )
                elbos_v = np.asarray(elbos_v)  # fetch inside: trace sees device time
            traced = traced or do_trace
            for f in range(F):
                if alive[f] and not np.isfinite(elbos_v[f]).all():
                    print("Fold %d: ELBO = nan, freezing this fold." % (f + 1))
                    alive[f] = False
            epoch = end_epoch
            # one batched dispatch trains every live fold at once; charge
            # each of them the amortised share (frozen folds accrue nothing,
            # matching the sequential driver's per-fold abort) so the
            # counters stay comparable to the sequential driver's times
            per_fold_elapsed = (time.time() - start) / max(1, sum(trained))
            for f in range(F):
                if trained[f]:
                    log_datas[f].total_train_time += per_fold_elapsed
            if np.mod(epoch, args.test_epoch) == 0 and any(alive):
                # mirror Training.run exactly: the eval keys derive from each
                # fold's POST-training carried key (key, sub = split(key);
                # k1, k2 = split(sub)) so per-fold eval draws match the
                # sequential driver's
                kk = jax.vmap(jax.random.split)(keys_v)
                keys_v, sub_v = kk[:, 0], kk[:, 1]
                kk2 = jax.vmap(jax.random.split)(sub_v)
                k1_v, k2_v = kk2[:, 0], kk2[:, 1]
                self._eval_boundary(
                    params_v, epoch, k1_v, k2_v, log_datas, train_writers, valid_writers,
                    valid_outputs, empty_cache, alive,
                )
            if ckpt_every and ckpt_dir and np.mod(epoch, ckpt_every) == 0:
                # elbos_v was fetched synchronously above, so `alive` already
                # reflects this chunk's NaN freezes: frozen folds' (NaN)
                # params ride along but the saved mask keeps them frozen on
                # resume — no NaN state is ever trained or reported from.
                ckpt.save(
                    ckpt_dir, epoch, params_v, opt_v, np.asarray(keys_v),
                    extra={"epoch": epoch, "alive": np.array(alive)},
                )
            epoch += 1

        if self._host_worker is not None:
            self._host_worker.join()
            self._host_worker = None
        for w in train_writers + valid_writers:
            if w is not None:
                w.close()

        results = []
        for f in range(F):
            if empty_cache[f]:
                print("Fold %d: no results in cache" % (f + 1))
                results.append(None)
                continue
            out = valid_outputs[f]
            out.load(self.cache_dirs[f])
            out.elbo_list = log_datas[f].validation_elbo_list
            results.append(out)
        return results

    def _eval_boundary(
        self, params_v, epoch, k1_v, k2_v, log_datas, train_writers, valid_writers,
        valid_outputs, empty_cache, alive,
    ):
        args = self.args
        F = self.folds
        test_start = time.time()
        plot = (args.plot_epoch > 0) and (np.mod(epoch, args.plot_epoch) == 0)
        want_theta_plot = bool(getattr(self.settings.params, "theta_columns", None)) and plot

        train_ev = self._eval_folds(
            params_v, self.train_hosts, args.train_samples, k1_v,
            with_theta=want_theta_plot, alive=alive,
        )
        valid_ev = self._eval_folds(
            params_v, self.valid_hosts, args.test_samples, k2_v,
            with_theta=False, defer_theta=True, alive=alive,
        )
        train_ev.want_scalars()
        valid_ev.want_scalars()
        have_writers = any(w is not None for w in train_writers + valid_writers)
        if have_writers:
            train_ev.want_tb()
            valid_ev.want_tb()
        # predictive moments move only when some live fold improved or a
        # figure is due (the transfer covers all folds at once either way)
        any_improved = any(
            alive[f] and valid_ev.merged[f].elbo > log_datas[f].max_val_elbo
            for f in range(F)
        )
        if any_improved or (have_writers and plot):
            valid_ev.want_results()
            if have_writers and plot:
                train_ev.want_results()
                if want_theta_plot:
                    # the weighted-theta figure reads the full log_w + theta
                    train_ev.want_summaries()
                    for f in range(F):
                        if alive[f]:
                            train_ev.fetch_theta(f)
        # the batched dispatch+transfer served every fold at once; charge
        # each live fold the amortised share, then its own merge/plot time
        n_live = max(1, sum(alive))
        dispatch_share = (time.time() - test_start) / n_live
        worker = getattr(self, "_host_worker", None)
        for f in range(F):
            if not alive[f]:
                continue
            fold_start = time.time()
            log_data = log_datas[f]
            log_data.n_test += 1
            train_merged, valid_merged = train_ev.merged[f], valid_ev.merged[f]
            update_summaries(train_writers[f], epoch, train_merged, self.program, self.settings)
            improved = valid_merged.elbo > log_data.max_val_elbo
            if improved:
                valid_ev.fetch_theta(f)
            update_summaries(valid_writers[f], epoch, valid_merged, self.program, self.settings)
            valid_output = None
            if improved or (valid_writers[f] is not None and plot):
                valid_output = make_results(self.model, self.program, valid_merged)
            if valid_writers[f] is not None and plot:
                proxy = self._fold_proxy(f)
                train_output = make_results(self.model, self.program, train_merged)
                dyn = self.model.ode_model.precisions.dynamic

                def figures(f=f, proxy=proxy, train_output=train_output,
                            valid_output=valid_output, train_merged=train_merged):
                    plotting_hooks.eval_plots(
                        proxy, train_writers[f], epoch, self.train_hosts[f], train_output,
                        dynamic=dyn,
                    )
                    plotting_hooks.eval_plots(
                        proxy, valid_writers[f], epoch, self.valid_hosts[f], valid_output,
                        dynamic=dyn,
                    )
                    if want_theta_plot:
                        plotting_hooks.weighted_theta_plot(
                            proxy, valid_writers[f], epoch, train_merged
                        )

                # figure rendering rides the background worker (round 5) —
                # values are main-thread; only rasterization is deferred
                worker.submit(figures) if worker is not None else figures()
            if improved:
                log_data.max_val_elbo = valid_merged.elbo
                valid_output.dump(self.cache_dirs[f])
                empty_cache[f] = False
            if valid_output is not None:
                valid_outputs[f] = valid_output
            log_data.training_elbo_list.append(train_merged.elbo)
            log_data.validation_elbo_list.append(valid_merged.elbo)
            log_data.total_test_time += dispatch_share + (time.time() - fold_start)
            print(
                "epoch %4d | fold %d | train (iwae-elbo = %0.4f) | val (iwae-elbo = %0.4f)"
                % (epoch, f + 1, train_merged.elbo, valid_merged.elbo)
            )


def detect_outlier_folds(elbos, nats):
    """Indices of folds whose best-val ELBO lands more than ``nats`` below
    the median of their SIBLING folds (or that produced no result at all).

    Long-horizon vmapped training reproduces the sequential driver's
    convergence BAND, with occasional (~1/8 measured) slow-basin folds —
    float32-reassociation flips which optimum a fold lands in (BASELINE.md
    'Long-horizon equivalence').  The measured outliers sat 60-140 nats
    below siblings spread within ~±30, so the default threshold is 50."""
    vals = np.array(
        [v if v is not None and np.isfinite(v) else np.nan for v in elbos], float
    )
    out = []
    for f in range(len(vals)):
        sibs = vals[np.arange(len(vals)) != f]
        sibs = sibs[np.isfinite(sibs)]
        if len(sibs) == 0:
            continue
        if not np.isfinite(vals[f]) or vals[f] < np.median(sibs) - nats:
            out.append(f)
    return out


def _handle_outlier_folds(args, settings, runner, results):
    """Detect slow-basin folds after a vmapped run; with --rerun_outliers,
    rerun exactly those folds through the SEQUENTIAL driver under a fresh
    training RNG (same numpy-seeded data split — the fold's heldout set is
    unchanged) and keep whichever result scores the higher best-val.

    Without the flag the diagnosis still prints loudly, so a silently-worse
    fold can no longer pass unnoticed (VERDICT r3 #5)."""
    nats = float(getattr(args, "outlier_nats", 0) or 50.0)
    elbos = [None if r is None else float(r.elbo) for r in results]
    outliers = detect_outlier_folds(elbos, nats)
    if not outliers:
        finite = [e for e in elbos if e is not None and np.isfinite(e)]
        spread = (
            " (best-val spread %.1f .. %.1f)" % (min(finite), max(finite))
            if finite else ""
        )
        print(
            "Outlier-fold check: all %d folds within %.0f nats of the "
            "sibling median%s" % (len(results), nats, spread)
        )
        return results
    med = np.median([e for e in elbos if e is not None and np.isfinite(e)])
    print("================================================================")
    print("WARNING: %d of %d folds landed > %.0f nats below the sibling "
          "median (%.1f) — likely slow-basin optima (see BASELINE.md "
          "'Long-horizon equivalence'):" % (len(outliers), len(results), nats, med))
    for f in outliers:
        print("  fold %d: best-val %s" % (
            f + 1, "none (no cached result)" if elbos[f] is None else "%.1f" % elbos[f]))
    if not getattr(args, "rerun_outliers", False):
        print("Pass --rerun_outliers to retrain just these folds sequentially "
              "under a fresh training RNG and keep the better result.")
        return results
    from vihds_tpu.run_xval import run_on_split

    for f in outliers:
        rerun_seed = (settings.seed or 0) + 10007 + f
        print("---------------------------")
        print("Rerunning fold %d sequentially with training seed %d "
              "(data split unchanged)" % (f + 1, rerun_seed))
        a = copy.copy(args)
        a.heldout = None
        s = copy.copy(settings)
        s.seed = rerun_seed  # training RNG only; the fold split rides args.seed
        _, rerun = run_on_split(a, s, split=f + 1)
        new = None if rerun is None else float(rerun.elbo)
        old = elbos[f]
        if new is not None and (old is None or new > old):
            print("Fold %d recovered: best-val %.1f (was %s)" % (
                f + 1, new, "none" if old is None else "%.1f" % old))
            results[f] = rerun
        else:
            print("Fold %d rerun did not improve (%s vs %s); keeping the "
                  "original" % (f + 1, new, old))
        # the rerun shares the fold's cache dir; re-dump the WINNER so the
        # on-disk best-val cache matches what the merge consumes
        if results[f] is not None:
            results[f].dump(runner.cache_dirs[f])
    return results


def run_all_folds(args, settings):
    """Entry point for call_run_xval: returns [(split_idx, data_pair,
    val_results-or-None)] or None when this configuration needs the
    sequential driver."""
    reason = unsupported_reason(args, settings)
    if reason is not None:
        print("vmap_folds: falling back to sequential folds (%s)" % reason)
        return None
    fold_mesh = None
    if getattr(args, "mesh_data", None) or getattr(args, "mesh_sample", None):
        # An explicit (data, sample) factorisation is a request the fold-axis
        # sharding cannot honour — the sequential driver shards each fold
        # over exactly that mesh, so use it rather than silently running the
        # whole cross-validation on one device.
        print(
            "vmap_folds: falling back to sequential folds "
            "(explicit --mesh_data/--mesh_sample: each fold shards over the "
            "requested (data, sample) mesh)"
        )
        return None
    if getattr(args, "mesh", "off") != "off":
        # --vmap_folds + --mesh auto: shard the fold axis itself over the
        # devices (folds are independent; the partitioned program has no
        # collectives)
        fold_mesh = make_fold_mesh(args.folds)
        if fold_mesh is None:
            if len(jax.devices()) > 1:
                # no device count > 1 divides folds: the sequential driver
                # can still use every device via its (data, sample) mesh —
                # running the batched program here would degrade
                # multi-device to 1 chip
                print(
                    "vmap_folds: falling back to sequential folds "
                    "(no device count > 1 divides folds=%d; sequential folds "
                    "shard over the (data, sample) mesh)" % args.folds
                )
                return None
            # single device (the one-chip TPU host): no (data, sample) mesh
            # exists either, so the batched program's dispatch-batching win
            # still applies — run it unsharded
            print("vmap_folds: single device; running the batched program unsharded")
        else:
            print("Fold mesh: %d folds sharded over %d devices"
                  % (args.folds, fold_mesh.shape["fold"]))
    try:
        runner = VmapXval(args, settings, fold_mesh=fold_mesh)
    except UnsupportedVmapXval as e:
        print("vmap_folds: falling back to sequential folds (%s)" % e)
        return None
    results = runner.run()
    results = _handle_outlier_folds(args, settings, runner, results)
    return [
        (f + 1, runner.pairs[f], results[f])
        for f in range(args.folds)
    ]
