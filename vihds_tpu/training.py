"""Training engine: jitted IWAE-ELBO steps, Adam + multi-step LR, periodic
large-K evaluation, best-validation caching, TensorBoard summaries.

Capability parity with reference vihds/training.py, re-architected TPU-first:

  * ONE jit-compiled train step: forward + IWAE cost + grad + Adam update —
    no per-op Python dispatch (the reference's hot loop is 85 Python-stepped
    solver iterations per batch, vihds/solvers.py:9-17).
  * Static shapes everywhere: the trailing partial batch is padded and masked
    (the mask enters the batch-mean of the IWAE bound), so every epoch reuses
    one compiled program.
  * Evaluation computes importance-weighted posterior-predictive moments on
    device and ships only [B, S, T]-sized summaries to host (the reference
    pulls the full [B, K, S, T] tensors to numpy, vihds/utils.py:86-99).
  * NaN-abort checks once per epoch on the device-side ELBO values (the
    reference syncs per batch, vihds/training.py:331-333; same abort
    capability, without stalling the device pipeline).
"""

import contextlib
import math
import os
import time
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vihds_tpu import plotting_hooks
from vihds_tpu.ops.logprob import log_prob_observations
from vihds_tpu.results import Results
from vihds_tpu.utils import TrainingLogData
from vihds_tpu.utils.attrdict import AttrDict


def prior_as_q(program, priors=None):
    """The prior p as q-style arrays: from the runtime ``priors`` argument
    when given (so prior values are NOT baked into the trace and programs
    differing only in priors share one executable), else the program's
    baked constants."""
    if priors is not None:
        return AttrDict(mu=priors["mu"][None, :], prec=priors["prec"][None, :])
    return program.prior_q()


def iwae_elbo_terms(program, out, batch, use_laplace, priors=None):
    """log-weights and components: returns AttrDict with log_w[B,K],
    log_p_by_species[B,K,S], log_p_obs[B,K], log_q[B,K], log_p[B,K]
    (parity: cost() at vihds/training.py:127-174)."""
    log_p_by_species = log_prob_observations(
        out.x_predict, batch.observations, out.precisions, use_laplace
    )
    log_p_obs = log_p_by_species.sum(axis=2)
    log_q = program.log_prob(out.q, out.theta)
    log_p = program.log_prob(prior_as_q(program, priors), out.theta)
    log_w = log_p_obs + log_p - log_q
    return AttrDict(
        log_w=log_w,
        log_p_by_species=log_p_by_species,
        log_p_obs=log_p_obs,
        log_q=log_q,
        log_p=log_p,
    )


def masked_mean(x, mask):
    if mask is None:
        return x.mean()
    return (x * mask).sum() / mask.sum()


def dreg_value_and_grad(model, program, n_samples, use_laplace):
    """Doubly-reparameterised gradient estimator (DReG, Tucker et al. 2019)
    for the IWAE bound.

    The reference declares a --dreg flag but never reads it; its stop-grad
    plumbing is commented out (reference vihds/run_xval.py:36,
    vihds/encoders.py:157-159).  Implemented here for real, with ONE forward
    pass and two VJP pulls:

      * decoder params get the standard IWAE gradient
        (cotangent w-tilde on log w with differentiable log q);
      * encoder params get the DReG gradient: cotangent w-tilde^2 on log w
        evaluated with log q's parameters stop-gradded, so only the
        reparameterised sample path contributes (no score-function term).
    """

    fold_ok = model.ode_model.supports_fold()

    def value_and_grad(params, batch, mask, key, priors=None):
        B = batch.observations.shape[0]

        def fwd(params):
            u = model.sample_u(key, B, n_samples)
            # remat the solver steps: the backward otherwise streams ~24MB of
            # per-step residuals through HBM with layout-converting copies —
            # recomputing the RHS is 2.5x faster on v5e (see BASELINE.md)
            if fold_ok:
                # online log-lik inside the solver scan — no [B,K,S,T]
                # trajectory buffer (OdeModel.simulate_logprob)
                out = model.forward_logprob(params, batch, u, checkpoint=True, priors=priors)
                log_p_by_species = out.log_p_by_species
            else:
                out = model.forward(params, batch, u, checkpoint=True, priors=priors)
                log_p_by_species = log_prob_observations(
                    out.x_predict, batch.observations, out.precisions, use_laplace
                )
            log_lik = log_p_by_species.sum(axis=2)
            log_p = program.log_prob(prior_as_q(program, priors), out.theta)
            log_q = program.log_prob(out.q, out.theta)
            q_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, out.q)
            log_q_sg = program.log_prob(q_sg, out.theta)
            log_w_std = log_lik + log_p - log_q
            log_w_dreg = log_lik + log_p - log_q_sg
            return (log_w_std, log_w_dreg)

        (log_w_std, log_w_dreg), vjp_fn = jax.vjp(fwd, params)
        n_iwae = log_w_std.shape[1]
        lse = jax.scipy.special.logsumexp(log_w_std, axis=1, keepdims=True)
        elbo = masked_mean(lse[:, 0] - math.log(n_iwae), mask)
        w_tilde = jax.lax.stop_gradient(jnp.exp(log_w_std - lse))  # [B, K]
        if mask is None:
            coeff = jnp.ones((B, 1)) / B
        else:
            coeff = (mask / mask.sum())[:, None]
        zeros = jnp.zeros_like(log_w_std)
        (g_std,) = vjp_fn((w_tilde * coeff, zeros))
        (g_dreg,) = vjp_fn((zeros, (w_tilde ** 2) * coeff))
        # d(-elbo)/dparams: decoder from the standard pull, encoder from DReG
        grads = {"enc": jax.tree_util.tree_map(jnp.negative, g_dreg["enc"]),
                 "dec": jax.tree_util.tree_map(jnp.negative, g_std["dec"])}
        return -elbo, grads

    return value_and_grad


def iwae_elbo(terms, mask=None):
    """-IWAE cost = mean_B(logsumexp_K(log w) - log K)."""
    n_iwae = terms.log_w.shape[1]
    lse = jax.scipy.special.logsumexp(terms.log_w, axis=1)
    return masked_mean(lse - math.log(n_iwae), mask)


def _importance_weighted_outputs(terms, out):
    """On-device IW moments (parity: Results.init, vihds/utils.py:79-99)."""
    lse = jax.scipy.special.logsumexp(terms.log_w, axis=1, keepdims=True)
    w = jnp.exp(terms.log_w - lse)[:, :, None, None]  # [B,K,1,1]
    x_predict = out.x_predict
    precisions = out.precisions
    iw_predict_mu = jnp.sum(w * x_predict, 1)
    iw_predict_std = jnp.sqrt(
        jnp.maximum(jnp.sum(w * (x_predict ** 2 + 1.0 / precisions), 1) - iw_predict_mu ** 2, 0.0)
    )
    iw_states = jnp.sum(w * out.x_states, 1)
    iw_variance = jnp.sum(w / precisions * jnp.ones_like(x_predict), 1)
    return dict(
        iw_predict_mu=iw_predict_mu,
        iw_predict_std=iw_predict_std,
        iw_states=iw_states,
        iw_variance=iw_variance,
    )


def batch_arrays(subset_batch):
    """Host batch dict -> jnp arrays AttrDict."""
    return AttrDict(
        observations=jnp.asarray(subset_batch.observations),
        inputs=jnp.asarray(subset_batch.inputs),
        dev_1hot=jnp.asarray(subset_batch.dev_1hot),
        times=jnp.asarray(subset_batch.times),
    )


# Compiled-step cache: cross-validation folds (and inference-graph node
# folds) build functionally identical programs — same spec, same shapes,
# same priors — so the jitted train/eval steps compile ONCE per
# configuration and are reused across Training instances.  The key captures
# everything the traced computation bakes in as constants (see
# _steps_cache_key).  Saves one full XLA compile (minutes on TPU) per fold
# after the first.  Bounded LRU: each pinned entry holds XLA executables
# whose JIT code maps thousands of /proc/self/maps regions; an unbounded
# dict in a long inference-graph run (every propagated-prior node is a new
# key) would walk the process into vm.max_map_count ENOMEM aborts.
_STEP_CACHE = OrderedDict()
_STEP_CACHE_MAX = 8


def steps_cache_get(key):
    """Bounded-LRU lookup; refreshes recency on hit."""
    cached = _STEP_CACHE.get(key)
    if cached is not None:
        _STEP_CACHE.move_to_end(key)
    return cached


def steps_cache_put(key, value):
    _STEP_CACHE[key] = value
    while len(_STEP_CACHE) > _STEP_CACHE_MAX:
        _STEP_CACHE.popitem(last=False)


class PhaseTimers:
    """Opt-in wall-clock accounting of the training loop's phases
    (VIHDS_PHASE_TIMERS=1): cumulative seconds per named phase plus the
    count, printed as one summary block at run end.  Used to produce the
    BASELINE.md device-time accounting of the production wall."""

    def __init__(self):
        self.enabled = bool(os.environ.get("VIHDS_PHASE_TIMERS"))
        self.acc = {}

    @contextlib.contextmanager
    def phase(self, name):
        if not self.enabled:
            yield
            return
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            s, n = self.acc.get(name, (0.0, 0))
            self.acc[name] = (s + dt, n + 1)

    def report(self):
        if not self.enabled or not self.acc:
            return
        print("--- phase accounting (wall seconds) ---")
        for name, (s, n) in sorted(self.acc.items(), key=lambda kv: -kv[1][0]):
            print("%-28s %9.2f s  (n=%d, %.3f s each)" % (name, s, n, s / n))


class HostWorker:
    """One background thread serializing deferred host-side eval-completion
    work — figure rendering and TB figure writes (round 5: the fine-phase
    accounting measured figures at 108 s of the icml 171 s wall, ALL of it
    starving the device queue).  Matplotlib and torch's SummaryWriter are
    safe under a single dedicated worker (the writer's event file has its
    own internal queue+thread).  Values are unaffected: only rendering is
    deferred; every number the loop consumes is computed on the main
    thread.  VIHDS_SYNC_EVAL runs everything inline instead (the
    bit-identical reference schedule for the equivalence tests)."""

    def __init__(self):
        import queue
        import threading

        self._q = queue.Queue()
        self._t = threading.Thread(target=self._loop, daemon=True)
        self._t.start()

    def _loop(self):
        import traceback

        while True:
            fn = self._q.get()
            if fn is None:
                return
            try:
                fn()
            except Exception:  # a failed figure must not kill training
                traceback.print_exc()

    def submit(self, fn):
        self._q.put(fn)

    def join(self):
        self._q.put(None)
        self._t.join()


def epoch_perm(seed, e, n_train):
    """Batch permutation for absolute epoch ``e``, derived from (seed, e)
    alone — a resumed run therefore sees exactly the batch orders the
    uninterrupted run would have seen (a single stateful RNG stream cannot
    be fast-forwarded across --resume_from).  Shared by the sequential and
    vmapped-fold drivers, whose equivalence contract depends on bit-equal
    permutations."""
    return np.random.RandomState((seed * 1_000_003 + e) % (2 ** 32)).permutation(n_train)


TRAIN_DATA_KEYS = ("observations", "inputs", "dev_1hot", "enc_observations")


def split_device_data(host):
    """The train split's model-facing arrays as one AttrDict — uploaded to
    device ONCE per run; every train chunk then ships only a [n_steps, B]
    int32 index grid and gathers its batches on device (jnp.take inside the
    scan).  Replaces the round-2..4 scheme of gathering the full stacked
    batch data on host and re-uploading ~7 MB per 20-epoch chunk through
    the ~13-36 MB/s tunnel (VERDICT r4 #1)."""
    return AttrDict((k, host[k]) for k in TRAIN_DATA_KEYS if k in host)


def build_epoch_stacks(seed, epoch, end_epoch, n_batch, n_batches, n_train):
    """Shuffled, padded batch-INDEX stacks for epochs [epoch, end_epoch]:
    {idx: [n_ep*n_batches, n_batch] int32, mask: same-shape float32} for
    one fused lax.scan dispatch over a device-resident split
    (``split_device_data``).  Pad rows repeat index 0 and carry mask 0.
    The gathered batches are bit-identical to the host-side fancy-indexing
    this replaces — jnp.take copies rows exactly."""
    n_ep = end_epoch - epoch + 1
    pad_total = n_batches * n_batch - n_train
    perms = np.stack([epoch_perm(seed, e, n_train) for e in range(epoch, end_epoch + 1)])
    masks = np.ones((n_ep, n_batches * n_batch), np.float32)
    if pad_total:
        masks[:, n_train:] = 0.0
        perms = np.concatenate([perms, np.zeros((n_ep, pad_total), int)], axis=1)
    return dict(
        idx=perms.reshape(n_ep * n_batches, n_batch).astype(np.int32),
        mask=masks.reshape(n_ep * n_batches, n_batch),
    )


def _stable_hash(obj):
    """Deterministic digest of nested dict/list/scalar/ndarray config
    structures (repr truncates large numpy arrays; this walks them)."""
    import hashlib

    h = hashlib.sha1()

    def walk(o):
        if isinstance(o, dict):
            h.update(b"{")
            for k in o:
                h.update(str(k).encode())
                h.update(b":")
                walk(o[k])
            h.update(b"}")
        elif isinstance(o, (list, tuple)):
            h.update(b"[")
            for v in o:
                walk(v)
            h.update(b"]")
        elif isinstance(o, np.ndarray):
            h.update(str(o.dtype).encode())
            h.update(str(o.shape).encode())
            h.update(np.ascontiguousarray(o).tobytes())
        else:
            h.update(repr(o).encode())
        h.update(b";")

    walk(obj)
    return h.hexdigest()


def merge_eval_stacks(stacked_np, n_chunks, chunk, n):
    """Host-side merge of one split's chunked eval outputs: flatten the
    [n_chunks, chunk, ...] axes, trim the zero-index padding back to the true
    ``n`` rows, unpack the packed bk_stats transfer, and compute the split
    ELBO.  ``stacked_np``: dict of numpy arrays (theta handled by callers)."""
    merged = AttrDict()
    for k, v in stacked_np.items():
        # [n_chunks, (4,)? chunk, ...] -> flatten the chunk axes, trim pad
        if k == "bk_stats":
            v = np.moveaxis(v, 1, 0).reshape(4, n_chunks * chunk, *v.shape[3:])[:, :n]
        elif k == "tb_logw_row":
            v = v[0]  # [n_chunks, K]: the split's row-ts lives in chunk 0
        else:
            v = v.reshape(n_chunks * chunk, *v.shape[2:])[:n]
        merged[k] = v
    log_w, log_p_obs, log_q, log_p = merged.pop("bk_stats")
    merged["log_w"] = log_w
    merged["log_p_obs"] = log_p_obs
    merged["log_q"] = log_q
    merged["log_p"] = log_p
    merged["elbo"] = float(np.mean(merged["per_item_elbo"]))
    return merged


def reshape_eval_theta(v, n_chunks, chunk, n):
    """[n_chunks, chunk, K, n_theta] host theta -> [n_theta, n, K]."""
    v = v.reshape(n_chunks * chunk, *v.shape[2:])[:n]
    return np.transpose(v, (2, 0, 1))


class LazyEvalSplit:
    """One split's dispatched eval outputs, fetched from device on demand.

    The eval jit returns a dict of [n_chunks, chunk, ...] device arrays;
    every key's host transfer pays the tunnel's per-array latency
    (~40-100 ms) plus bandwidth, so completion fetches only what its
    consumer actually reads (VERDICT r3 #1):

      * ``want_scalars``   — per-item ELBOs (the best-val decision + logs);
      * ``want_summaries`` — the TensorBoard scalar inputs (packed bk_stats,
        per-species log-probs, q moments); skipped when no writer exists;
      * ``want_results``   — the importance-weighted predictive moments a
        ``Results`` needs; fetched only when a new best-val must be cached
        or a figure drawn;
      * ``want_theta``     — the per-sample theta, the largest transfer
        (~19 MB at icml-val scale).

    Each fetch trims the chunk padding exactly as ``merge_eval_stacks``
    does; fetched keys accumulate in ``self.merged``.
    """

    SCALAR_KEYS = ("per_item_elbo",)
    SUMMARY_KEYS = ("bk_stats", "log_p_by_species", "q_mu", "q_prec")
    # the periodic TB path fetches only the on-device-reduced packed stats
    # (ONE [B, 1+3+S+2n] array + the [K] histogram row) — the tunnel
    # charges per-array latency, so array COUNT is what matters
    TB_KEYS = ("tb_packed", "tb_logw_row")
    RESULT_KEYS = (
        "q_mu", "q_prec",
        "iw_predict_mu", "iw_predict_std", "iw_states", "iw_variance",
    )

    def __init__(self, stacked_dev, n_chunks, chunk, n, unpack=None):
        self._dev = dict(stacked_dev)
        self._theta_dev = self._dev.pop("theta_bkn", None)
        self._n_chunks, self._chunk, self._n = n_chunks, chunk, n
        # (n_signals, n_theta) for slicing tb_packed; without it the packed
        # fetch is skipped and the classic per-key fetches are used
        self._unpack = unpack
        self.merged = AttrDict()

    @classmethod
    def from_merged(cls, merged):
        """Wrap an already-materialized merged dict (the merge:false multi
        path evaluates eagerly); every want_* becomes a no-op."""
        self = cls.__new__(cls)
        self._dev = {}
        self._theta_dev = None
        self._unpack = None
        self.merged = merged
        return self

    @property
    def has_theta(self):
        return self._theta_dev is not None or "theta" in self.merged

    def _fetch(self, k):
        v = self._dev.pop(k, None)
        if v is None:
            return
        v = np.asarray(v)
        nc, c, n = self._n_chunks, self._chunk, self._n
        if k == "bk_stats":
            v = np.moveaxis(v, 1, 0).reshape(4, nc * c, *v.shape[3:])[:, :n]
            for name, arr in zip(("log_w", "log_p_obs", "log_q", "log_p"), v):
                self.merged[name] = arr
        elif k == "tb_logw_row":
            self.merged[k] = v[0]  # the split's row-ts lives in chunk 0
        elif k == "tb_packed":
            v = v.reshape(nc * c, *v.shape[2:])[:n]
            S, nt = self._unpack
            self.merged["per_item_elbo"] = v[:, 0]
            self.merged["tb_stats"] = v[:, 1:4 + S]
            self.merged["q_mu"] = v[:, 4 + S:4 + S + nt]
            self.merged["q_prec"] = v[:, 4 + S + nt:]
        else:
            self.merged[k] = v.reshape(nc * c, *v.shape[2:])[:n]

    def want_scalars(self):
        # the packed array carries per_item_elbo in column 0 — one transfer
        # covers the scalar AND any later TB consumption
        if "per_item_elbo" not in self.merged:
            if self._unpack is not None and "tb_packed" in self._dev:
                self._fetch("tb_packed")
            else:
                self._fetch("per_item_elbo")
        if "elbo" not in self.merged:
            self.merged["elbo"] = float(np.mean(self.merged["per_item_elbo"]))
        return self.merged

    def want_summaries(self):
        for k in self.SUMMARY_KEYS:
            self._fetch(k)
        return self.merged

    def want_tb(self):
        for k in self.TB_KEYS:
            self._fetch(k)
        return self.merged

    def want_results(self):
        for k in self.RESULT_KEYS:
            self._fetch(k)
        return self.merged

    def fetch_theta(self):
        return reshape_eval_theta(
            np.asarray(self._theta_dev), self._n_chunks, self._chunk, self._n
        )

    def want_theta(self):
        if "theta" not in self.merged and self._theta_dev is not None:
            self.merged["theta"] = self.fetch_theta()
        return self.merged


_TIER_KEYS = ("shared", "constant", "global", "global_conditioned", "local")


def steps_cache_key(settings, program, model, args, n_batch, steps_per_epoch, multi, host, mesh):
    """Fingerprint of everything a jitted step bakes in as constants.

    Computed from HOST-side values only — touching device arrays here
    (e.g. prior_q()) costs a device round-trip per array, ~20 s each
    through the TPU tunnel.  Three layers:

    * ``program.structural_fingerprint()`` — the compiled probabilistic
      program MINUS prior values (those ride as runtime arguments, see
      runtime_priors): site names/tiers/KINDS, conditioning flags,
      constants, truncation bounds, Kumaraswamy support, dependency
      wiring.  Inference-graph nodes that differ only in propagated
      prior moments therefore hash EQUAL and share one executable;
    * a canonical hash of the NON-TIER keys of the resolved
      ``settings.params`` section — every hyperparameter the
      model/encoder/optimizer closures read (architecture sizes, solver,
      schedule, precisions config, ...); the tier sections are excluded
      because their traced-math content is already in the structural
      fingerprint and their prior moments must NOT key the cache;
    * the device-conditioning structure (depth + relevance vectors are
      baked into the decoder trace) and batch/mesh shapes.
    """
    p = {k: v for k, v in settings.params.items() if k not in _TIER_KEYS}
    if mesh is None:
        mesh_key = None
    else:
        mesh_key = (
            tuple(mesh.shape.items()),
            tuple(d.id for d in mesh.devices.flat),
        )
    d = settings.data
    return (
        settings.model,
        program.structural_fingerprint(),
        _stable_hash(p),
        model.use_laplace,
        model.condition_on_device,
        int(d.device_depth),
        _stable_hash(getattr(d, "relevance_vectors", None)),
        bool(getattr(args, "dreg", False)),
        args.train_samples,
        n_batch,
        steps_per_epoch,
        multi,
        # the split-resident data arg bakes N_train into the trace
        None if multi else host.observations.shape[0],
        None if multi else host.observations.shape[1:],
        None if multi else len(host.times),
        None if multi else host.inputs.shape[1:],
        None if multi else host.dev_1hot.shape[1:],
        mesh_key,
    )


def make_optimizer(p, steps_per_epoch):
    """Adam + multi-step LR decay (parity: vihds/training.py:82-86).

    Optional global-norm gradient clipping (params.grad_clip_norm):
    neural-precision specs can blow up the q precision head at the
    reference's lr=0.01 (observed: NaN abort mid-fold on
    auto_constant_precisions); off by default for parity.
    """
    boundaries = {
        int(b) * steps_per_epoch: p.learning_gamma for b in p.learning_boundaries
    }
    schedule = optax.piecewise_constant_schedule(p.learning_rate, boundaries)
    clip_norm = p.get("grad_clip_norm")
    if clip_norm:
        return optax.chain(optax.clip_by_global_norm(float(clip_norm)), optax.adam(schedule))
    return optax.adam(schedule)


def make_results(model, program, merged):
    """Merged eval arrays -> Results (the best-val/serving artifact)."""
    res = Results()
    res.init(
        model.state_names,
        program,
        merged.q_mu,
        merged.q_prec,
        merged.get("theta", np.zeros((program.n_theta, 0, 0), np.float32)),
        merged.elbo,
        {k: merged[k] for k in ("iw_predict_mu", "iw_predict_std", "iw_states", "iw_variance")},
    )
    return res


def update_summaries(writer, epoch, merged, program, settings):
    """TensorBoard scalars (parity: vihds/training.py:176-210 plus the
    per-distribution q summaries of ChainedDistribution.attach_summaries,
    reference vihds/distributions.py:156-159, 356-362)."""
    if writer is None:
        return
    from vihds_tpu.utils import variable_summaries

    plot_histograms = settings.params.plot_histograms
    prog = program
    n_var = len(prog.sites.local) + len(prog.sites.global_cond)
    for i, site in enumerate(prog.sites.ordered):
        if bool(prog.is_constant[i]):
            continue
        if i < n_var:
            variable_summaries(writer, epoch, merged.q_mu[:, i], site.name + ".mu", plot_histograms)
            variable_summaries(
                writer, epoch, merged.q_prec[:, i], site.name + ".prec", plot_histograms
            )
        else:
            writer.add_scalar("%s/mu" % site.name, float(merged.q_mu[:, i].mean()), epoch)
            writer.add_scalar("%s/prec" % site.name, float(merged.q_prec[:, i].mean()), epoch)
    if "log_w" in merged:
        log_w = merged.log_w
        K = log_w.shape[1]
        ts = min(1, log_w.shape[0] - 1)
        logw_row = log_w[ts, :]
        lse_p_obs = _np_logsumexp(merged.log_p_obs, 1)
        lse_p = _np_logsumexp(merged.log_p, 1)
        lse_q = _np_logsumexp(merged.log_q, 1)
        sp = np.stack(
            [_np_logsumexp(merged.log_p_by_species[:, :, i], 1)
             for i in range(merged.log_p_by_species.shape[2])], axis=-1,
        )
    else:
        # on-device-reduced stats (eval_step tb_stats/tb_logw_row): same
        # numbers, ~KB transfers
        logw_row = merged.tb_logw_row
        K = logw_row.shape[0]
        ts = min(1, merged.per_item_elbo.shape[0] - 1)
        lse_p_obs = merged.tb_stats[:, 0]
        lse_p = merged.tb_stats[:, 1]
        lse_q = merged.tb_stats[:, 2]
        sp = merged.tb_stats[:, 3:]
    normed_row = np.exp(logw_row - (merged.per_item_elbo[ts] + math.log(K)))
    variable_summaries(writer, epoch, logw_row, "IWS_unn_log", plot_histograms)
    variable_summaries(writer, epoch, normed_row, "IWS_normed", plot_histograms)
    writer.add_scalar("ELBO/elbo", merged.elbo, epoch)
    writer.add_scalar("ELBO/log_p", float(lse_p_obs.mean()), epoch)
    for i, name in enumerate(settings.data.signals):
        writer.add_scalar("ELBO/log_p_" + name, float(sp[:, i].mean()), epoch)
    writer.add_scalar("ELBO/log_prior", float(lse_p.mean()), epoch)
    writer.add_scalar("ELBO/loq_q", float(lse_q.mean()), epoch)


def make_step_fns(model, program, tx, args):
    """UNJITTED (train_epoch, eval_split) step functions.

    Shared by two consumers with different compilation strategies:
    ``Training`` jits them (optionally GSPMD-sharded over a device mesh) and
    ``xfold.VmapXval`` vmaps them over a leading FOLD axis so every
    cross-validation fold trains inside one batched compiled program.
    """
    use_laplace = model.use_laplace
    n_train_samples = args.train_samples
    fold_ok = model.ode_model.supports_fold()

    def loss_fn(params, batch, mask, key, priors):
        u = model.sample_u(key, batch.observations.shape[0], n_train_samples)
        # checkpoint=True: recompute solver steps in backward (2.5x faster
        # than storing residuals at these shapes; identical numerics)
        if fold_ok:
            # online log-lik inside the solver scan — no [B,K,S,T]
            # trajectory buffer (OdeModel.simulate_logprob)
            out = model.forward_logprob(params, batch, u, checkpoint=True, priors=priors)
            log_p_obs = out.log_p_by_species.sum(axis=2)
            log_q = program.log_prob(out.q, out.theta)
            log_p = program.log_prob(prior_as_q(program, priors), out.theta)
            terms = AttrDict(log_w=log_p_obs + log_p - log_q)
        else:
            out = model.forward(params, batch, u, checkpoint=True, priors=priors)
            terms = iwae_elbo_terms(program, out, batch, use_laplace, priors=priors)
        elbo = iwae_elbo(terms, mask)
        return -elbo

    if getattr(args, "dreg", False):
        vag = dreg_value_and_grad(model, program, n_train_samples, use_laplace)
    else:
        def vag(params, batch, mask, key, priors):
            return jax.value_and_grad(loss_fn)(params, batch, mask, key, priors)

    def train_epoch(params, opt_state, key, stacks, data, times, priors):
        """All of an epoch's batches in ONE device dispatch: lax.scan over
        ``stacks`` — {idx: [n_steps, B] int32, mask: [n_steps, B]} — with
        each step's batch GATHERED ON DEVICE (jnp.take) from ``data``, the
        split-resident arrays (observations, inputs, dev_1hot, and for
        non-merged multi-file data enc_observations).  This removes both
        the per-step host round-trip the reference pays (a full Python
        solver loop per batch, vihds/solvers.py:9-17) AND the per-chunk
        ~7 MB stacked-batch upload through the tunnel (only the ~20 KB
        index grid ships per chunk — VERDICT r4 #1).

        ``priors`` (program.runtime_priors() arrays) ride as ARGUMENTS so
        that inference-graph nodes differing only in (propagated) prior
        values share this one compiled program."""

        def body(carry, xs):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            batch = AttrDict((k, jnp.take(v, xs["idx"], axis=0)) for k, v in data.items())
            mask = xs["mask"]
            batch["times"] = times
            loss, grads = vag(params, batch, mask, sub, priors)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), -loss

        (params, opt_state, key), elbos = jax.lax.scan(
            body, (params, opt_state, key), stacks
        )
        return params, opt_state, key, elbos

    def eval_step(params, batch, mask, key, priors, n_samples, with_theta=True):
        u = model.sample_u(key, batch.observations.shape[0], n_samples)
        out = model.forward(params, batch, u, eval_mode=True, priors=priors)
        terms = iwae_elbo_terms(program, out, batch, use_laplace, priors=priors)
        lse = jax.scipy.special.logsumexp(terms.log_w, axis=1)
        per_item_elbo = lse - math.log(n_samples)
        iw = _importance_weighted_outputs(terms, out)
        # On-device reduction of everything a periodic boundary needs
        # (round 5): ONE packed [B, 1+3+S+2n] array — per-item ELBO, the
        # per-item logsumexps of log_p_obs/log_p/log_q, the per-species
        # per-item logsumexp, and q's moments — plus the [K] row-ts log_w
        # histogram input.  The tunnel charges ~40-100 ms PER ARRAY, so the
        # old bk_stats/q fetches (~4 arrays x 2 splits x 50 boundaries)
        # were latency-bound regardless of size.
        lse = jax.scipy.special.logsumexp
        tb_packed = jnp.concatenate(
            [
                per_item_elbo[:, None],
                jnp.stack(
                    [lse(terms.log_p_obs, 1), lse(terms.log_p, 1), lse(terms.log_q, 1)],
                    axis=-1,
                ),
                lse(terms.log_p_by_species, axis=1),
                out.q.mu,
                out.q.prec,
            ],
            axis=-1,
        )
        ts = min(1, terms.log_w.shape[0] - 1)
        res = AttrDict(
            per_item_elbo=per_item_elbo,
            # one packed [4, B, K] transfer instead of four (the tunnel
            # charges per-array latency, not just bandwidth)
            bk_stats=jnp.stack([terms.log_w, terms.log_p_obs, terms.log_q, terms.log_p]),
            log_p_by_species=terms.log_p_by_species,
            tb_packed=tb_packed,
            tb_logw_row=terms.log_w[ts],
            q_mu=out.q.mu,
            q_prec=out.q.prec,
            **iw,
        )
        if with_theta:
            # natural [B, K, n] layout — transposing on device forces a
            # relayout program (observed: 36 s first-transfer compile);
            # the host reshapes for free
            res["theta_bkn"] = out.theta_clipped
        return res

    def eval_split(params, stacks, times, key, priors, n_samples, with_theta):
        """All chunks of a split in ONE dispatch (lax.map over the
        ``stacks`` AttrDict of [n_chunks, chunk, ...] arrays) so the host
        pays each transfer's tunnel latency once per split, not once per
        chunk."""
        n_chunks = jax.tree_util.tree_leaves(stacks)[0].shape[0]
        keys = jax.random.split(key, n_chunks)

        def one(inp):
            xs, k = inp
            batch = AttrDict(xs)
            batch["times"] = times
            return eval_step(params, batch, None, k, priors, n_samples, with_theta)

        return jax.lax.map(one, (stacks, keys))

    return train_epoch, eval_split


class Training:
    """Orchestrates training of the latent space using the IWAE bound
    (parity: vihds/training.py:71-383)."""

    def __init__(self, args, settings, data, program, model, mesh=None):
        self.args = args
        self.settings = settings
        self.dataset_pair = data
        self.model = model
        self.program = program
        self.mesh = mesh
        # Multi-PROCESS (pod-slice) mode: the mesh spans devices this process
        # cannot address.  Every process loads the identical dataset and runs
        # the identical host control flow in lockstep; numpy inputs are
        # globalized by the jit in_shardings (each process contributes its
        # addressable shards), outputs come back fully replicated
        # (out_shardings) so host-side fetches and decisions are uniform.
        from vihds_tpu.parallel import multihost

        self.multiprocess = multihost.is_multiprocess_mesh(mesh)

        p = settings.params
        self.n_batch = min(p.n_batch, data.n_train)
        # Non-merged multi-file data (merge: false): per-file work units with
        # static native-grid shapes (see MultiTimeSeriesDataset).
        ds = data.train.dataset
        self.multi = hasattr(ds, "files")
        if self.multi:
            self.enc_idx = ds.enc_idx
            self.train_groups = [
                (i, ds.file_batch(i, local), pos)
                for i, local, pos in ds.group_by_file(data.train.indices)
            ]
            self.valid_groups = [
                (i, ds.file_batch(i, local), pos)
                for i, local, pos in ds.group_by_file(data.test.indices)
            ]
            steps_per_epoch = sum(
                max(1, math.ceil(host.observations.shape[0] / self.n_batch))
                for _, host, _ in self.train_groups
            )
        else:
            steps_per_epoch = max(1, math.ceil(data.n_train / self.n_batch))
        self.steps_per_epoch = steps_per_epoch
        self.tx = make_optimizer(p, steps_per_epoch)

        # Full train/valid splits as host arrays for the big-K eval
        self.train_data = data.train.batch()
        self.valid_data = data.test.batch()

        held_out_name = getattr(args, "heldout", None) or "%d_of_%d" % (
            getattr(args, "split", 1),
            args.folds,
        )
        if settings.trainer is not None:
            self.train_path = os.path.join(settings.trainer.tb_log_dir, "train_%s" % held_out_name)
            self.valid_path = os.path.join(settings.trainer.tb_log_dir, "valid_%s" % held_out_name)
            os.makedirs(self.train_path, exist_ok=True)
            os.makedirs(self.valid_path, exist_ok=True)
            # Best-val cache is per experiment AND per fold.  The reference
            # uses one fixed global ".vihds_cache" for every run and fold
            # (vihds/utils.py:101,131) — concurrent or consecutive experiments
            # silently cross-contaminate each other's "best" results.
            self.cache_dir = os.path.join(
                settings.trainer.tb_log_dir, ".vihds_cache_%s" % held_out_name
            )
        else:
            self.train_path = None
            self.valid_path = None
            self.cache_dir = ".vihds_cache"
        if self.multiprocess and jax.process_index() != 0:
            # Non-main processes keep the identical control flow (incl. the
            # best-val dump/load) but write their scratch cache per-process so
            # hosts sharing a filesystem never clobber process 0's artifacts.
            import tempfile

            self.cache_dir = tempfile.mkdtemp(prefix="vihds_cache_p%d_" % jax.process_index())
        self.empty_cache = True

        self._build_steps()

    # ------------------------------------------------------------------ steps
    def _steps_cache_key(self):
        """See the module-level ``steps_cache_key``."""
        return steps_cache_key(
            self.settings,
            self.program,
            self.model,
            self.args,
            self.n_batch,
            self.steps_per_epoch,
            self.multi,
            self.train_data,
            self.mesh,
        )

    def _build_steps(self):
        # Prior moments + clip bounds ride as runtime ARGUMENTS of the jitted
        # steps (see ParamProgram.runtime_priors): two Training instances
        # whose programs differ only in prior values — e.g. inference-graph
        # nodes after posterior->prior propagation — share one executable.
        self._priors = AttrDict(
            (k, self._dev(v)) for k, v in self.program.runtime_priors().items()
        )
        # On a hit, a previous fold/node already compiled this exact
        # structural configuration: its jitted steps close over a
        # functionally identical model / program / optimiser (all
        # hyperparameters are in the key; fold data and priors enter as
        # arguments), so they are reused verbatim.
        key = self._steps_cache_key()
        cached = steps_cache_get(key)
        if cached is None:
            cached = self._build_steps_uncached()
            steps_cache_put(key, cached)
        train_jit, eval_jit = cached
        # The (possibly shared) jit objects, for tools that lower/inspect the
        # compiled step (tools/scaling_model.py) — the ambient-mesh wrapper
        # exposes its inner jit as `._jitted`.
        self._train_step_jit = getattr(train_jit, "_jitted", train_jit)
        self._eval_split_jit = getattr(eval_jit, "_jitted", eval_jit)
        priors = self._priors
        # External signatures stay priors-free; each instance binds its own.
        self._train_epoch = lambda p, o, k, s, d, t: train_jit(p, o, k, s, d, t, priors)
        self._eval_split = lambda p, s, t, k, n, w: eval_jit(p, s, t, k, priors, n, w)

    def _dev(self, x):
        """Host array -> device array for REPLICATED jit inputs.
        Multi-process: leave it as numpy — jit accepts numpy under a
        replicated in_sharding (every process passes the identical full
        array), while a committed single-device array cannot be resharded
        across processes."""
        if self.multiprocess:
            return np.asarray(x)
        return jnp.asarray(x)

    def _dev_stacked(self, x):
        """Host array -> device array for the [n_steps/n_chunks, B, ...]
        batch stacks (rows sharded over 'data').  Multi-process: jit rejects
        numpy under a non-replicated sharding, so build the global array
        explicitly — every process holds the identical full stack and
        contributes its addressable row shards."""
        if not self.multiprocess:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = np.asarray(x)
        sh = NamedSharding(self.mesh, P(None, "data"))
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    def _split_key(self, key, num=2):
        """jax.random.split that also works on replicated GLOBAL key arrays
        (eager ops on non-fully-addressable arrays raise in multi-process;
        route the split through a tiny replicated jit instead)."""
        if not self.multiprocess:
            return tuple(jax.random.split(key, num))
        if getattr(self, "_split_jit", None) is None or self._split_num != num:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            self._split_jit = jax.jit(
                lambda k: tuple(jax.random.split(k, num)), out_shardings=repl
            )
            self._split_num = num
        return self._split_jit(key)

    def _build_steps_uncached(self):
        train_epoch, eval_split = make_step_fns(self.model, self.program, self.tx, self.args)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            stacked = NamedSharding(self.mesh, P(None, "data"))
            # Multi-process: outputs must come back fully replicated so the
            # host-side fetches (ELBO NaN check, eval merges, best-val
            # decisions) are addressable and identical on every process.
            out_sh = {"out_shardings": repl} if self.multiprocess else {}
            # Train: the [n_steps, B] idx/mask grids shard their B columns
            # over 'data', so each step's on-device gather (jnp.take from
            # the replicated split data) lands its batch rows pre-sharded;
            # the latent draw u is constrained to P('data','sample')
            # inside the step (vihds_tpu/parallel.constrain_u), so every
            # [B, K, ...] intermediate — including the ODE trajectory — is
            # sharded over both mesh axes and GSPMD inserts the gradient
            # psum + cross-'sample' logsumexp collectives.
            train_jit = self._ambient_mesh(
                jax.jit(
                    train_epoch,
                    # `stacked` applies as a pytree prefix to every leaf of
                    # the stacks AttrDict: batch rows (axis 1) over 'data';
                    # the split-resident data arg stays replicated
                    in_shardings=(repl, repl, repl, stacked, repl, repl, repl),
                    donate_argnums=(0, 1),
                    **out_sh,
                )
            )
            # Eval: the big-K split evaluation is sharded the same way —
            # chunk rows over 'data', K over 'sample' — so a K=1000 eval
            # holds only K/n_sample samples per chip (SURVEY.md hard part #4).
            eval_jit = self._ambient_mesh(
                jax.jit(
                    eval_split,
                    in_shardings=(repl, stacked, repl, repl, repl),
                    static_argnames=("n_samples", "with_theta"),
                    **out_sh,
                )
            )
        else:
            train_jit = jax.jit(train_epoch, donate_argnums=(0, 1))
            eval_jit = jax.jit(eval_split, static_argnames=("n_samples", "with_theta"))
        return train_jit, eval_jit

    def _ambient_mesh(self, fn):
        """Make self.mesh the ambient mesh while ``fn`` runs, so the
        with_sharding_constraint on u resolves during tracing regardless of
        which entry point (CLI, bench, tests) invokes the step."""
        from vihds_tpu import parallel

        def wrapped(*a, **k):
            with parallel.use_mesh(self.mesh):
                return fn(*a, **k)

        wrapped._jitted = fn
        return wrapped

    # ------------------------------------------------------------------- eval
    def _eval_input_stacks(self, host_data, chunk, cache_key=None):
        """Chunked, padded DEVICE input stacks for one split's eval.

        The periodic evals re-evaluate the SAME train/valid splits every
        boundary; re-uploading their inputs costs ~0.5 MB per split per eval
        through the tunnel, so the device-resident stacks are cached under
        ``cache_key`` (the eval jit never donates its inputs, so the cached
        arrays stay valid across dispatches)."""
        cache = getattr(self, "_eval_stacks_cache", None)
        if cache is None:
            cache = self._eval_stacks_cache = {}
        hit = cache.get((cache_key, chunk)) if cache_key else None
        if hit is not None:
            return hit
        n = host_data.observations.shape[0]
        n_chunks = math.ceil(n / chunk)
        idx = np.concatenate([np.arange(n), np.zeros(n_chunks * chunk - n, int)])
        idx = idx.reshape(n_chunks, chunk)
        stacks = AttrDict(
            observations=self._dev_stacked(host_data.observations[idx]),
            inputs=self._dev_stacked(host_data.inputs[idx]),
            dev_1hot=self._dev_stacked(host_data.dev_1hot[idx]),
        )
        if "enc_observations" in host_data:
            stacks["enc_observations"] = self._dev_stacked(host_data.enc_observations[idx])
        out = (stacks, self._dev(host_data.times), n, n_chunks)
        if cache_key:
            cache[(cache_key, chunk)] = out
        return out

    def _dispatch_eval_split(self, params, host_data, n_samples, key, chunk=None,
                             with_theta=True, cache_key=None):
        """Issue one split's eval dispatch; returns a LazyEvalSplit whose
        array fetches happen at the consumer's pace (nothing blocks here)."""
        chunk = chunk or self.n_batch
        stacks, times, n, n_chunks = self._eval_input_stacks(host_data, chunk, cache_key)
        stacked = self._eval_split(params, stacks, times, key, n_samples, with_theta)
        unpack = (len(self.settings.data.signals), self.program.n_theta)
        return LazyEvalSplit(stacked, n_chunks, chunk, n, unpack=unpack)

    def _eval_full(self, params, host_data, n_samples, key, chunk=None, with_theta=True,
                   defer_theta=False):
        """Chunked full-split evaluation; IWAE is exact under data-chunking.

        ``with_theta=False`` skips the (largest) per-sample theta transfer —
        used for the train-split diagnostics, which never persist theta.
        ``defer_theta=True`` computes theta on device but delays the host
        transfer behind ``merged["_theta_fetch"]()`` — the validation loop
        fetches it only on a new best (or for the weighted-theta figure),
        saving ~19 MB of tunnel traffic per non-improving eval at icml-val
        scale."""
        lz = self._dispatch_eval_split(
            params, host_data, n_samples, key, chunk, with_theta or defer_theta
        )
        lz.want_scalars()
        lz.want_summaries()
        lz.want_results()
        if with_theta:
            lz.want_theta()
        elif defer_theta and lz.has_theta:
            lz.merged["_theta_fetch"] = lz.fetch_theta
        return lz.merged

    def _eval_multi(self, params, groups, n_samples, key, with_theta=True):
        """Grouped-by-file evaluation for non-merged (merge: false) splits:
        each file evaluates on its NATIVE grid, then the report-facing
        time-indexed outputs are snapped onto the shortest grid so the merged
        result is rectangular — the same contract a merged load produces."""
        n_total = sum(len(pos) for _, _, pos in groups)
        # _split_key: an eager split on a replicated GLOBAL key raises in
        # multi-process; the helper routes it through a tiny replicated jit
        keys = self._split_key(key, num=len(groups))
        merged = AttrDict()
        for (file_i, host, pos), k in zip(groups, keys):
            part = self._eval_full(params, host, n_samples, k, with_theta=with_theta)
            part.pop("elbo")
            # per-file row-ts histogram rows don't merge across files; the
            # multi path fetches full log_w anyway (update_summaries uses it)
            part.pop("tb_logw_row", None)
            part.pop("tb_stats", None)
            part.pop("tb_packed", None)
            snap = self.enc_idx[file_i]
            for name in ("iw_predict_mu", "iw_predict_std", "iw_states", "iw_variance"):
                part[name] = part[name][:, :, snap]
            for name, v in part.items():
                if name == "theta":
                    if name not in merged:
                        merged[name] = np.zeros((v.shape[0], n_total) + v.shape[2:], v.dtype)
                    merged[name][:, pos] = v
                else:
                    if name not in merged:
                        merged[name] = np.zeros((n_total,) + v.shape[1:], v.dtype)
                    merged[name][pos] = v
        merged["elbo"] = float(np.mean(merged["per_item_elbo"]))
        return merged

    def _make_results(self, merged):
        return make_results(self.model, self.program, merged)

    def evaluate(self, params, host_data, n_samples, key, with_theta=True):
        """Public (serving-facing) evaluation of an arbitrary host batch.

        ``host_data``: AttrDict of numpy arrays — observations[B,S,T]
        (training-scaled), inputs[B,C] (log1p), dev_1hot[B,D], times[T]
        (plus enc_observations for models trained on merge:false data).
        Runs the amortised q, K=``n_samples`` theta draws, the ODE decoder,
        and the IWAE weighting in one chunked jitted dispatch; returns
        (merged arrays, Results).  This is the API ``vihds_tpu.predict``
        serves unseen data through."""
        merged = self._eval_full(params, host_data, n_samples, key, with_theta=with_theta)
        return merged, self._make_results(merged)

    def _update_summaries(self, writer, epoch, merged):
        return update_summaries(writer, epoch, merged, self.program, self.settings)

    def _dispatch_eval(self, params, epoch, key):
        """DISPATCH phase of the periodic big-K eval on the FULL train and
        valid splits (parity: vihds/training.py:267-322).

        Issues the device computations and returns a pending handle whose
        fetches/summaries/plots run in ``_complete_eval`` — the training
        loop completes it AFTER dispatching the next train chunk, so the
        eval's host work (tunnel transfers, TensorBoard, figures) overlaps
        device execution instead of serializing between dispatches (the
        same pipeline the round-3 NaN check rides; VERDICT r3 #1).  The
        dispatch must happen at the boundary itself: the next train chunk
        DONATES the params buffers this eval reads."""
        t0 = time.time()
        k1, k2 = self._split_key(key)
        plot = (self.args.plot_epoch > 0) and (np.mod(epoch, self.args.plot_epoch) == 0)
        # train-split diagnostics never persist theta; skip its transfer
        # (and on-device computation) unless the weighted-theta figure
        # needs it — with_theta is a static arg of the eval executable
        want_theta_plot = bool(getattr(self.settings.params, "theta_columns", None)) and plot
        if self.multi:
            # merge:false groups evaluate per-file on native grids; the
            # grouped merge is host-driven, so this path stays eager (the
            # completion below just replays the materialized dicts)
            train_lz = LazyEvalSplit.from_merged(self._eval_multi(
                params, self.train_groups, self.args.train_samples, k1,
                with_theta=want_theta_plot,
            ))
            valid_lz = LazyEvalSplit.from_merged(self._eval_multi(
                params, self.valid_groups, self.args.test_samples, k2
            ))
        else:
            train_lz = self._dispatch_eval_split(
                params, self.train_data, self.args.train_samples, k1,
                with_theta=want_theta_plot, cache_key="train",
            )
            # theta computed on device, fetched at completion only on a new
            # best-val (~19 MB at icml-val scale through the tunnel)
            valid_lz = self._dispatch_eval_split(
                params, self.valid_data, self.args.test_samples, k2,
                with_theta=True, cache_key="valid",
            )
        return AttrDict(
            epoch=epoch, train=train_lz, valid=valid_lz,
            plot=plot, want_theta_plot=want_theta_plot,
            dispatch_time=time.time() - t0,
        )

    def _complete_eval(self, pend, log_data, train_writer, valid_writer):
        """COMPLETION phase: fetch (selectively), summarize, decide best-val,
        plot.  Values are independent of WHEN this runs — the handle pins the
        dispatched device outputs — so pipelined completion is bit-identical
        to the synchronous eval (tests/test_run_xval.py pins this)."""
        epoch = pend.epoch
        t0 = time.time()
        timers = getattr(self, "_timers", None) or PhaseTimers()
        print("epoch %4d" % epoch, end="", flush=True)
        log_data.n_test += 1
        dynamic = self.model.ode_model.precisions.dynamic

        # the first fetch blocks until the eval's device compute finishes
        # (everything after it is host/tunnel work) — timed separately so
        # the accounting can attribute device-queue wait vs host cost
        with timers.phase("eval.complete.device_wait"):
            train_merged = pend.train.want_scalars()
            pend.valid.want_scalars()
        worker = self._host_worker
        with timers.phase("eval.complete.fetch_summaries"):
            if train_writer is not None:
                pend.train.want_tb()
        with timers.phase("eval.complete.tb"):
            self._update_summaries(train_writer, epoch, train_merged)
        print(
            " | train (iwae-elbo = %0.4f, time = %0.2f, total = %0.2f)"
            % (
                train_merged.elbo,
                log_data.total_train_time / epoch,
                log_data.total_train_time,
            ),
            end="",
            flush=True,
        )
        if train_writer is not None and pend.plot:
            with timers.phase("eval.complete.figures"):
                pend.train.want_results()
                if pend.want_theta_plot:
                    # the weighted-theta figure reads the full log_w + theta
                    pend.train.want_summaries()
                    pend.train.want_theta()
                train_output = self._make_results(train_merged)
                fig_train = lambda: plotting_hooks.eval_plots(
                    self, train_writer, epoch, self.train_data, train_output, dynamic=dynamic
                )
                worker.submit(fig_train) if worker else fig_train()

        valid_merged = pend.valid.want_scalars()
        improved = valid_merged.elbo > log_data.max_val_elbo
        with timers.phase("eval.complete.fetch_summaries"):
            if valid_writer is not None:
                pend.valid.want_tb()
        with timers.phase("eval.complete.tb"):
            self._update_summaries(valid_writer, epoch, valid_merged)
        valid_output = None
        if valid_writer is not None and pend.plot:
            # the figure needs the predictive moments now; rendering itself
            # rides the host worker
            with timers.phase("eval.complete.fetch_results"):
                pend.valid.want_results()
                valid_merged.pop("_theta_fetch", None)
                valid_output = self._make_results(valid_merged)
            with timers.phase("eval.complete.figures"):
                fig_valid = lambda: (
                    plotting_hooks.eval_plots(
                        self, valid_writer, epoch, self.valid_data, valid_output, dynamic=dynamic
                    ),
                    pend.want_theta_plot and plotting_hooks.weighted_theta_plot(
                        self, valid_writer, epoch, train_merged
                    ),
                )
                worker.submit(fig_valid) if worker else fig_valid()
        if improved:
            log_data.max_val_elbo = valid_merged.elbo
            # Defer the best-val materialization (the ~19 MB theta fetch +
            # Results build + disk dump): hold the winning eval's device
            # handle; it is materialized once — at the next best (released),
            # or at run end / NaN abort (_flush_best) — producing the
            # identical final cache artifact with ~25 s less tunnel traffic
            # per icml run (round-5 accounting).  VIHDS_SYNC_EVAL keeps the
            # old materialize-at-boundary behavior.
            if self._sync_eval:
                with timers.phase("eval.complete.fetch_results"):
                    pend.valid.want_results()
                    pend.valid.want_theta()
                    valid_merged.pop("_theta_fetch", None)
                    valid_output = self._make_results(valid_merged)
                with timers.phase("eval.complete.dump"):
                    valid_output.dump(self.cache_dir)
                self.empty_cache = False
                self._pending_best = None
            else:
                self._pending_best = pend.valid

        log_data.training_elbo_list.append(train_merged.elbo)
        log_data.validation_elbo_list.append(valid_merged.elbo)
        log_data.total_test_time += pend.dispatch_time + (time.time() - t0)
        print(
            " | val (iwae-elbo = %0.4f, time = %0.2f, total = %0.2f)"
            % (
                valid_merged.elbo,
                log_data.total_test_time / log_data.n_test,
                log_data.total_test_time,
            )
        )
        return valid_output

    def _flush_best(self):
        """Materialize the deferred best-val eval: fetch its predictive
        moments + theta, build the Results, dump it to the cache dir.  The
        handle pins the dispatched device outputs, so the artifact is
        bit-identical to materializing at the eval's own boundary."""
        pend_v = getattr(self, "_pending_best", None)
        if pend_v is None:
            return None
        self._pending_best = None
        merged = pend_v.want_scalars()
        pend_v.want_results()
        pend_v.want_theta()
        merged.pop("_theta_fetch", None)
        out = self._make_results(merged)
        out.dump(self.cache_dir)
        self.empty_cache = False
        return out

    def _train_file_data(self, file_i, host):
        """Per-file device-resident train data + times for the merge:false
        path, uploaded once per run (under --distributed these are
        replicated numpy — every process holds the identical file data, so
        merge:false trains multi-process exactly like the merged path)."""
        cache = getattr(self, "_train_file_cache", None)
        if cache is None:
            cache = self._train_file_cache = {}
        hit = cache.get(file_i)
        if hit is None:
            hit = cache[file_i] = (
                AttrDict((k, self._dev(v)) for k, v in split_device_data(host).items()),
                self._dev(host.times),
            )
        return hit

    def _run_multi_epochs(self, params, opt_state, key, seed, epoch, end_epoch):
        """Train epochs [epoch, end_epoch] over non-merged files: one fused
        dispatch per (epoch, file) — files interleave within each epoch, and
        each file's batches scan on its own native-grid compiled program."""
        all_elbos = []
        for e in range(epoch, end_epoch + 1):
            # one stream per (seed, epoch): per-file perms drawn sequentially,
            # so resume replays the identical batch orders (see epoch_perm)
            rng_e = np.random.RandomState((seed * 1_000_003 + e) % (2 ** 32))
            for file_i, host, _ in self.train_groups:
                n_f = host.observations.shape[0]
                nb = max(1, math.ceil(n_f / self.n_batch))
                perm = rng_e.permutation(n_f)
                pad = nb * self.n_batch - n_f
                mask = np.ones(nb * self.n_batch, np.float32)
                if pad:
                    mask[n_f:] = 0.0
                    perm = np.concatenate([perm, np.zeros(pad, int)])
                stacks = AttrDict(
                    idx=self._dev_stacked(perm.reshape(nb, self.n_batch).astype(np.int32)),
                    mask=self._dev_stacked(mask.reshape(nb, self.n_batch)),
                )
                data, times_f = self._train_file_data(file_i, host)
                params, opt_state, key, elbos = self._train_epoch(
                    params, opt_state, key, stacks, data, times_f
                )
                all_elbos.append(np.asarray(elbos))
        return params, opt_state, key, np.concatenate(all_elbos)

    # -------------------------------------------------------------------- run
    def run(self):
        if self.settings.trainer is not None:
            from torch.utils.tensorboard import SummaryWriter

            train_writer = SummaryWriter(self.train_path)
            valid_writer = SummaryWriter(self.valid_path)
        else:
            train_writer = None
            valid_writer = None

        seed = self.settings.seed or 0
        key = jax.random.PRNGKey(seed)
        key, k_init = jax.random.split(key)
        params = self.model.init_params(k_init)
        opt_state = self.tx.init(params)
        if self.multiprocess:
            # Deterministic eager init is identical on every process; commit
            # it as replicated GLOBAL arrays (via host numpy — a committed
            # local device array cannot be resharded across processes).
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            params, opt_state, key = jax.tree_util.tree_map(
                lambda x: jax.device_put(np.asarray(x), repl), (params, opt_state, key)
            )

        # Checkpoint/resume (capability the reference lacks — SURVEY.md §5.4)
        from vihds_tpu import checkpoint as ckpt

        ckpt_every = getattr(self.args, "checkpoint_epoch", 0) or 0
        ckpt_dir = None
        if ckpt_every or getattr(self.args, "resume_from", None):
            if self.settings.trainer is not None:
                held = getattr(self.args, "heldout", None) or "%d_of_%d" % (self.args.split, self.args.folds)
                ckpt_dir = os.path.join(self.settings.trainer.tb_log_dir, "checkpoints_%s" % held)
            if self.multiprocess:
                # Non-main processes have no trainer (no results dir); the
                # process-0 path is authoritative and every process must pass
                # the SAME directory to orbax (its save/finalize barriers are
                # collective).  Requires a filesystem all processes share —
                # an NFS/GCS mount on a pod slice; trivially true in the
                # 2-process CPU e2e test.
                from vihds_tpu.parallel import multihost

                ckpt_dir = multihost.broadcast_string(ckpt_dir or "") or None
        start_epoch = 1
        resume_from = getattr(self.args, "resume_from", None)
        if resume_from:
            # Under --distributed the template (and therefore the restored
            # state) is host numpy — identical on every process — and is
            # committed to the mesh as replicated global arrays below, same
            # as the fresh init.
            as_template = (
                (lambda t: jax.tree_util.tree_map(np.asarray, t)) if self.multiprocess else (lambda t: t)
            )
            template = {
                "params": as_template(params),
                "opt_state": as_template(opt_state),
                "key": np.asarray(key),
                "extra": {"epoch": 0},
            }
            step, state = ckpt.restore(resume_from, template=template)
            if state is not None:
                params = state["params"]
                opt_state = state["opt_state"]
                key = state["key"]
                if self.multiprocess:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    repl = NamedSharding(self.mesh, P())
                    params, opt_state, key = jax.tree_util.tree_map(
                        lambda x: jax.device_put(np.asarray(x), repl), (params, opt_state, key)
                    )
                start_epoch = int(state["extra"]["epoch"]) + 1
                print("Resumed from %s at epoch %d" % (resume_from, start_epoch - 1))

        n_train = self.dataset_pair.n_train
        train_host = self.train_data
        times = self._dev(train_host.times)
        # the full train split lives on device for the whole run; train
        # chunks ship only their [n_steps, B] index grids (see train_epoch)
        train_dev = None
        if not self.multi:
            train_dev = AttrDict(
                (k, self._dev(v)) for k, v in split_device_data(train_host).items()
            )

        log_data = TrainingLogData()
        print("---------------------------")
        if getattr(self.args, "heldout", None):
            print("Training: heldout device = %s" % self.args.heldout)
        else:
            print("Training: split %d of %d" % (self.args.split, self.args.folds))
        valid_output = None
        iterating = True
        epoch = start_epoch
        timers = self._timers = PhaseTimers()
        run_t0 = time.time()
        n_batches = math.ceil(n_train / self.n_batch)
        profile_dir = getattr(self.args, "profile_dir", None)
        traced = False

        def next_boundary(e):
            """Largest epoch chunk [e, b] that crosses no eval/checkpoint/end
            boundary — all of it runs in ONE device dispatch."""
            te = self.args.test_epoch
            cands = [self.args.epochs, ((e - 1) // te + 1) * te]
            if ckpt_every:
                cands.append(((e - 1) // ckpt_every + 1) * ckpt_every)
            return min(cands)

        # Deferred NaN-abort pipeline: the previous chunk's ELBOs are checked
        # while the current chunk executes on-device, so the ~30 ms tunnel
        # round-trip of the fetch rides the device compute instead of
        # serializing between dispatches (measured: the per-chunk synchronous
        # fetch was the bulk of the ~10% gap to the device-side asymptote).
        # Consequence: the abort lags ONE chunk — the NaN chunk's boundary
        # eval is still DISPATCHED (its device compute runs once on NaN
        # params) but is discarded uncompleted: no NaN entry reaches the
        # validation list, TensorBoard, or the best-val cache.  Capability
        # parity with the reference's per-batch NaN abort
        # (vihds/training.py:331-333) at chunk granularity.
        pending_elbos = None
        # The eval pipeline (VERDICT r3 #1): a boundary's eval is DISPATCHED
        # at the boundary (before the next chunk donates its params) and
        # COMPLETED — fetches, summaries, best-val decision, figures — after
        # the next chunk's dispatch, overlapping device execution.
        # VIHDS_SYNC_EVAL=1 completes each eval at its own boundary instead
        # (bit-identical values; the equivalence is regression-tested).
        pending_eval = None
        sync_eval = bool(os.environ.get("VIHDS_SYNC_EVAL"))
        self._sync_eval = sync_eval
        # figure rendering rides one background thread (see HostWorker);
        # sync mode keeps every completion inline for the equivalence tests
        self._host_worker = (
            HostWorker() if (not sync_eval and self.settings.trainer is not None) else None
        )
        self._pending_best = None

        def _nan_abort(elbos):
            if elbos is not None and not np.isfinite(np.asarray(elbos)).all():
                print("Cannot proceed with ELBO = nan. Exiting.")
                return True
            return False

        while iterating and (epoch < self.args.epochs + 1):
            epoch_start = time.time()
            end_epoch = next_boundary(epoch)

            from vihds_tpu import profiling

            do_trace = bool(profile_dir) and not traced and epoch > start_epoch
            with profiling.trace(profile_dir if do_trace else None):
                if self.multi:
                    params, opt_state, key, chunk_elbos = self._run_multi_epochs(
                        params, opt_state, key, seed, epoch, end_epoch
                    )
                else:
                    # Stack n_ep epochs' shuffled, padded batches: [n_ep*NB, B]
                    # index grid -> one lax.scan dispatch covers every step up
                    # to the next eval/checkpoint boundary (host+tunnel
                    # overhead is ~25x the device compute per epoch otherwise
                    # — see BASELINE.md).
                    with timers.phase("train.build_stacks"):
                        host_stacks = build_epoch_stacks(
                            seed, epoch, end_epoch,
                            self.n_batch, n_batches, n_train,
                        )
                    with timers.phase("train.upload"):
                        stacks = AttrDict(
                            (k, self._dev_stacked(v)) for k, v in host_stacks.items()
                        )
                        if timers.enabled:
                            jax.block_until_ready(stacks)
                    with timers.phase("train.dispatch"):
                        params, opt_state, key, chunk_elbos = self._train_epoch(
                            params, opt_state, key, stacks, train_dev, times
                        )
                if do_trace:
                    jax.block_until_ready(chunk_elbos)
                    traced = True
            # Check the PREVIOUS chunk now (overlaps this chunk's execution).
            with timers.phase("train.nan_check_prev"):
                aborted = _nan_abort(pending_elbos)
            if aborted:
                iterating = False
                chunk_elbos = None  # consumed: don't re-print post-loop
                pending_eval = None  # dispatched on the NaN chunk's params
            log_data.total_train_time += time.time() - epoch_start
            if iterating and pending_eval is not None:
                # complete the previous boundary's eval while this chunk runs
                # (charged to test time, not train time)
                with timers.phase("eval.complete"):
                    valid_output = self._complete_eval(
                        pending_eval, log_data, train_writer, valid_writer
                    ) or valid_output
                pending_eval = None
            pending_elbos = chunk_elbos
            epoch = end_epoch
            if iterating and np.mod(epoch, self.args.test_epoch) == 0:
                key, sub = self._split_key(key)
                with timers.phase("eval.dispatch"):
                    pending_eval = self._dispatch_eval(params, epoch, sub)
                if sync_eval:
                    if _nan_abort(pending_elbos):
                        iterating = False
                        pending_elbos = None
                        pending_eval = None
                    else:
                        valid_output = self._complete_eval(
                            pending_eval, log_data, train_writer, valid_writer
                        ) or valid_output
                        pending_eval = None
            if ckpt_every and ckpt_dir and iterating and np.mod(epoch, ckpt_every) == 0:
                # Checkpoint boundaries check the JUST-finished chunk
                # SYNCHRONOUSLY: the deferred pipeline must never persist
                # NaN params/opt_state — a resumed run would restore them
                # (round-3 advisor finding).  The blocking fetch is
                # negligible next to the checkpoint I/O itself.
                if _nan_abort(pending_elbos):
                    iterating = False
                    pending_elbos = None  # consumed: don't re-print
                    pending_eval = None  # this boundary's eval ran on NaN params
                elif self.multiprocess:
                    # Replicated global arrays -> identical host numpy on every
                    # process; orbax writes once (primary) and barriers all.
                    p_h, o_h, k_h = jax.tree_util.tree_map(
                        np.asarray, (params, opt_state, key)
                    )
                    ckpt.save(ckpt_dir, epoch, p_h, o_h, k_h, extra={"epoch": epoch})
                else:
                    ckpt.save(ckpt_dir, epoch, params, opt_state, key, extra={"epoch": epoch})
            epoch += 1
        # Final chunk's deferred check (diagnostic parity: the abort message
        # still prints when the LAST chunk is the one that went non-finite);
        # a NaN final chunk also discards its own boundary's pending eval.
        if _nan_abort(pending_elbos):
            pending_eval = None
        if pending_eval is not None:
            with timers.phase("eval.complete"):
                valid_output = self._complete_eval(
                    pending_eval, log_data, train_writer, valid_writer
                ) or valid_output
        # materialize the deferred best-val (fetch + Results + dump) — the
        # artifact is identical to the per-boundary dump it replaces
        with timers.phase("eval.flush_best"):
            valid_output = self._flush_best() or valid_output
        if self._host_worker is not None:
            with timers.phase("eval.figure_tail"):
                self._host_worker.join()
            self._host_worker = None
        if timers.enabled:
            print("run loop wall: %.2f s" % (time.time() - run_t0))
            timers.report()
        if train_writer is not None:
            train_writer.close()
            valid_writer.close()

        self.final_params = params
        if self.empty_cache:
            print("Exiting with no results in cache")
            return None
        final = Results()
        final.load(self.cache_dir)
        final.elbo_list = log_data.validation_elbo_list
        return final


def _np_logsumexp(x, axis):
    m = np.max(x, axis=axis, keepdims=True)
    return (m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))).squeeze(axis)
