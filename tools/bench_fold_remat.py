"""Micro-bench: remat structure of the fold training scan on the real chip.

The fold objective removed the [T,B,K,S] trajectory stack, but lax.scan with
a per-step jax.checkpoint still SAVES the carry (y, acc) every step for the
backward — the xplane trace shows those dynamic-update-slice writes at ~25%
of leaf device time (reports/trainstep_profile).  This probe measures the
full train step (value+grad+Adam, 140-step fused dispatch) under:

  * step:   per-step checkpoint (current default)
  * chunkC: outer scan over chunks of C steps, the chunk body checkpointed
            (saves (T-1)/C carries; backward recomputes each chunk with
            per-step-checkpointed inner steps)
  * none:   no checkpoint (XLA stores all step residuals — the known-slow
            baseline from BASELINE.md)

Usage: python tools/bench_fold_remat.py [variant ...]
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("INFERENCE_RESULTS_DIR", "/tmp/vihds_tpu_results")
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main(variants):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build
    from vihds_tpu.utils.attrdict import AttrDict
    from vihds_tpu.ops import solvers

    n_batch, n_samples, n_steps = 36, 200, 140
    args, settings, data, program, model = _build(train_samples=n_samples)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(1e-2)
    host = data.train.batch()
    idx = np.arange(n_batch)
    batch = AttrDict(
        observations=jnp.asarray(host.observations[idx]),
        inputs=jnp.asarray(host.inputs[idx]),
        dev_1hot=jnp.asarray(host.dev_1hot[idx]),
        times=jnp.asarray(host.times),
    )
    stacks = AttrDict(
        observations=jnp.broadcast_to(batch.observations[None], (n_steps,) + batch.observations.shape),
        inputs=jnp.broadcast_to(batch.inputs[None], (n_steps,) + batch.inputs.shape),
        dev_1hot=jnp.broadcast_to(batch.dev_1hot[None], (n_steps,) + batch.dev_1hot.shape),
        mask=jnp.ones((n_steps, n_batch), jnp.float32),
    )

    def make_epoch(fold_variant):
        orig = solvers.integrate_fold

        def loss_fn(params, b, mask, key):
            u = model.sample_u(key, b.observations.shape[0], n_samples)
            out = model.forward_logprob(params, b, u, checkpoint=True)
            log_w = (
                out.log_p_by_species.sum(axis=2)
                + program.log_prob(program.prior_q(), out.theta)
                - program.log_prob(out.q, out.theta)
            )
            lse = jax.scipy.special.logsumexp(log_w, axis=1)
            return -((lse - jnp.log(float(n_samples))) * mask).sum() / mask.sum()

        def epoch(params, opt_state, key, stacks, times):
            def body(carry, xs):
                params, opt_state, key = carry
                key, sub = jax.random.split(key)
                b = AttrDict(xs)
                mask = b.pop("mask")
                b["times"] = times
                loss, grads = jax.value_and_grad(loss_fn)(params, b, mask, sub)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, key), -loss

            (params, opt_state, key), elbos = jax.lax.scan(body, (params, opt_state, key), stacks)
            return params, opt_state, key, elbos

        def wrapped(*a):
            solvers.integrate_fold = fold_variant
            try:
                return epoch(*a)
            finally:
                solvers.integrate_fold = orig

        return jax.jit(wrapped)

    import jax
    from jax import lax

    def fold_step(rhs, y0, times, fold, xs, method="midpoint", checkpoint=True, unroll=4):
        return _orig_fold(rhs, y0, times, fold, xs, method=method, checkpoint=True, unroll=unroll)

    def fold_none(rhs, y0, times, fold, xs, method="midpoint", checkpoint=True, unroll=4):
        return _orig_fold(rhs, y0, times, fold, xs, method=method, checkpoint=False, unroll=unroll)

    def make_fold_chunk(C, inner_ckpt=True):
        def fold_chunk(rhs, y0, times, fold, xs, method="midpoint", checkpoint=True, unroll=4):
            import jax as _jax

            step_fn = solvers.FIXED_GRID_SOLVERS[method]
            T1 = times.shape[0] - 1
            assert T1 % C == 0, (T1, C)
            xs0 = _jax.tree_util.tree_map(lambda a: a[0], xs)
            xs_rest = _jax.tree_util.tree_map(lambda a: a[1:], xs)
            acc0 = fold(y0, xs0)
            steps = (times[:-1], times[1:], xs_rest)
            resh = lambda a: a.reshape((T1 // C, C) + a.shape[1:])
            chunks = _jax.tree_util.tree_map(resh, steps)

            def inner(carry, xs2):
                y, acc = carry
                t1, t2, x_t = xs2
                y_new = step_fn(rhs, y, t1, t2, t2 - t1)
                return (y_new, acc + fold(y_new, x_t)), None

            if inner_ckpt:
                inner = _jax.checkpoint(inner)

            @_jax.checkpoint
            def chunk_body(carry, cxs):
                carry, _ = lax.scan(inner, carry, cxs, unroll=min(4, C))
                return carry, None

            (y_final, acc), _ = lax.scan(chunk_body, (y0, acc0), chunks)
            return y_final, acc

        return fold_chunk

    _orig_fold = solvers.integrate_fold

    table = {
        "step": fold_step,
        "none": fold_none,
        "chunk5": make_fold_chunk(5),
        "chunk17": make_fold_chunk(17),
        "chunk5_noinner": make_fold_chunk(5, inner_ckpt=False),
    }
    key = jax.random.PRNGKey(0)
    for name in variants:
        fn = make_epoch(table[name])
        opt_state = tx.init(params)
        p, o, k, elbos = fn(params, opt_state, key, stacks, batch.times)
        jax.block_until_ready(elbos)
        assert np.isfinite(np.asarray(elbos)).all(), name
        rates = []
        for _ in range(5):
            t0 = time.perf_counter()
            p, o, k, elbos = fn(p, o, k, stacks, batch.times)
            jax.block_until_ready(elbos)
            rates.append(n_steps / (time.perf_counter() - t0))
        print(
            "%-16s median %7.1f steps/s  (min %7.1f max %7.1f)"
            % (name, np.median(rates), np.min(rates), np.max(rates)),
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv[1:] or ["step", "chunk5", "chunk17", "chunk5_noinner"])
