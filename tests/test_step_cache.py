"""Cross-fold / cross-node compiled-step reuse: Training instances with the
same STRUCTURAL configuration (spec structure, shapes, schedule, mesh) must
share their jitted train/eval steps — one XLA compile per configuration, not
per fold or per inference-graph node (prior values ride as runtime
arguments) — and the reuse must be numerically invisible."""

import numpy as np
import jax

from tests.conftest import make_args, spec
from vihds_tpu import training as T
from vihds_tpu.config import Config
from vihds_tpu.data.datasets import build_datasets
from vihds_tpu.prob import ParamProgram, parse_parameters
from vihds_tpu.vae import VAE


def _training(split, **arg_overrides):
    args = make_args(spec("dr_constant_one.yaml"), **arg_overrides)
    args.split = split
    args.folds = 2
    args.epochs = 2
    args.test_epoch = 2
    settings = Config(args)
    settings.trainer = None
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    return T.Training(args, settings, data, program, model)


def test_folds_share_compiled_steps_and_results_are_unchanged():
    T._STEP_CACHE.clear()
    t1 = _training(split=1)
    t2 = _training(split=2)
    assert len(T._STEP_CACHE) == 1
    # both instances bind the SAME cached jitted steps (the per-instance
    # wrapper only injects each instance's prior arrays)
    (cached_train, cached_eval) = next(iter(T._STEP_CACHE.values()))

    def closed_over(fn, target):
        return any(c.cell_contents is target for c in fn.__closure__)

    assert closed_over(t1._train_epoch, cached_train)
    assert closed_over(t2._train_epoch, cached_train)
    assert closed_over(t1._eval_split, cached_eval)
    assert closed_over(t2._eval_split, cached_eval)

    # fold 2 through the CACHED steps
    res_cached = t2.run()
    cached_elbos = list(res_cached.elbo_list)

    # fold 2 with a cold cache (its own compile)
    T._STEP_CACHE.clear()
    t2_fresh = _training(split=2)
    assert not closed_over(t2_fresh._train_epoch, cached_train)
    res_fresh = t2_fresh.run()
    np.testing.assert_array_equal(cached_elbos, list(res_fresh.elbo_list))
    np.testing.assert_allclose(res_cached.elbo, res_fresh.elbo, rtol=0, atol=0)


def test_cache_key_sensitivity():
    T._STEP_CACHE.clear()
    _training(split=1)
    _training(split=1, train_samples=11)  # different K -> different program
    assert len(T._STEP_CACHE) == 2
    _training(split=1, dreg=True)  # different estimator
    assert len(T._STEP_CACHE) == 3


def test_prior_change_shares_executable_and_is_exact():
    """Inference-graph prior propagation mutates prior moments between
    nodes.  Prior values ride as runtime ARGUMENTS of the jitted steps
    (ParamProgram.runtime_priors), so a prior-only change must HIT the
    compiled-step cache — one executable for every propagated node — and
    training through the shared executable must be bit-identical to a
    fresh compile of the new program."""
    T._STEP_CACHE.clear()
    args = make_args(spec("dr_constant_one.yaml"))
    args.epochs = 2
    args.test_epoch = 2
    settings = Config(args)
    settings.trainer = None
    data = build_datasets(args, settings)

    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    T.Training(args, settings, data, program, model)

    settings.params.local.r.mu = float(settings.params.local.r.mu) + 0.5
    settings.params.global_conditioned.aR.sigma = 1.5
    program2 = ParamProgram(parse_parameters(settings.params))
    model2 = VAE(settings, data, program2)
    t2 = T.Training(args, settings, data, program2, model2)
    assert len(T._STEP_CACHE) == 1, "prior-only change must reuse the executable"
    res_shared = t2.run()

    T._STEP_CACHE.clear()
    prog_fresh = ParamProgram(parse_parameters(settings.params))
    model_fresh = VAE(settings, data, prog_fresh)
    t2_fresh = T.Training(args, settings, data, prog_fresh, model_fresh)
    res_fresh = t2_fresh.run()
    np.testing.assert_array_equal(list(res_shared.elbo_list), list(res_fresh.elbo_list))
    np.testing.assert_allclose(res_shared.elbo, res_fresh.elbo, rtol=0, atol=0)


def test_distribution_kind_changes_the_key(tmp_path):
    """Review-found collision: two specs differing ONLY in a site's
    distribution family (LogNormal vs Normal, same moments) must NOT share
    compiled steps — the traced sampling/log-prob math differs."""
    import yaml

    src = spec("dr_constant_one.yaml")
    with open(src) as f:
        doc = yaml.safe_load(f)
    assert doc["params"]["global_conditioned"]["aR"]["distribution"] == "LogNormal"
    doc["params"]["global_conditioned"]["aR"]["distribution"] = "Normal"
    alt = tmp_path / "alt.yaml"
    alt.write_text(yaml.safe_dump(doc))

    T._STEP_CACHE.clear()
    _training_from_spec(src)
    _training_from_spec(str(alt))
    assert len(T._STEP_CACHE) == 2, "LogNormal->Normal change must be a cache miss"


def _training_from_spec(yaml_path):
    args = make_args(yaml_path)
    args.epochs = 2
    args.test_epoch = 2
    settings = Config(args)
    settings.trainer = None
    data = build_datasets(args, settings)
    program = ParamProgram(parse_parameters(settings.params))
    model = VAE(settings, data, program)
    return T.Training(args, settings, data, program, model)


def test_step_cache_is_bounded_lru():
    T._STEP_CACHE.clear()
    for k in range(T._STEP_CACHE_MAX + 3):
        T._STEP_CACHE["key%d" % k] = ("t%d" % k, "e%d" % k)
        while len(T._STEP_CACHE) > T._STEP_CACHE_MAX:
            T._STEP_CACHE.popitem(last=False)
    assert len(T._STEP_CACHE) == T._STEP_CACHE_MAX
    assert "key0" not in T._STEP_CACHE

    # the eviction wired into _build_steps: a cache MISS insert must trim
    # synthetic overflow back to the bound (hits never grow the dict)
    T._STEP_CACHE.clear()
    for k in range(T._STEP_CACHE_MAX + 2):
        T._STEP_CACHE["syn%d" % k] = (None, None)
    _training_from_spec(spec("dr_constant_one.yaml"))
    assert len(T._STEP_CACHE) <= T._STEP_CACHE_MAX
