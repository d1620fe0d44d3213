"""Model base layer: precision models, device conditioner, neural RHS blocks.

Capability parity with reference vihds/ode.py (OdeModel, DeviceConditioner,
NeuralStates) and vihds/precisions.py (ConstantPrecisions, NeuralPrecisions),
re-expressed as stateless static objects + explicit param pytrees + pure
functions over [B, K, ...] arrays.
"""

import jax
import jax.numpy as jnp

from vihds_tpu.nn import layers
from vihds_tpu.ops.solvers import integrate
from vihds_tpu.utils import default_get_value


def power(x, a):
    return x ** a


def transform_treatments(treatments):
    """Invert the dataset's log1p transform, clamped (parity:
    models/dr_constant.py:26)."""
    return jnp.clip(jnp.exp(treatments) - 1.0, 1e-12, 1e6)


def split_treatments(treatments, n):
    """treatments[B, C] -> n broadcastable [B, 1] columns (the reference tiles
    each to [B, K] — reference models/dr_constant.py:27-29; broadcasting is
    free under XLA so we keep [B, 1] views)."""
    tt = transform_treatments(treatments)
    return [tt[:, i : i + 1] for i in range(n)]


# --------------------------------------------------------------------------- #
# Precision models
# --------------------------------------------------------------------------- #
class ConstantPrecisions:
    """Observation precisions are latent thetas, constant over time
    (parity: vihds/precisions.py:18-38)."""

    dynamic = False

    def __init__(self, precision_vars):
        self.precision_vars = precision_vars

    def init_params(self, key):
        return {}

    def expand(self, params, theta, n_times, x_states):
        """x_states[B,K,S,T] -> (states, precisions[B,K,P,1] broadcastable to T)."""
        precisions = jnp.stack([theta[v] for v in self.precision_vars], axis=-1)
        return x_states, precisions[:, :, :, None]

    def at_time(self, params, theta, y):
        """Single-time counterpart of ``expand``: y[B,K,S] at ONE grid point
        -> (states[B,K,S], precisions[B,K,P]).  theta is loop-invariant, so
        XLA hoists the stack out of the solver scan."""
        return y, jnp.stack([theta[v] for v in self.precision_vars], axis=-1)


class NeuralPrecisions:
    """Precisions as extra ODE states with learned production/degradation
    nets: dprec/dt = N1(t,x,c) - N2(t,x,c) * prec
    (parity: vihds/precisions.py:41-103)."""

    dynamic = True

    def __init__(self, n_inputs, n_hidden_precisions, n_outputs=4, inverse=False, activation="tanh"):
        self.n_inputs = n_inputs
        self.n_hidden = n_hidden_precisions
        self.n_outputs = n_outputs
        self.inverse = inverse
        self.activation = jnp.tanh if activation == "tanh" else jax.nn.relu

    def init_params(self, key):
        n_in = self.n_inputs + 1  # +1 for time
        ks = jax.random.split(key, 3)
        if self.n_hidden < 1:
            return {
                "prod": layers.linear_init(ks[0], n_in, self.n_outputs, mode="xavier"),
                "degr": layers.linear_init(ks[1], n_in, self.n_outputs, mode="xavier"),
            }
        return {
            "hidden": layers.linear_init(ks[0], n_in, self.n_hidden, mode="xavier"),
            "prod": layers.linear_init(ks[1], self.n_hidden, self.n_outputs, mode="xavier", gain=0.5),
            "degr": layers.linear_init(ks[2], self.n_hidden, self.n_outputs, mode="xavier", gain=1.0),
        }

    def rhs(self, params, t, state, constants):
        """state[B,K,S_total]; returns dprec[B,K,n_outputs]
        (parity: vihds/precisions.py:76-87)."""
        s = state[..., : -self.n_outputs]
        var_state = state[..., -self.n_outputs :]
        t_exp = jnp.broadcast_to(jnp.asarray(t, state.dtype), state.shape[:-1] + (1,))
        if constants is not None:
            x = jnp.concatenate([t_exp, s, constants], axis=-1)
        else:
            x = jnp.concatenate([t_exp, s], axis=-1)
        if self.n_hidden < 1:
            h = self.activation(x)
            xa = jax.nn.sigmoid(layers.linear_apply(params["prod"], h))
            xd = jax.nn.sigmoid(layers.linear_apply(params["degr"], h))
        else:
            h = self.activation(layers.linear_apply(params["hidden"], x))
            xa = jax.nn.sigmoid(layers.linear_apply(params["prod"], h))
            xd = jax.nn.sigmoid(layers.linear_apply(params["degr"], h))
        return xa - xd * var_state

    def expand(self, params, theta, n_times, x_states):
        """Split trailing precision states off the trajectory
        (parity: vihds/precisions.py:89-94)."""
        if self.inverse:
            prec = 1.0 / x_states[:, :, -self.n_outputs :, :]
        else:
            prec = x_states[:, :, -self.n_outputs :, :]
        return x_states[:, :, : -self.n_outputs, :], prec

    def at_time(self, params, theta, y):
        """Single-time counterpart of ``expand``: split the trailing
        precision states off y[B,K,S_total]."""
        prec = y[..., -self.n_outputs :]
        if self.inverse:
            prec = 1.0 / prec
        return y[..., : -self.n_outputs], prec


class NeuralStates:
    """Black-box RHS: dx = sigmoid(prod(h)) - sigmoid(degr(h)) * x with
    h = relu(hidden([x, constants])) (parity: vihds/ode.py:119-146)."""

    def __init__(self, n_inputs, n_hidden, n_states, n_latents):
        self.n_inputs = n_inputs
        self.n_hidden = n_hidden
        self.n_states = n_states
        self.n_latents = n_latents

    def init_params(self, key):
        ks = jax.random.split(key, 3)
        return {
            "hidden": layers.linear_init(ks[0], self.n_inputs, self.n_hidden, mode="xavier"),
            "prod": layers.linear_init(ks[1], self.n_hidden, self.n_states, mode="xavier"),
            "degr": layers.linear_init(ks[2], self.n_hidden, self.n_states, mode="xavier"),
        }

    def __call__(self, params, x, constants):
        aug = jnp.concatenate([x, constants], axis=-1)
        hidden = jax.nn.relu(layers.linear_apply(params["hidden"], aug))
        dx = jax.nn.sigmoid(layers.linear_apply(params["prod"], hidden)) - jax.nn.sigmoid(
            layers.linear_apply(params["degr"], hidden)
        ) * x
        return dx


# --------------------------------------------------------------------------- #
# Model base
# --------------------------------------------------------------------------- #
class OdeModel:
    """Base class for mechanistic / black-box device models.

    Unlike the reference (whose device conditioner is re-created — and thereby
    re-initialised — on every forward pass, reference vihds/ode.py:43-58), the
    conditioner weights here are persistent, trained parameters created once in
    ``init_params``.
    """

    def __init__(self, config):
        self.device_depth = config.data.device_depth
        self.n_treatments = len(config.data.conditions)
        self.use_laplace = default_get_value(config.params, "use_laplace", False)
        self.relevance = config.data.relevance_vectors
        self.default_devices = config.data.default_devices
        self.solver = config.params.solver
        # Optional separate solver for the (forward-only) evaluation path —
        # e.g. 'pallas_midpoint' routes supported models through the fused
        # VMEM-resident Pallas integrator (2.3x the XLA scan forward on v5e).
        self.eval_solver = default_get_value(config.params, "eval_solver", None)
        self.adjoint = bool(config.params.adjoint_solver)
        self.precisions = None
        self.species = None
        self.n_species = None
        # Parameters the device conditioner applies to (set by subclasses).
        self.conditioned_params = ()

    # ------------------------------------------------------------- parameters
    def init_params(self, key):
        p = {}
        keys = jax.random.split(key, max(len(self.conditioned_params), 1) + 1)
        for i, name in enumerate(self.conditioned_params):
            p["cond_" + name] = layers.linear_init(
                keys[i], self.device_depth, 1, use_bias=False, mode="normal"
            )
        pk = self.precisions.init_params(keys[-1]) if self.precisions is not None else {}
        if pk:
            p["precisions"] = pk
        return p

    # ------------------------------------------------------------ conditioning
    def device_conditioner(self, params, param, param_name, dev_1hot):
        """param_cond = relu(W (dev_1hot * relevance)); multiplies ``param``
        ((1 + f) for default devices — parity: vihds/ode.py:43-58)."""
        dev_relevance = dev_1hot * jnp.asarray(self.relevance[param_name])
        cond = jax.nn.relu(layers.linear_apply(params["cond_" + param_name], dev_relevance))
        # cond: [B, 1], broadcasts over the IWAE axis
        if param_name in self.default_devices:
            return param * (1.0 + cond)
        return param * cond

    def condition_theta(self, params, theta, dev_1hot):
        """Apply the device conditioner to each grouped parameter."""
        for name in self.conditioned_params:
            theta[name] = self.device_conditioner(params, 1.0, name, dev_1hot)
        return theta

    # -------------------------------------------------------------- simulation
    def initialize_state(self, params, theta, treatments, n_batch, n_iwae):
        raise NotImplementedError

    def make_rhs(self, params, theta, treatments, dev_1hot):
        raise NotImplementedError

    def _solver_for(self, eval_mode):
        if eval_mode and self.eval_solver:
            return self.eval_solver
        return self.solver

    # Families with a fused Pallas kernel set (plain_kind, prec_kind) — see
    # vihds_tpu/ops/pallas_ode.KINDS — and implement _pallas_constants.
    pallas_kinds = None

    def _pallas_constants(self, theta, treatments):
        """Per-sample constants dict in the packed order the family's
        kernel expects ([B, K]-broadcastable leaves)."""
        raise NotImplementedError

    def _pallas_supported(self):
        """The fused kernels cover ConstantPrecisions and the shipped
        NeuralPrecisions configuration (n_hidden=0, tanh, non-inverse, 4
        outputs — the learned-precision ODE block runs in-kernel).
        Anything else falls back to the XLA scan."""
        p = self.precisions
        if not p.dynamic:
            return True
        return (
            isinstance(p, NeuralPrecisions)
            and p.n_hidden < 1
            and not p.inverse
            and p.activation is jnp.tanh
            and p.n_outputs == 4
        )

    def simulate(self, params, theta, times, treatments, dev_1hot, n_iwae, checkpoint=False, eval_mode=False):
        """Integrate and return x_states[B, K, S, T]
        (parity: vihds/ode.py:66-82).  ``solver: pallas_<method>`` (or
        ``eval_solver`` in eval mode) routes families that declare
        ``pallas_kinds`` through the fused VMEM-resident differentiable
        Pallas integrator."""
        n_batch = treatments.shape[0]
        method = self._solver_for(eval_mode)
        if method.startswith("pallas_") and self.pallas_kinds and self._pallas_supported():
            from vihds_tpu.ops import pallas_ode

            dynamic = self.precisions.dynamic
            kind = self.pallas_kinds[1 if dynamic else 0]
            n_states = self.n_species + (4 if dynamic else 0)
            y0 = jnp.broadcast_to(
                self.initialize_state(params, theta, treatments, n_batch, n_iwae),
                (n_batch, n_iwae, n_states),
            )
            sol = pallas_ode.simulate_kind(
                kind,
                self._pallas_constants(theta, treatments),
                y0,
                times,
                method=method[len("pallas_"):],
                prec_params=params.get("precisions") if dynamic else None,
            )
            return jnp.transpose(sol, (1, 2, 3, 0))
        init_state = self.initialize_state(params, theta, treatments, n_batch, n_iwae)
        rhs = self.make_rhs(params, theta, treatments, dev_1hot)
        sol = integrate(
            rhs,
            init_state,
            times,
            method=method,
            checkpoint=checkpoint,
            adjoint=self.adjoint,
        )  # [T, B, K, S]
        return jnp.transpose(sol, (1, 2, 3, 0))

    def supports_fold(self):
        """True when the training objective can run through the fused
        online-log-likelihood path (``simulate_logprob``): fixed-grid solver
        scans only — adaptive/adjoint/Pallas-forward solvers keep the
        trajectory-materialising path."""
        from vihds_tpu.ops.solvers import FIXED_GRID_SOLVERS

        return (self.solver in FIXED_GRID_SOLVERS) and not self.adjoint

    def simulate_logprob(
        self,
        params,
        theta,
        times,
        treatments,
        dev_1hot,
        n_iwae,
        observations,
        use_laplace=False,
        checkpoint=False,
    ):
        """Observation log-likelihood by species [B, K, S_obs] accumulated
        ONLINE inside the solver scan — the [B,K,S,T] trajectory is never
        materialised (see ops/solvers.integrate_fold).  Numerically this is
        the same ``sum_t log p(x_t | y_t)`` the trajectory path computes
        (reference vihds/training.py:24-33), evaluated per step instead of
        at the end.  Every model's ``observe`` indexes [:, :, i, :], so one
        trailing singleton time axis makes it a per-time map."""
        from vihds_tpu.ops.logprob import log_prob_gaussian, log_prob_laplace
        from vihds_tpu.ops.solvers import integrate_fold

        n_batch = treatments.shape[0]
        y0 = self.initialize_state(params, theta, treatments, n_batch, n_iwae)
        rhs = self.make_rhs(params, theta, treatments, dev_1hot)
        prec_params = params.get("precisions", {})
        lp = log_prob_laplace if use_laplace else log_prob_gaussian

        def fold(y, obs_t):
            states, prec = self.precisions.at_time(prec_params, theta, y)
            pred = self.observe(states[..., None], theta)[..., 0]  # [B,K,4]
            return lp(obs_t[:, None, :], pred, prec)

        obs_tbs = jnp.moveaxis(observations, -1, 0)  # [T, B, S]
        _, acc = integrate_fold(
            rhs, y0, times, fold, obs_tbs, method=self.solver, checkpoint=checkpoint
        )
        return acc

    def observe(self, x_states, theta):
        """Default 8-state observation map (parity: vihds/ode.py:84-93)."""
        x = x_states
        x_predict = jnp.stack(
            [
                x[:, :, 0, :],
                x[:, :, 0, :] * x[:, :, 1, :],
                x[:, :, 0, :] * (x[:, :, 2, :] + x[:, :, 4, :]),
                x[:, :, 0, :] * (x[:, :, 3, :] + x[:, :, 5, :]),
            ],
            axis=2,
        )
        return x_predict

    def expand_precisions(self, params, theta, n_times, x_states):
        return self.precisions.expand(params.get("precisions", {}), theta, n_times, x_states)
