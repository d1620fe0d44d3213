"""Black-box double-receiver: neural-network RHS over observed + latent species.

Capability parity with reference models/dr_blackbox.py: NeuralStates RHS over
4 observed + ``n_latent_species`` latent states, latent inputs z (local),
x (global), y (global-conditioned, offset by a learned device embedding), and
NeuralPrecisions always on.
"""

import jax.numpy as jnp

from vihds_tpu.models.base import NeuralPrecisions, NeuralStates, OdeModel
from vihds_tpu.nn import layers
from vihds_tpu.utils import default_get_value

import jax

SPECIES = ["OD", "RFP", "YFP", "CFP"]


class DR_Blackbox(OdeModel):
    def __init__(self, config):
        super().__init__(config)
        self.n_x = config.params.n_x
        self.n_y = config.params.n_y
        self.n_z = config.params.n_z
        self.n_latents = self.n_x + self.n_y + self.n_z
        self.n_species = 4
        self.n_latent_species = config.params.n_latent_species
        self.n_states = self.n_species + self.n_latent_species
        n_inputs = self.n_states + self.n_latents + self.n_treatments + self.device_depth
        self.precisions = NeuralPrecisions(
            n_inputs, config.params.n_hidden_decoder_precisions, 4, activation="relu"
        )
        self.species = list(SPECIES)
        self.n_hidden = config.params.n_hidden_decoder
        self.init_latent_species = default_get_value(config.params, "init_latent_species", 0.001)
        self.init_prec = default_get_value(config.params, "init_prec", 0.00001)
        self.neural_states = NeuralStates(n_inputs, self.n_hidden, self.n_states, self.n_latents)

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        p = {
            "offset": layers.linear_init(k1, self.device_depth, self.n_y, use_bias=True),
            "states": self.neural_states.init_params(k2),
            "precisions": self.precisions.init_params(k3),
        }
        return p

    def condition_theta(self, params, theta, dev_1hot):
        """y latents get a learned per-device offset
        (parity: models/dr_blackbox.py:86-96)."""
        offset = layers.linear_apply(params["offset"], dev_1hot)  # [B, n_y]
        for i in range(self.n_y):
            name = "y%d" % (i + 1)
            theta[name] = theta[name] + offset[:, None, i]
        return theta

    def _constants(self, theta, treatments, dev_1hot, n_iwae):
        """Concatenate [z.., x.., y.., treatments, devices] along features
        (parity: models/dr_blackbox.py:35-53; treatments stay in log1p space)."""
        latent_list = [theta["z%d" % (i + 1)] for i in range(self.n_z)]
        latent_list += [theta["x%d" % (i + 1)] for i in range(self.n_x)]
        latent_list += [theta["y%d" % (i + 1)] for i in range(self.n_y)]
        n_batch = treatments.shape[0]
        latents = jnp.stack(
            [jnp.broadcast_to(v, (n_batch, n_iwae)) for v in latent_list], axis=-1
        )
        tre = jnp.broadcast_to(treatments[:, None, :], (n_batch, n_iwae, treatments.shape[1]))
        dev = jnp.broadcast_to(dev_1hot[:, None, :], (n_batch, n_iwae, dev_1hot.shape[1]))
        return jnp.concatenate([latents, tre, dev], axis=-1)

    def initialize_state(self, params, theta, treatments, n_batch, n_iwae):
        x0 = jnp.stack(
            jnp.broadcast_arrays(
                theta["init_x"], theta["init_rfp"], theta["init_yfp"], theta["init_cfp"]
            ),
            axis=-1,
        )
        x0 = jnp.broadcast_to(x0, (n_batch, n_iwae, 4))
        h0 = jnp.full((n_batch, n_iwae, self.n_latent_species), self.init_latent_species)
        prec0 = jnp.full((n_batch, n_iwae, 4), self.init_prec)
        return jnp.concatenate([x0, h0, prec0], axis=-1)

    def simulate(self, params, theta, times, treatments, dev_1hot, n_iwae, checkpoint=False, eval_mode=False):
        """Route ``solver: pallas_<method>`` (or ``eval_solver`` in eval
        mode) through the fused black-box kernel (shared-weight MLP matmuls
        VMEM-resident for the whole time loop; vihds_tpu/ops/
        pallas_blackbox.py) when the configuration matches the shipped
        shape; otherwise the XLA scan."""
        method = self._solver_for(eval_mode)
        if method.startswith("pallas_"):
            from vihds_tpu.ops import pallas_blackbox

            if pallas_blackbox.supported(self):
                n_batch = treatments.shape[0]
                constants = self._constants(theta, treatments, dev_1hot, n_iwae)
                y0 = self.initialize_state(params, theta, treatments, n_batch, n_iwae)
                sol = pallas_blackbox.blackbox_simulate(
                    params, constants, y0, times, self.n_states,
                    method=method[len("pallas_"):],
                )
                return jnp.transpose(sol, (1, 2, 3, 0))
        return super().simulate(
            params, theta, times, treatments, dev_1hot, n_iwae,
            checkpoint=checkpoint, eval_mode=eval_mode,
        )

    def make_rhs(self, params, theta, treatments, dev_1hot):
        n_iwae = theta["z1"].shape[1]
        constants = self._constants(theta, treatments, dev_1hot, n_iwae)
        states_params = params["states"]
        prec_params = params["precisions"]

        def rhs(t, state):
            dx = self.neural_states(states_params, state[..., :-4], constants)
            dv = self.precisions.rhs(prec_params, t, state, constants)
            return jnp.concatenate([dx, dv], axis=-1)

        return rhs

    def observe(self, x_states, theta):
        x = x_states
        return jnp.stack(
            [
                x[:, :, 0, :],
                x[:, :, 0, :] * x[:, :, 1, :],
                x[:, :, 0, :] * x[:, :, 2, :],
                x[:, :, 0, :] * x[:, :, 3, :],
            ],
            axis=2,
        )
