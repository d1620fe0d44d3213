"""Relay device: 12 species including synthases LuxI/LasI and secreted C6/C12.

Capability parity with reference models/relay_constant.py, with the stale
constructor signatures fixed (the reference passes 5 args to the 4-arg
OdeFunc.__init__ and calls a nonexistent ``init_with_params`` —
models/relay_constant.py:17,201; see SURVEY.md §2.5).
"""

import jax
import jax.numpy as jnp

from vihds_tpu.models.base import (
    ConstantPrecisions,
    NeuralPrecisions,
    OdeModel,
    power,
    split_treatments,
)

SPECIES = ["OD", "RFP", "YFP", "CFP", "F530", "F480", "LuxR", "LasR", "LuxI", "LasI", "C6", "C12"]


def _relay_constants(theta, treatments):
    c6, c12 = split_treatments(treatments, 2)
    c = {}
    c["r"] = jnp.clip(theta["r"], 0.0, 4.0)
    c["K"] = jnp.clip(theta["K"], 0.0, 4.0)
    c["tlag"] = theta["tlag"]
    c["rc"] = theta["rc"]
    c["a530"] = theta["a530"]
    c["a480"] = theta["a480"]
    c["drfp"] = jnp.clip(theta["drfp"], 1e-12, 2.0)
    c["dyfp"] = jnp.clip(theta["dyfp"], 1e-12, 2.0)
    c["dcfp"] = jnp.clip(theta["dcfp"], 1e-12, 2.0)
    c["dR"] = jnp.clip(theta["dR"], 1e-12, 5.0)
    c["dS"] = jnp.clip(theta["dS"], 1e-12, 5.0)
    c["dlasI"] = jnp.clip(theta["dlasI"], 1e-12, 5.0)
    c["dluxI"] = jnp.clip(theta["dluxI"], 1e-12, 5.0)
    for k in (
        "e76",
        "e81",
        "aCFP",
        "aYFP",
        "KGR_76",
        "KGS_76",
        "KGR_81",
        "KGS_81",
        "KC6",
        "KC12",
        "Klux",
        "Klas",
        "aR",
        "aS",
    ):
        c[k] = theta[k]
    nR = jnp.clip(theta["nR"], 0.5, 3.0)
    nS = jnp.clip(theta["nS"], 0.5, 3.0)
    lb, ub = 1e-12, 1e0
    KR6 = jnp.clip(theta["KR6"], lb, ub)
    KR12 = jnp.clip(theta["KR12"], lb, ub)
    KS6 = jnp.clip(theta["KS6"], lb, ub)
    KS12 = jnp.clip(theta["KS12"], lb, ub)
    c["fracLuxR"] = (power(KR6 * c6, nR) + power(KR12 * c12, nR)) / power(
        1.0 + KR6 * c6 + KR12 * c12, nR
    )
    c["fracLasR"] = (power(KS6 * c6, nS) + power(KS12 * c12, nS)) / power(
        1.0 + KS6 * c6 + KS12 * c12, nS
    )
    return c


class Relay_Constant(OdeModel):
    version = 1

    def __init__(self, config):
        super().__init__(config)
        self.precisions = ConstantPrecisions(["prec_x", "prec_rfp", "prec_yfp", "prec_cfp"])
        self.species = list(SPECIES)
        self.n_species = 12

    def _mech_state0(self, theta, treatments, n_batch, n_iwae):
        zero = jnp.zeros_like(theta["init_x"])
        c6, c12 = split_treatments(treatments, 2)
        cols = [
            theta["init_x"],
            theta["init_rfp"],
            theta["init_yfp"],
            theta["init_cfp"],
            zero,
            zero,
            theta["init_luxR"],
            theta["init_lasR"],
            theta["init_luxI"],
            theta["init_lasI"],
            c6,
            c12,
        ]
        cols = jnp.broadcast_arrays(*[jnp.broadcast_to(col, (n_batch, n_iwae)) for col in cols])
        return jnp.stack(cols, axis=-1)

    def initialize_state(self, params, theta, treatments, n_batch, n_iwae):
        return self._mech_state0(theta, treatments, n_batch, n_iwae)

    # Fused Pallas route (vihds_tpu/ops/pallas_ode.py; generic routing in
    # OdeModel.simulate)
    pallas_kinds = ("relay", "relay_prec")

    def _pallas_constants(self, theta, treatments):
        return _relay_constants(theta, treatments)

    def make_rhs(self, params, theta, treatments, dev_1hot):
        c = _relay_constants(theta, treatments)
        prec_params = params.get("precisions", {})
        dynamic = self.precisions.dynamic

        def rhs(t, state):
            x, rfp, yfp, cfp, f530, f480, luxR, lasR, luxI, lasI = [
                state[..., i] for i in range(10)
            ]
            gr = c["r"] * jax.nn.sigmoid(4.0 * (t - c["tlag"]))
            gamma = gr * (1.0 - x / c["K"])
            boundLuxR = luxR * luxR * c["fracLuxR"]
            boundLasR = lasR * lasR * c["fracLasR"]
            P76 = (c["e76"] + c["KGR_76"] * boundLuxR + c["KGS_76"] * boundLasR) / (
                1.0 + c["KGR_76"] * boundLuxR + c["KGS_76"] * boundLasR
            )
            P81 = (c["e81"] + c["KGR_81"] * boundLuxR + c["KGS_81"] * boundLasR) / (
                1.0 + c["KGR_81"] * boundLuxR + c["KGS_81"] * boundLasR
            )

            d_x = gamma * x
            d_rfp = c["rc"] - (gamma + c["drfp"]) * rfp
            d_yfp = c["rc"] * c["aYFP"] * P81 - (gamma + c["dyfp"]) * yfp
            d_cfp = c["rc"] * c["aCFP"] * P76 - (gamma + c["dcfp"]) * cfp
            d_f530 = c["rc"] * c["a530"] - gamma * f530
            d_f480 = c["rc"] * c["a480"] - gamma * f480
            d_luxR = c["rc"] * c["aR"] - (gamma + c["dR"]) * luxR
            d_lasR = c["rc"] * c["aS"] - (gamma + c["dS"]) * lasR
            d_luxI = c["rc"] * P81 - (gamma + c["dluxI"]) * luxI
            d_lasI = c["rc"] * P76 - (gamma + c["dlasI"]) * lasI
            d_c6 = (c["KC6"] * c["rc"] * x * luxI) / (1.0 + luxI / c["Klux"])
            d_c12 = (c["KC12"] * c["rc"] * x * lasI) / (1.0 + lasI / c["Klas"])

            dX = jnp.stack(
                [d_x, d_rfp, d_yfp, d_cfp, d_f530, d_f480, d_luxR, d_lasR, d_luxI, d_lasI, d_c6, d_c12],
                axis=-1,
            )
            if dynamic:
                dV = self.precisions.rhs(prec_params, t, state, None)
                return jnp.concatenate([dX, dV], axis=-1)
            return dX

        return rhs


class Relay_Constant_Precisions(Relay_Constant):
    def __init__(self, config):
        super().__init__(config)
        self.precisions = NeuralPrecisions(
            self.n_species, config.params.n_hidden_decoder_precisions, 4
        )

    def initialize_state(self, params, theta, treatments, n_batch, n_iwae):
        mech = self._mech_state0(theta, treatments, n_batch, n_iwae)
        precs = jnp.stack(
            jnp.broadcast_arrays(
                theta["init_prec_x"],
                theta["init_prec_rfp"],
                theta["init_prec_yfp"],
                theta["init_prec_cfp"],
            ),
            axis=-1,
        )
        precs = jnp.broadcast_to(precs, (n_batch, n_iwae, 4))
        return jnp.concatenate([mech, precs], axis=-1)
