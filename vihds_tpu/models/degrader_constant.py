"""Degrader device: 11 species including AiiA lactonase degrading C6/C12,
with an arabinose (PBAD) input.

Capability parity with reference models/degrader_constant.py, with the stale
5-arg constructor signature fixed (models/degrader_constant.py:17; SURVEY.md
§2.5).
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

SPECIES = ["OD", "RFP", "YFP", "CFP", "F530", "F480", "LuxR", "LasR", "AiiA", "C6", "C12"]


def _degrader_constants(theta, treatments):
    c6, c12, ara = split_treatments(treatments, 3)
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
    for k in (
        "e76",
        "e81",
        "aCFP",
        "aYFP",
        "KGR_76",
        "KGS_76",
        "KGR_81",
        "KGS_81",
        "aR",
        "aS",
        "aI",
        "daiiA",
        "eA",
        "KAra",
    ):
        c[k] = theta[k]
    nA = jnp.clip(theta["nA"], 0.5, 3.0)
    # PBAD arabinose input (parity: models/degrader_constant.py:82-87)
    c["PBAD"] = (power(ara, nA) + c["eA"] * power(c["KAra"], nA)) / (
        power(ara, nA) + power(c["KAra"], nA)
    )
    c["rC6"] = theta["dA6"] * c6
    c["rC12"] = theta["dA12"] * c12
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


class Degrader_Constant(OdeModel):
    version = 1

    def __init__(self, config):
        super().__init__(config)
        self.precisions = ConstantPrecisions(["prec_x", "prec_rfp", "prec_yfp", "prec_cfp"])
        self.species = list(SPECIES)
        self.n_species = 11

    def _mech_state0(self, theta, treatments, n_batch, n_iwae):
        zero = jnp.zeros_like(theta["init_x"])
        c6, c12, _ara = split_treatments(treatments, 3)
        cols = [
            theta["init_x"],
            theta["init_rfp"],
            theta["init_yfp"],
            theta["init_cfp"],
            zero,
            zero,
            theta["init_luxR"],
            theta["init_lasR"],
            theta["init_aiiA"],
            c6,
            c12,
        ]
        cols = [jnp.broadcast_to(col, (n_batch, n_iwae)) for col in cols]
        return jnp.stack(cols, axis=-1)

    def initialize_state(self, params, theta, treatments, n_batch, n_iwae):
        return self._mech_state0(theta, treatments, n_batch, n_iwae)

    # Fused Pallas route (vihds_tpu/ops/pallas_ode.py; generic routing in
    # OdeModel.simulate)
    pallas_kinds = ("degrader", "degrader_prec")

    def _pallas_constants(self, theta, treatments):
        return _degrader_constants(theta, treatments)

    def make_rhs(self, params, theta, treatments, dev_1hot):
        c = _degrader_constants(theta, treatments)
        prec_params = params.get("precisions", {})
        dynamic = self.precisions.dynamic

        def rhs(t, state):
            x, rfp, yfp, cfp, f530, f480, luxR, lasR, aiiA = [state[..., i] for i in range(9)]
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
            d_aiiA = c["rc"] * c["aI"] * c["PBAD"] - (c["daiiA"] + gamma * aiiA)
            d_c6 = x * c["rC6"] * aiiA
            d_c12 = x * c["rC12"] * aiiA

            dX = jnp.stack(
                [d_x, d_rfp, d_yfp, d_cfp, d_f530, d_f480, d_luxR, d_lasR, d_aiiA, d_c6, d_c12],
                axis=-1,
            )
            if dynamic:
                dV = self.precisions.rhs(prec_params, t, state, None)
                return jnp.concatenate([dX, dV], axis=-1)
            return dX

        return rhs


class Degrader_Constant_Precisions(Degrader_Constant):
    def __init__(self, config):
        super().__init__(config)
        self.precisions = NeuralPrecisions(
            self.n_species, config.params.n_hidden_decoder_precisions, 4
        )

    def initialize_state(self, params, theta, treatments, n_batch, n_iwae):
        mech = self._mech_state0(theta, treatments, n_batch, n_iwae)
        precs = jnp.stack(
            [
                jnp.broadcast_to(theta[v], (n_batch, n_iwae))
                for v in ("init_prec_x", "init_prec_rfp", "init_prec_yfp", "init_prec_cfp")
            ],
            axis=-1,
        )
        return jnp.concatenate([mech, precs], axis=-1)
