"""Double-receiver device with growth-rate-coupled expression (reconstruction).

The reference ships ``specs/dr_growthrate_xval.yaml`` but no model: the spec
names ``model: dr_growthrate`` yet the lookup table has no such entry
(reference models/__init__.py:19-35), so the capability is dead upstream.
This module reconstructs it so the shipped spec is actually buildable.

Design (documented reconstruction, NOT reference parity — there is no
reference implementation to be faithful to): identical 8-species
double-receiver mechanics to :mod:`vihds_tpu.models.dr_constant`
(reference models/dr_constant.py:62-107), with the ribosomal/translational
capacity coupled to the instantaneous growth rate — the standard
growth-rate-dependence of gene expression (Klumpp & Hwa, PNAS 2009; Scott et
al., Science 2010).  Every production term ``rc * a_*`` is scaled by

    cap(t) = es + (1 - es) * gamma(t) / r          in [es, 1]

where ``gamma(t) = r * sigmoid(4 (t - tlag)) * (1 - x/K)`` is the logistic
growth rate already used for dilution, and ``es`` is the spec's extra global
(LogNormal mu=-2: median basal fraction ~0.14) — expression at zero growth.
At full exponential growth cap -> 1 and the model reduces exactly to
DR_Constant; in stationary phase expression decays to the basal fraction.

The spec's other deltas vs dr_constant_icml.yaml (separate ``prec_x``
template, nR/nS prior mu=1.0) live in the YAML, not the model.
"""

import jax
import jax.numpy as jnp

from vihds_tpu.models.base import OdeModel
from vihds_tpu.models.dr_constant import DR_Constant, _dr_constants, _dr_species_rhs


class DR_Growthrate(DR_Constant):
    version = 1

    def make_rhs(self, params, theta, treatments, dev_1hot):
        c = dict(_dr_constants(theta, treatments, self.version))
        es = jnp.clip(theta["es"], 0.0, 1.0)
        prec_params = params.get("precisions", {})
        dynamic = self.precisions.dynamic

        def rhs(t, state):
            x = state[..., 0]
            gnorm = jnp.clip(
                jax.nn.sigmoid(4.0 * (t - c["tlag"])) * (1.0 - x / c["K"]), 0.0, 1.0
            )
            cap = es + (1.0 - es) * gnorm
            # Scaling rc scales every production term (rc multiplies all of
            # them in _dr_species_rhs); dilution/degradation are untouched.
            ct = dict(c)
            ct["rc"] = c["rc"] * cap
            dX = _dr_species_rhs(ct, t, state)
            if dynamic:
                dV = self.precisions.rhs(prec_params, t, state, None)
                return jnp.concatenate([dX, dV], axis=-1)
            return dX

        return rhs

    def simulate(self, params, theta, times, treatments, dev_1hot, n_iwae, checkpoint=False, eval_mode=False):
        # The fused Pallas kernel implements the DR_Constant RHS; the
        # growth-coupled capacity is not part of it, so always take the
        # generic XLA-scan path.
        return OdeModel.simulate(
            self, params, theta, times, treatments, dev_1hot, n_iwae,
            checkpoint=checkpoint, eval_mode=eval_mode,
        )
