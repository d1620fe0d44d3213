"""Quantify clip-exploit activity in trained posteriors (parity evidence).

The reference evaluates log q and log p at the *clipped* theta
(reference vihds/vae.py:34, training.py:136-137).  Whenever the trained q
places mass beyond the +-4-sigma prior clip bound, every such sample is
pinned at the bound while -log q(clipped) keeps growing — the readout is
inflated relative to the true IWAE bound, and in the limit diverges (the
+1e7 runs quarantined in reports/posterior_parity*/diverged/).  This repo
scores log q / log p at the sampled theta (vihds_tpu/vae.py), identical
whenever clipping is inactive.

This tool measures, for each saved parity run (tools/posterior_parity.py
npz), how much q mass each implementation places beyond the clip bounds:
for site i with variational moments (m, s) and prior (m0, s0), the escaped
mass is  Phi((lo-m)/s) + 1 - Phi((hi-m)/s)  with [lo, hi] = m0 -+ 4 s0.
Both q and the prior are normal in the underlying (z-) domain for the
Normal/LogNormal families used by dr_constant_one, so this is exact.

Usage: python tools/clip_activity.py [out_dir] [spec]
"""

import glob
import math
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main(out_dir, spec_name):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from vihds_tpu.config import Config
    from vihds_tpu.prob import ParamProgram, parse_parameters
    from vihds_tpu.run_xval import create_parser

    args = create_parser(True).parse_args([os.path.join(REPO, "specs", spec_name)])
    settings = Config(args)
    prog = ParamProgram(parse_parameters(settings.params))
    pq = prog.prior_q()
    prior_mu = np.asarray(pq.mu)[0]
    prior_sig = 1.0 / np.sqrt(np.asarray(pq.prec)[0])
    site_index = {s.name: i for i, s in enumerate(prog.sites.ordered)}

    def phi(x):
        return 0.5 * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))

    print("| run | mean escaped q-mass | max escaped q-mass | worst site |")
    print("|---|---|---|---|")
    for tag in ("reference", "ours"):
        for path in sorted(glob.glob(os.path.join(out_dir, "%s_seed*.npz" % tag))):
            with np.load(path, allow_pickle=True) as z:
                names = [str(n) for n in z["q_names"]]
                vals = [np.asarray(v, np.float64) for v in z["q_values"]]
            mus = {n[:-3]: v for n, v in zip(names, vals) if n.endswith(".mu")}
            precs = {n[:-5]: v for n, v in zip(names, vals) if n.endswith(".prec")}
            rows = []
            for site, m in mus.items():
                if site not in precs or site not in site_index:
                    continue
                i = site_index[site]
                if not np.isfinite(prior_sig[i]) or prior_sig[i] <= 0:
                    continue  # constants
                s = 1.0 / np.sqrt(np.maximum(precs[site], 1e-12))
                lo = prior_mu[i] - 4.0 * prior_sig[i]
                hi = prior_mu[i] + 4.0 * prior_sig[i]
                esc = phi((lo - m) / s) + 1.0 - phi((hi - m) / s)
                rows.append((site, float(np.mean(esc)), float(np.max(esc))))
            mean_esc = float(np.mean([r[1] for r in rows]))
            worst = max(rows, key=lambda r: r[2])
            print(
                "| %s | %.4f | %.4f | %s |"
                % (os.path.basename(path)[:-4], mean_esc, worst[2], worst[0])
            )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "reports", "posterior_parity_1000ep")
    spec = sys.argv[2] if len(sys.argv) > 2 else "dr_constant_one.yaml"
    main(out, spec)
