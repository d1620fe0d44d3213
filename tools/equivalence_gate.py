"""Equivalence-test parity gate (VERDICT r4 #3): TOST over q-site tensors.

The original gate statistic z = |mean_ref - mean_ours| / SE divides a
basin-mean shift by a standard error that SHRINKS with every added seed, so
growing the battery flags MORE basin-shifted sites — a gate that moves away
from "pass" as evidence accumulates is the wrong gate.  This tool replaces
it with a two-one-sided-tests (TOST) equivalence criterion whose margin is
calibrated in PER-SEED basin standard deviations (the scale optimizer-path
basin scatter actually lives on), which CONVERGES as seeds accumulate:

    delta  = mean_ref - mean_ours           (per site element)
    SE     = sqrt(var_ref/n_r + var_ours/n_o)      (Welch)
    margin = MARGIN_SD * s_basin,  s_basin = sqrt((var_ref + var_ours)/2)
    equivalent  <=>  |delta| + t_{1-alpha, df} * SE  <  margin
                 (both one-sided alpha=0.05 tests reject => 90% confidence)

As n grows, SE -> 0 and the criterion tends to |delta| < margin — a fixed,
meaningful claim ("the basin-mean shift is below 1.5 per-seed sd"), instead
of the old criterion's inevitable drift to significance.  Sites can also be
'inconclusive': not shown equivalent AND not significantly shifted beyond
the margin (underpowered) — reported separately from genuine failures.

Margin default 1.5 per-seed sd: the cross-battery experience scale — the
aR.mu basin shift that per-basin ground truth showed to be benign measured
~1.5 per-seed sd (reports/ar_mu_ground_truth), while the two sites with
consistent-sign non-overlapping ranges (aYFP.mu, KGS_81.prec) measure
~2.7 sd.  The margin separates exactly those two classes.

Reads the same battery npz artifacts as tools/posterior_parity.py.  Usage:

  python tools/equivalence_gate.py <ref_dir> [ours_dir] [label]

ref_dir holds reference_seed*.npz; ours_dir (default: ref_dir) holds
ours_seed*.npz.  Writes EQUIVALENCE.md into ours_dir.
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(REPO, "tools"))

MARGIN_SD = 1.5
ALPHA = 0.05


def t_quantile(p, df):
    """Elementwise Student-t quantile (df array-valued ok)."""
    from scipy.stats import t

    return t.ppf(p, np.maximum(np.asarray(df, np.float64), 1e-6))


def tost_table(ref_runs, our_runs, margin_sd=MARGIN_SD, alpha=ALPHA):
    """Per-site TOST verdicts.  Returns (rows, counts) where each row is
    (name, arity, delta_med_sd, frac_equiv, verdict) and verdict is one of
    'equivalent', 'shifted', 'inconclusive'.

    Element reduce mirrors the legacy gate's granularity: the site verdict
    keys on the MEDIAN element (a site tensor passes when its median
    element is shown equivalent), with the elementwise equivalent-fraction
    reported alongside.  'shifted' = the median element's shift is
    significantly BEYOND the margin (|delta| - t*SE > margin): the data
    affirmatively contradicts equivalence.  Anything else (CI straddles
    the margin) is 'inconclusive' — more seeds decide it, in one
    direction, because SE shrinks while |delta| and margin stand still."""

    names = ref_runs[0][0]
    assert names == our_runs[0][0], "q-site name sets differ"

    def stack(runs, i):
        return np.stack(
            [np.atleast_1d(np.asarray(r[1][i], dtype=np.float64)) for r in runs]
        )

    rows = []
    counts = {"equivalent": 0, "shifted": 0, "inconclusive": 0}
    for i, name in enumerate(names):
        if name.endswith(".value"):
            continue  # constants
        R, O = stack(ref_runs, i), stack(our_runs, i)
        if R.shape[1] != O.shape[1]:
            rows.append((name, "shape %s vs %s" % (R.shape, O.shape), np.nan, 0.0, "shifted"))
            counts["shifted"] += 1
            continue
        n_r, n_o = R.shape[0], O.shape[0]
        vr, vo = R.var(0, ddof=1), O.var(0, ddof=1)
        delta = np.abs(R.mean(0) - O.mean(0))
        se = np.sqrt(np.maximum(vr / n_r + vo / n_o, 1e-24))
        s_basin = np.sqrt(np.maximum((vr + vo) / 2.0, 1e-24))
        margin = margin_sd * s_basin
        # Welch-Satterthwaite df per element
        df = (vr / n_r + vo / n_o) ** 2 / np.maximum(
            (vr / n_r) ** 2 / max(n_r - 1, 1) + (vo / n_o) ** 2 / max(n_o - 1, 1),
            1e-30,
        )
        tcrit = t_quantile(1 - alpha, df)
        equiv = ((delta + tcrit * se) < margin).ravel()
        shifted = ((delta - tcrit * se) > margin).ravel()
        d_sd = (delta / np.maximum(s_basin, 1e-12)).ravel()
        med = np.argsort(d_sd)[len(d_sd) // 2]  # the median element
        if equiv[med]:
            verdict = "equivalent"
        elif shifted[med]:
            verdict = "shifted"
        else:
            verdict = "inconclusive"
        counts[verdict] += 1
        rows.append((name, R.shape[1], float(d_sd[med]), float(equiv.mean()), verdict))
    return rows, counts


def write_report(out_dir, label, ref_runs, our_runs, margin_sd=MARGIN_SD):
    rows, counts = tost_table(ref_runs, our_runs, margin_sd)
    legacy_rows, legacy_pass, legacy_tot = legacy_table(ref_runs, our_runs)
    n_tot = sum(counts.values())
    lines = [
        "# Equivalence gate (TOST): %s" % label,
        "",
        "%d reference + %d ours seeds.  Criterion per site element:" % (
            len(ref_runs), len(our_runs)),
        "|mean_ref - mean_ours| shown < %.1f per-seed basin sd at 90%%" % margin_sd,
        "confidence (two one-sided Welch tests, alpha=0.05); site verdict",
        "keys on the median element.  Unlike the legacy z-gate (which",
        "flags MORE sites as seeds accumulate because its SE denominator",
        "shrinks), this criterion CONVERGES: with enough seeds every site",
        "resolves to 'equivalent' (shift below margin) or 'shifted'",
        "(shift genuinely beyond margin).  'inconclusive' = the 90% CI",
        "straddles the margin — underpowered, not failing.",
        "",
        "| site tensor | arity | |shift| (per-seed sd) | frac elements equiv | verdict |",
        "|---|---|---|---|---|",
    ]
    for name, arity, d_sd, frac, verdict in sorted(rows, key=lambda r: -(r[2] if np.isfinite(r[2]) else 9e9)):
        lines.append(
            "| %s | %s | %s | %.2f | %s |"
            % (name, arity, "%.2f" % d_sd if np.isfinite(d_sd) else "—", frac,
               verdict.upper() if verdict == "shifted" else verdict)
        )
    lines += [
        "",
        "**Gate: %d equivalent / %d shifted / %d inconclusive (of %d site tensors).**"
        % (counts["equivalent"], counts["shifted"], counts["inconclusive"], n_tot),
        "",
        "Legacy z-gate on the same data (provenance; diverges with seed",
        "count — see VERDICT r4 #3): %d / %d within median z <= 3."
        % (legacy_pass, legacy_tot),
        "",
    ]
    path = os.path.join(out_dir, "EQUIVALENCE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[-6:]))
    print("written to", path)
    return counts


def legacy_table(ref_runs, our_runs):
    """The old median-z<=3 gate, recomputed for side-by-side provenance."""
    names = ref_runs[0][0]

    def stack(runs, i):
        return np.stack(
            [np.atleast_1d(np.asarray(r[1][i], dtype=np.float64)) for r in runs]
        )

    rows, n_pass, n_tot = [], 0, 0
    for i, name in enumerate(names):
        if name.endswith(".value"):
            continue
        R, O = stack(ref_runs, i), stack(our_runs, i)
        if R.shape[1] != O.shape[1]:
            n_tot += 1
            continue
        se = np.sqrt(R.var(0, ddof=1) / R.shape[0] + O.var(0, ddof=1) / O.shape[0])
        z = np.abs(R.mean(0) - O.mean(0)) / np.maximum(se, 1e-12)
        ok = float(np.median(z)) <= 3.0
        n_pass += ok
        n_tot += 1
        rows.append((name, float(np.median(z)), ok))
    return rows, n_pass, n_tot


def main():
    from posterior_parity import _collect

    ref_dir = os.path.abspath(sys.argv[1])
    ours_dir = os.path.abspath(sys.argv[2]) if len(sys.argv) > 2 else ref_dir
    label = sys.argv[3] if len(sys.argv) > 3 else os.path.basename(ref_dir)
    ref_runs = _collect(ref_dir, "reference")
    our_runs = _collect(ours_dir, "ours")
    write_report(ours_dir, label, ref_runs, our_runs)


if __name__ == "__main__":
    main()
