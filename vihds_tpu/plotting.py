"""Reporting figures for training and cross-validation results.

Figure-family parity with reference vihds/plotting.py (prediction-vs-data
summary, weighted-theta pairplots, species trajectories, treatment
dose-response, per-device fit summaries, per-device individual fits, and
global/variable posterior-parameter plots), re-written around small shared
helpers.  All inputs are host numpy arrays.
"""

import matplotlib

matplotlib.use("agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import seaborn as sns  # noqa: E402
from matplotlib import cm  # noqa: E402

FS = 14


def _ax(axs, i, j, nrows):
    return axs[i, j] if nrows > 1 else axs[j]


def plot_prediction_summary(
    device_names, signal_names, times, OBS, MU, STD, device_ids, predict_style, fixYaxis=False
):
    """Data (red) vs predictive mean +- 2 std per device x signal
    (parity: vihds/plotting.py:16-53)."""
    nplots = MU.shape[1]
    unique_devices = np.unique(device_ids)
    ndevices = len(unique_devices)

    f, axs = plt.subplots(ndevices, nplots, sharex=True, figsize=(10, 2 * ndevices))
    for iu, device_id in enumerate(unique_devices):
        locs = np.where(device_ids == device_id)[0]
        for idx in range(nplots):
            ax = _ax(axs, iu, idx, ndevices)
            w_mu = MU[locs, idx, :]
            w_std = STD[locs, idx, :]
            for mu, std in zip(w_mu, w_std):
                ax.fill_between(times, mu - 2 * std, mu + 2 * std, color="grey", alpha=0.1)
            ax.plot(times, OBS[locs, idx, :].T, "r-", lw=1, alpha=1)
            ax.plot(times, w_mu.T, predict_style, lw=1, alpha=0.75, color="k")
            if fixYaxis:
                ax.set_ylim(-0.2, 1.2)
            if iu == ndevices - 1:
                ax.set_xlabel("Time (h)")
            if iu == 0:
                ax.set_title(signal_names[idx])
            if idx == 0:
                ax.set_ylabel(device_names[device_id])
    plt.tight_layout()
    sns.despine()
    return f


def plot_weighted_theta(
    theta_names,
    TR_iws,
    TR_theta,
    TR_device_ids,
    VL_iws,
    VL_theta,
    VL_device_ids,
    columns2use,
    sample=True,
    nsamples=100,
):
    """Pairplot of importance-(re)weighted theta samples, coloured by device
    (parity: vihds/plotting.py:56-129)."""
    import pandas as pd

    def resample(iws_matrix):
        rows = []
        for iws in iws_matrix:
            if sample:
                rows.append(np.random.choice(len(iws), nsamples, p=iws))
            else:
                rows.append(np.random.choice(len(iws), nsamples))
        return rows

    TR_samples = resample(TR_iws)
    n_train = TR_iws.shape[0]
    TR_devices = np.tile(np.asarray(TR_device_ids).reshape((n_train, 1)), [1, nsamples])

    names, cols = [], []
    for theta_idx in np.argsort(theta_names):
        vals = [values[s] for s, values in zip(TR_samples, TR_theta[theta_idx])]
        names.append(theta_names[theta_idx])
        cols.append(np.array(vals).flatten())
    names.append("device")
    cols.append(TR_devices.flatten())

    df = pd.DataFrame(np.array(cols, dtype=float).T, columns=names)
    sns.set(style="ticks")
    g = sns.PairGrid(df, hue="device", vars=columns2use)
    g = g.map_diag(sns.kdeplot, fill=True, alpha=0.5)
    g = g.map_offdiag(sns.scatterplot, s=20, alpha=0.25, edgecolor="k", linewidth=0.5)
    g = g.add_legend()
    return g.fig


def species_summary(
    species_names, treatments, device_ids, times, iw_states, devices, settings, normalise=True
):
    """Simulated (latent) species trajectories per device
    (parity: vihds/plotting.py:132-190)."""
    ndevices = len(devices)
    nplots = iw_states.shape[1]
    colors = "grbcmyk"
    divisors = [np.max(iw_states[:, idx, :]) if normalise else 1.0 for idx in range(nplots)]

    f, axs = plt.subplots(ndevices, nplots, sharex=True, sharey=normalise, figsize=(14, 2 * ndevices))
    for iu, device_id in enumerate(devices):
        for idx in range(nplots):
            ax = _ax(axs, iu, idx, ndevices)
            if settings.separate_conditions is True:
                for i, _ in enumerate(settings.conditions):
                    locs = np.where((device_ids == device_id) & (treatments[:, i] > 0.0))[0]
                    mus = iw_states[locs, idx, :] / divisors[idx]
                    ax.plot(np.tile(times, [len(locs), 1]).T, mus.T, "-", lw=1, alpha=0.5, color=colors[i])
            else:
                locs = np.where(device_ids == device_id)[0]
                mus = iw_states[locs, idx, :] / divisors[idx]
                ax.plot(np.tile(times, [len(locs), 1]).T, mus.T, "-", lw=1, color="k")
            if normalise:
                ax.set_ylim(-0.1, 1.1)
            if iu == 0:
                if idx < len(species_names):
                    ax.set_title(species_names[idx])
                else:
                    ax.set_title("Latent %d" % (idx - len(species_names)))
            ax.set_xticks([0, 4, 8, 12, 16])
        ax0 = _ax(axs, iu, 0, ndevices)
        ax0.set_ylabel(settings.pretty_devices[device_id], labelpad=20, fontweight="bold", fontsize=FS)
    sns.despine()
    plt.tight_layout()
    f.add_subplot(111, frameon=False)
    plt.tick_params(labelcolor="none", top=False, bottom=False, left=False, right=False)
    plt.xlabel("Time (h)", fontsize=FS, labelpad=7)
    plt.ylabel("Normalized output" if ndevices > 1 else "Norm. output", fontsize=FS, labelpad=0)
    return f


def xval_treatments(res, devices):
    """Dose-response: final predicted vs observed points over input levels
    (parity: vihds/plotting.py:193-256)."""
    nplots = len(res.settings.signals)
    ndev = len(devices)
    colors = ["g", "r", "b"]
    edges = ["darkgreen", "darkred", "darkblue"]

    f, axs = plt.subplots(ndev, nplots, sharex=True, sharey=True, figsize=(9, 2.2 * ndev))
    for iu, device_id in enumerate(devices):
        locs = np.where(res.devices == device_id)[0]
        input_values = [
            (np.exp(res.treatments[:, ci]) - 1)[locs] for ci, _ in enumerate(res.settings.conditions)
        ]
        for j, signal in enumerate(res.settings.signals):
            ax = _ax(axs, iu, j, ndev)
            mu = res.iw_predict_mu[locs, j, -1]
            std = res.iw_predict_std[locs, j, -1]
            for ci, cvalues in enumerate(input_values):
                ax.errorbar(cvalues, mu, yerr=std, fmt="o", ms=5, lw=1, mec=edges[ci % 3], color=colors[ci % 3], zorder=ci)
                ax.semilogx(cvalues, res.X_obs[locs, j, -1], "x", ms=5, lw=1, color=edges[ci % 3], zorder=ci + 20)
            ax.set_ylim(-0.1, 1.1)
            ax.tick_params(axis="both", which="major", labelsize=FS)
            ax.set_xticks(np.logspace(0, 4, 3))
            if j == 0:
                ax.set_ylabel(res.settings.devices[iu], labelpad=25, fontweight="bold", fontsize=FS)
            if iu == 0:
                ax.set_title(signal, fontsize=FS)

    ax = _ax(axs, 0, nplots - 1, ndev)
    dstr = [s + " (data)" for s in res.settings.conditions]
    mstr = [s + " (model)" for s in res.settings.conditions]
    ax.legend(labels=dstr + mstr)

    f.add_subplot(111, frameon=False)
    plt.tick_params(labelcolor="none", top=False, bottom=False, left=False, right=False)
    plt.xlabel(" / ".join(res.settings.conditions), fontsize=FS, labelpad=7)
    plt.ylabel("Normalized fluorescence" if ndev > 1 else "Norm. fluorescence", fontsize=FS, labelpad=7)
    sns.despine()
    return f


def xval_fit_summary(res, device_id, separatedInputs=False):
    """Per-device fit summary across unique treatments
    (parity: vihds/plotting.py:259-312)."""
    nplots = len(res.settings.signals)
    all_locs = []
    if separatedInputs is True:
        nrows = len(res.settings.conditions)
        for i in range(nrows):
            dev_locs = np.where((res.devices == device_id) & (res.treatments[:, i] > 0.0))[0]
            _, indices = np.unique(res.treatments[dev_locs, i], return_index=True)
            all_locs.append(dev_locs[indices])
        f, axs = plt.subplots(
            nrows, nplots, sharex=True, sharey=True, figsize=(2.2 * nplots, 1.6 * nrows + 1.2)
        )
    else:
        nrows = 1
        dev_locs = np.where(res.devices == device_id)[0]
        _, indices = np.unique(res.treatments[dev_locs, :], return_index=True, axis=0)
        all_locs.append(dev_locs[indices])
        f, axs = plt.subplots(1, nplots, sharey=True, figsize=(2.2 * nplots, 2.8))

    for i, locs in enumerate(all_locs):
        colors = [cm.rainbow(x) for x in np.linspace(0, 1, np.shape(locs)[0])]
        for idx in range(nplots):
            ax = _ax(axs, i, idx, nrows)
            w_mu = res.iw_predict_mu[locs, idx, :]
            w_std = res.iw_predict_std[locs, idx, :]
            ax.set_prop_cycle("color", colors)
            for mu, std in zip(w_mu, w_std):
                ax.fill_between(res.times, mu - 2 * std, mu + 2 * std, alpha=0.1)
            ax.plot(res.times, res.X_obs[locs, idx, :].T, ".", alpha=1, markersize=2)
            ax.plot(res.times, w_mu.T, "-", lw=2, alpha=0.75)
            ax.set_xlim(0.0, 17)
            ax.set_xticks([0, 5, 10, 15])
            ax.set_ylim(-0.2, 1.2)
            if (idx == 0) and (nrows > 1):
                ax.set_ylabel(
                    res.settings.conditions[i] + " dilution", labelpad=25, fontweight="bold", fontsize=FS
                )
            if i == 0:
                ax.set_title(res.settings.signals[idx], fontsize=FS)

    f.add_subplot(111, frameon=False)
    plt.tick_params(labelcolor="none", top=False, bottom=False, left=False, right=False)
    plt.xlabel("Time (h)", fontsize=FS, labelpad=7)
    plt.ylabel("Normalized output", fontsize=FS, labelpad=7)
    plt.tight_layout()
    sns.despine()
    return f


def gen_treatment_str(conditions, treatments, unit=None):
    """(parity: vihds/plotting.py:315-326)"""
    out = []
    for k, v in zip(conditions, treatments):
        val = np.exp(v) - 1.0
        vstr = ("%s = %1.1f" if 0.0 < val < 1.0 else "%s = %1.0f") % (k, val)
        if unit is not None:
            vstr = "%s %s" % (vstr, unit)
        out.append(vstr)
    return "\n".join(out)


def _individual_panel(f, res, loc, idx, maxi, pos, color, treatment_str, show_title, nplots_geom):
    nrows_geom, panel_index = nplots_geom
    ax = f.add_subplot(nrows_geom, panel_index[0], panel_index[1])
    ax.set_position(pos)
    mu = res.iw_predict_mu[loc, idx, :]
    std = res.iw_predict_std[loc, idx, :]
    ax.fill_between(res.times, (mu - 2 * std) / maxi, (mu + 2 * std) / maxi, alpha=0.25, color=color)
    ax.plot(res.times, res.X_obs[loc, idx, :] / maxi, "k.", markersize=2)
    ax.plot(res.times, mu / maxi, "-", lw=2, alpha=0.75, color=color)
    ax.set_xlim(0.0, 17)
    ax.set_xticks([0, 5, 10, 15])
    ax.set_ylim(-0.2, 1.2)
    ax.tick_params(axis="both", which="major", labelsize=FS)
    if show_title:
        plt.title(res.settings.signals[idx], fontsize=FS)
    ax.set_xticklabels([])
    if idx == 0:
        ax.set_ylabel(treatment_str, labelpad=25, fontsize=FS - 2)
    else:
        ax.set_yticklabels([])
    return ax


_PANEL_COLORS = ["tab:gray", "r", "y", "c"]


def xval_individual(res, device_id):
    """Per-sample fits, two columns (parity: vihds/plotting.py:329-385)."""
    nplots = res.X_obs.shape[1]
    maxs = np.max(res.X_obs, axis=(0, 2))
    locs = np.where(res.devices == device_id)[0]
    locs = locs[np.argsort(res.ids[locs])]
    ntreatments = len(locs)
    nrows = int(np.ceil(ntreatments / 2.0))
    f = plt.figure(figsize=(12, 1.2 * nrows))
    for col in range(2):
        left = 0.1 + col * 0.5
        bottom = 0.4 / nrows
        width = 0.33 / nplots
        dx = 0.38 / nplots
        dy = (1 - bottom) / nrows
        height = 0.8 * dy
        for i in range(nrows):
            k = i + col * nrows
            if k >= ntreatments:
                continue
            loc = locs[k]
            treatment_str = gen_treatment_str(res.settings.conditions, res.treatments[loc])
            for idx, maxi in enumerate(maxs):
                pos = [left + idx * dx, bottom + (nrows - i - 1) * dy, width, height]
                panel = (nrows, (2 * nplots, col * nplots + (nrows - i - 1) * 2 * nplots + idx + 1))
                _individual_panel(
                    f, res, loc, idx, maxi, pos, _PANEL_COLORS[idx % 4], treatment_str, i == 0, panel
                )
        f.text(left - 0.35 * dx, 0.5, "Normalized output", ha="center", va="center", rotation=90, fontsize=FS)
        f.text(left + 2 * dx, 0, "Time (h)", ha="center", va="bottom", fontsize=FS)
    sns.despine()
    return f


def xval_individual_2treatments(res, device_id):
    """Per-sample fits with treatments split into the two input groups
    (parity: vihds/plotting.py:388-452)."""
    nplots = res.X_obs.shape[1]
    maxs = np.max(res.X_obs, axis=(0, 2))
    both_locs = []
    for col in range(2):
        all_locs = np.where((res.devices == device_id) & (res.treatments[:, col] > 0.0))[0]
        both_locs.append(all_locs[np.argsort(res.treatments[all_locs, col])])
    ntreatments = max(map(len, both_locs))
    f = plt.figure(figsize=(12, 1.5 * max(ntreatments, 1)))
    for col, locs in enumerate(both_locs):
        left = 0.1 + col * 0.5
        bottom = 0.4 / max(ntreatments, 1)
        width = 0.33 / nplots
        dx = 0.38 / nplots
        dy = (1 - bottom) / max(ntreatments, 1)
        height = 0.8 * dy
        for i, loc in enumerate(locs[:ntreatments]):
            treatment_str = gen_treatment_str(res.settings.conditions, res.treatments[loc], unit="nM")
            for idx, maxi in enumerate(maxs):
                pos = [left + idx * dx, bottom + (ntreatments - i - 1) * dy, width, height]
                panel = (
                    ntreatments,
                    (2 * nplots, col * nplots + (ntreatments - i - 1) * 2 * nplots + idx + 1),
                )
                _individual_panel(
                    f, res, loc, idx, maxi, pos, _PANEL_COLORS[idx % 4], treatment_str, i == 0, panel
                )
        f.text(left - 0.35 * dx, 0.5, "Normalized output", ha="center", va="center", rotation=90, fontsize=FS)
        f.text(left + 2 * dx, 0, "Time (h)", ha="center", va="bottom", fontsize=FS)
    sns.despine()
    return f


def combined_treatments(results, devices):
    """Model-data functional responses to the two inputs for MULTIPLE result
    sets side by side (offline analysis; parity: vihds/plotting.py:455-529).

    Each entry of ``results`` carries: devices, treatments, X_obs,
    importance_weights[L,K], PREDICT[L,S,K], STD[L,S,K], pretty_devices,
    label."""
    ndev = len(devices)
    nres = len(results)
    width = 0.2
    lefts = [0.05, 0.57]
    bottom = 0.3 / ndev
    dx = 0.23
    dy = (1 - bottom) / ndev
    height = 0.9 * dy
    c6_idx, c12_idx = 1, 0
    ids = [2, 3]
    colors = ["y", "c"]
    f, ax = plt.subplots(ndev, 2 * nres, sharex=True, figsize=(9, 2.2 * ndev + 0.5))
    for iu, device_id in enumerate(devices):
        row = ax[iu] if ndev > 1 else ax
        ytext = "Normalized fluorescence" if ndev > 1 else "Norm. fluorescence"
        row[0].set_ylabel(results[0].pretty_devices[iu], labelpad=25, fontweight="bold", fontsize=FS)
        for ir, res in enumerate(results):
            locs = np.where(res.devices == device_id)[0]
            OBS = np.transpose(res.X_obs[locs, -1, :], [1, 0])
            IW = res.importance_weights[locs]
            PREDICT = np.transpose(res.PREDICT[locs, :], [2, 0, 1])
            STD = np.transpose(res.STD[locs, :], [2, 0, 1])
            C6 = (np.exp(res.treatments[:, c6_idx]) - 1)[locs]
            C12 = (np.exp(res.treatments[:, c12_idx]) - 1)[locs]
            for j, color in zip(ids, colors):
                mu = np.sum(IW * PREDICT[j], 1)
                var = np.sum(IW * (PREDICT[j] ** 2 + STD[j] ** 2), 1) - mu ** 2
                std = np.sqrt(np.maximum(var, 0))
                for k, (sig_id, C) in enumerate(zip(ids, [C6, C12])):
                    ic = ir + k * nres
                    row[ic].errorbar(C, mu, yerr=std, fmt="o", mec="k", ms=5, lw=1, color=color)
                    row[ic].semilogx(C, OBS[sig_id], "x", ms=5, lw=1, color=color)
            if ir > 0:
                row[ir].set_yticklabels([])
                row[ir + nres].set_yticklabels([])
            for k in range(2):
                ic = ir + k * nres
                row[ic].set_position([lefts[k] + ir * dx, bottom + (ndev - iu - 1) * dy, width, height])
                row[ic].set_xticks(np.logspace(0, 4, 3))
                row[ic].set_ylim(-0.1, 1.1)
                row[ic].set_yticks([0.0, 0.5, 1.0])
                row[ic].tick_params(axis="both", which="major", labelsize=FS)
                if iu == 0:
                    row[ic].set_title(res.label, fontsize=FS)
    for k, xlabel in enumerate(["C$_6$ (nM)", "C$_{12}$ (nM)"]):
        f.add_subplot(
            1, 2, k + 1, frameon=False,
            position=[lefts[k], bottom, width + (nres - 1) * dx, height + (ndev - 1) * dy],
        )
        plt.tick_params(labelcolor="none", top=False, bottom=False, left=False, right=False)
        plt.xlabel(xlabel, fontsize=FS, labelpad=10)
        plt.ylabel(ytext, fontsize=FS, labelpad=8)
    sns.despine()
    return f


def _param_names_by_arity(res, want_local):
    """Split q parameter names into per-datapoint vs global, preserving order."""
    ndata = len(res.ids)
    qs = dict(zip(list(res.q_names), list(res.q_values)))
    seen, ordered = set(), []
    for n in res.q_names:
        base = n.split(".")[0]
        if base not in seen:
            seen.add(base)
            ordered.append(base)
    out = []
    for p in ordered:
        if p + ".mu" in qs:
            is_local = np.shape(qs[p + ".mu"])[0] == ndata
            if is_local == want_local:
                out.append(p)
    return out, qs


def xval_variable_parameters(res, ncols=2):
    """Per-datapoint posterior mu +- 1/prec error bars
    (parity: vihds/plotting.py:532-586)."""
    devices = np.unique(res.devices)
    ps, qs = _param_names_by_arity(res, want_local=True)
    if not ps:
        print("- No variable parameters: not producing plot")
        return None
    cdict = dict(zip(devices, sns.color_palette()))
    nrows = int(np.ceil(len(ps) / ncols))
    f, axs = plt.subplots(nrows, ncols, sharex=True, figsize=(6 * ncols, 2 * nrows))
    f.suptitle("Local parameters", fontsize=14)
    for i in range(nrows):
        for j in range(ncols):
            ax = _ax(axs, i, j, nrows)
            k = j + i * ncols
            if k < len(ps):
                name = ps[k]
                for di in devices:
                    locs = np.where(res.devices == di)
                    ax.errorbar(
                        res.ids[locs],
                        np.squeeze(qs["%s.mu" % name][locs]),
                        np.squeeze(1 / qs["%s.prec" % name][locs]),
                        fmt=".",
                        color=cdict[di],
                    )
                ax.set_title(name)
                if i == nrows - 1:
                    ax.set_xlabel("Data instance")
            else:
                ax.set_visible(False)
        _ax(axs, i, 0, nrows).set_ylabel("Parameter value")
    f.tight_layout(rect=(0, 0, 1, 0.97))
    sns.despine()
    return f


def xval_global_parameters(res, ncols=6):
    """Per-fold global posterior mu +- 1/prec error bars
    (parity: vihds/plotting.py:589-641)."""
    nfolds = len(res.chunk_sizes)
    ps, qs = _param_names_by_arity(res, want_local=False)
    if not ps:
        print("- No global parameters: not producing plot")
        return None
    n = len(ps)
    ncols = min(ncols, n)
    nrows = int(np.ceil(n / ncols))
    f, axs = plt.subplots(nrows, ncols, figsize=(2 * ncols, 2 * nrows))
    f.suptitle("Global parameters", fontsize=14)
    for i in range(nrows):
        for j in range(ncols):
            ax = _ax(axs, i, j, nrows) if ncols > 1 else (axs if nrows == 1 else axs[i])
            k = j + i * ncols
            if k < len(ps):
                name = ps[k]
                ax.errorbar(
                    np.linspace(1, nfolds, nfolds),
                    qs["%s.mu" % name],
                    1 / qs["%s.prec" % name],
                    fmt=".",
                )
                ax.set_title(name)
                ax.set_xlim([0.5, nfolds + 0.5])
                ax.set_xticks(range(1, nfolds + 1))
                if i == nrows - 1:
                    ax.set_xlabel("Fold")
            else:
                ax.set_visible(False)
        (_ax(axs, i, 0, nrows) if ncols > 1 else ax).set_ylabel("Parameter value")
    f.tight_layout(rect=(0, 0, 1, 0.96))
    sns.despine()
    return f
