"""Cross-validation merge: accumulate per-fold results, save the xval artifact
set, render report figures.

Artifact-contract parity with reference vihds/xval.py (same ``xval_*.npy`` /
``.txt`` names and contents) — this is also the inter-node data contract for
the inference graph (reference vihds/run_inference_graph.py:42-49).
"""

import os

import numpy as np


def fold_object_array(items):
    """A (n_folds,)-shaped object array with one fold payload per element.

    ``np.asarray(list, dtype=object)`` is NOT this: when every fold has the
    same shape it broadcasts into a fully-boxed object ndarray (one PyObject
    per float — GBs at test_samples=1000), instead of one object per fold.
    """
    arr = np.empty(len(items), dtype=object)
    for i, x in enumerate(items):
        arr[i] = x
    return arr


class XvalMerge:
    def __init__(self, args, settings):
        self.epoch = args.epochs
        self.elbo = []
        self.elbo_list = []
        self.q_names = []
        self.q_values = []
        self.splits = []
        self.theta = []
        self.iw_predict_mu = []
        self.iw_predict_std = []
        self.iw_states = []
        self.data_ids = []
        self.devices = []
        self.treatments = []
        self.X_obs = []
        self.chunk_sizes = None
        self.ids = None
        self.species_names = None
        self.times = None
        self.xval_writer = None
        self.settings = settings.data
        self.trainer = settings.trainer

    def add(self, split_idx, data_pair, val_results):
        """(parity: vihds/xval.py:41-63)"""
        if self.species_names is None:
            # capture on the FIRST SUCCESSFUL fold, not fold 1 — a fold-1 NaN
            # abort (add never called for it) must not leave these None
            self.q_names = val_results.q_names
            self.species_names = val_results.species_names
            self.times = data_pair.train.dataset.times
        # fail loudly on cross-experiment contamination of fold results
        n_times = len(data_pair.train.dataset.times)
        got = np.shape(val_results.iw_predict_mu)
        if got[-1] != n_times or got[0] != data_pair.n_test:
            raise ValueError(
                "fold %d results have shape %s but the dataset is [%d test x T=%d] — "
                "stale best-val cache?" % (split_idx, got, data_pair.n_test, n_times)
            )
        self.elbo.append(val_results.elbo)
        self.elbo_list.append(val_results.elbo_list)
        self.q_values.append(val_results.q_values)
        self.splits.append(split_idx)
        self.theta.append(val_results.theta)
        self.iw_predict_mu.append(val_results.iw_predict_mu)
        self.iw_predict_std.append(val_results.iw_predict_std)
        self.iw_states.append(val_results.iw_states)

        self.data_ids.append(data_pair.test.indices)
        dataset = data_pair.test.batch()
        self.devices.append(dataset["devices"])
        self.treatments.append(np.asarray(dataset["inputs"]))
        self.X_obs.append(np.asarray(dataset["observations"]))

    def finalize(self):
        """(parity: vihds/xval.py:65-85)"""
        print("Preparing cross-validation results")
        self.elbo = np.array(self.elbo)
        # folds that hit the NaN abort have shorter ELBO trajectories;
        # object dtype keeps the merge ragged-safe (the reference's
        # np.array(...) crashes on this case, vihds/xval.py:68)
        self.elbo_list = fold_object_array(self.elbo_list)
        self.q_values = [
            np.concatenate([np.array(q[i], ndmin=1) for q in self.q_values])
            for i, _ in enumerate(self.q_names)
        ]
        self.iw_predict_mu = np.concatenate(self.iw_predict_mu, 0)
        self.iw_predict_std = np.concatenate(self.iw_predict_std, 0)
        self.iw_states = np.concatenate(self.iw_states, 0)
        self.devices = np.concatenate(self.devices, 0)
        self.treatments = np.concatenate(self.treatments, 0)
        self.X_obs = np.concatenate(self.X_obs, 0)
        self.chunk_sizes = np.array([len(ids) for ids in self.data_ids], dtype=object)
        self.ids = np.hstack(self.data_ids)

    def save(self):
        """(parity: vihds/xval.py:95-130; same artifact names)"""
        location = self.trainer.tb_log_dir
        print("Saving results to %s" % location)

        def save(base, data):
            np.save(os.path.join(location, base + ".npy"), fold_object_array(data)
                    if isinstance(data, list) else data)

        def savetxt(base, data):
            np.savetxt(
                os.path.join(location, base + ".txt"),
                np.array(data, dtype=str),
                delimiter=" ",
                fmt="%s",
            )

        save("xval_elbo", self.elbo)
        save("xval_elbo_list", self.elbo_list)
        savetxt("xval_q_names", self.q_names)
        save("xval_q_values", self.q_values)
        save("xval_theta", fold_object_array(self.theta))
        save("xval_iw_predict_mu", self.iw_predict_mu)
        save("xval_iw_predict_std", self.iw_predict_std)
        save("xval_iw_states", self.iw_states)
        savetxt("xval_device_names", self.settings.devices)
        save("xval_devices", self.devices)
        save("xval_treatments", self.treatments)
        save("xval_X_obs", self.X_obs)
        save("xval_chunk_sizes", self.chunk_sizes)
        save("xval_ids", self.ids)
        savetxt("xval_names", self.species_names)
        save("xval_times", self.times)

    def load(self, location=None):
        """(parity: vihds/xval.py:132-164)"""
        if location is None:
            location = self.trainer.tb_log_dir
        print("Loading results from %s" % location)

        def load(base):
            return np.load(os.path.join(location, base + ".npy"), allow_pickle=True)

        def loadtxt(base):
            return np.loadtxt(os.path.join(location, base + ".txt"), dtype=str, delimiter=" ")

        self.elbo = load("xval_elbo")
        self.elbo_list = load("xval_elbo_list")
        self.q_names = loadtxt("xval_q_names")
        self.q_values = load("xval_q_values")
        self.theta = load("xval_theta")
        self.iw_predict_mu = load("xval_iw_predict_mu")
        self.iw_predict_std = load("xval_iw_predict_std")
        self.iw_states = load("xval_iw_states")
        self.devices = load("xval_devices")
        self.treatments = load("xval_treatments")
        self.X_obs = load("xval_X_obs")
        self.chunk_sizes = load("xval_chunk_sizes")
        self.ids = load("xval_ids")
        self.species_names = loadtxt("xval_names")
        self.times = load("xval_times")

    def make_writer(self, location=None):
        from torch.utils.tensorboard import SummaryWriter

        if location is None:
            location = self.trainer.tb_log_dir
        self.xval_writer = SummaryWriter(os.path.join(location, "xval"))

    def close_writer(self):
        self.xval_writer.close()

    def save_figs(self, f, tag):
        f.savefig(os.path.join(self.trainer.tb_log_dir, "%s.png" % tag), bbox_inches="tight")
        f.savefig(os.path.join(self.trainer.tb_log_dir, "%s.pdf" % tag), bbox_inches="tight")

    def mark_completed(self, node_name):
        """Write the resume marker (parity: vihds/xval.py:179-184)."""
        location = self.trainer.tb_log_dir
        with open(os.path.join(location, "completed.txt"), "w") as f:
            f.write(node_name)

    def make_images(self):
        """Render the six xval figure families (parity: vihds/xval.py:186-253)."""
        from vihds_tpu import plotting

        device_ids = list(range(len(self.settings.devices)))

        print("Making summary figure")
        f_summary = plotting.plot_prediction_summary(
            self.settings.devices,
            self.species_names,
            self.times,
            self.X_obs,
            self.iw_predict_mu,
            self.iw_predict_std,
            self.devices,
            "-",
        )
        self.save_figs(f_summary, "xval_fit")
        self.xval_writer.add_figure("Summary", f_summary, self.epoch)
        self.xval_writer.flush()

        if self.settings.separate_conditions is True:
            print("Making treatment figure")
            f_treatments = plotting.xval_treatments(self, device_ids)
            self.save_figs(f_treatments, "xval_treatments")
            self.xval_writer.add_figure("Treatment", f_treatments, self.epoch)
            self.xval_writer.flush()

        print("Making species figure")
        f_species = plotting.species_summary(
            self.species_names,
            self.treatments,
            self.devices,
            self.times,
            self.iw_states,
            device_ids,
            self.settings,
        )
        self.save_figs(f_species, "xval_species")
        self.xval_writer.add_figure("Species", f_species, self.epoch)
        self.xval_writer.flush()

        print("Making global parameters figure")
        f_gparas = plotting.xval_global_parameters(self)
        if f_gparas is not None:
            self.save_figs(f_gparas, "xval_global_parameters")
            self.xval_writer.add_figure("Parameters/Globals", f_gparas, self.epoch)
            self.xval_writer.flush()

        print("Making variable parameters figure")
        f_vparas = plotting.xval_variable_parameters(self)
        if f_vparas is not None:
            self.save_figs(f_vparas, "xval_variable_parameters")
            self.xval_writer.add_figure("Parameters/Variable", f_vparas, self.epoch)
            self.xval_writer.flush()

        print("Making summary device figures")
        for u in device_ids:
            device = self.settings.devices[u]
            f_summary_i = plotting.xval_fit_summary(
                self, u, separatedInputs=self.settings.separate_conditions
            )
            self.save_figs(f_summary_i, "xval_summary_%s" % device)
            self.xval_writer.add_figure("Device_Summary/" + device, f_summary_i, self.epoch)
        self.xval_writer.flush()

        print("Making individual device figures")
        for u in device_ids:
            device = self.settings.devices[u]
            if self.settings.separate_conditions is True:
                f_indiv_i = plotting.xval_individual_2treatments(self, u)
            else:
                f_indiv_i = plotting.xval_individual(self, u)
            self.save_figs(f_indiv_i, "xval_individual_%s" % device)
            self.xval_writer.add_figure("Device_Individual/" + device, f_indiv_i, self.epoch)
        self.xval_writer.flush()
