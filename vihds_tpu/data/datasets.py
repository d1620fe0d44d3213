"""Array dataset pipeline: preprocessing, multi-file merge, k-fold splits.

Capability parity with reference vihds/datasets.py, re-expressed as plain numpy
arrays (host-side); batches become jnp device arrays only at the jit boundary.
"""

import numpy as np

from vihds_tpu.data import procdata
from vihds_tpu.utils.attrdict import AttrDict


def onehot(i, n):
    v = np.zeros((n,))
    if i is not None:
        v[i] = 1
    return v


def depth(group_values):
    return len(set(g for g in group_values if g is not None))


def get_cassettes(devices, settings):
    """Multi-hot cassette encoding: one one-hot block per grouped parameter,
    concatenated (parity: vihds/datasets.py:26-45)."""
    rows = []
    for d in devices:
        device_name = settings.device_idx_to_device_name[d]
        vs = [
            onehot(cm[device_name], depth(cm.values()))
            for cm in settings.component_maps.values()
        ]
        rows.append(np.hstack(vs))
    dtype = {"float32": np.float32, "float64": np.float64}.get(settings.dtype)
    if dtype is None:
        raise ValueError("Unknown dtype %s" % settings.dtype)
    return np.array(rows).astype(dtype)


def scale_data(X, settings):
    """Per-signal max scaling, then per-series background subtraction
    (parity: vihds/datasets.py:48-61)."""
    n_outputs = np.shape(X)[1]
    if settings.normalize is None:
        scales = [np.max(X[:, i, :]).astype(np.float32) for i in range(n_outputs)]
    else:
        scales = settings.normalize
    for i, scale in enumerate(scales):
        X[:, i, :] /= scale
        if settings.subtract_background:
            mins = np.min(X[:, i, :], axis=1)[:, np.newaxis]
            X[:, i, :] -= mins
    return X, scales


def find_nearest(array, value):
    array = np.asarray(array)
    return (np.abs(array - value)).argmin()


def merge_observations(times_list, observations_list):
    """Snap every file onto the coarsest common time grid
    (parity: vihds/datasets.py:136-145)."""
    times_arr = list(times_list)
    obs_arr = list(observations_list)
    n_list = np.array([len(t) for t in times_arr])
    loc = int(np.argmin(n_list))
    chosen_times = times_arr[loc]
    for i, (t, obs) in enumerate(zip(times_arr, obs_arr)):
        locs = [find_nearest(t, ti) for ti in chosen_times]
        obs_arr[i] = obs[:, :, locs]
    return chosen_times, np.concatenate(obs_arr)


class TimeSeriesDataset:
    """All observations of one experiment, as host numpy arrays.

    Attributes after init: ``devices[L]``, ``dev_1hot[L,D]``, ``inputs[L,C]``
    (log1p-transformed), ``times[T]``, ``observations[L,S,T]`` (scaled),
    ``n_times``, ``n_species``, ``scales``.
    (parity: vihds/datasets.py:64-121, without torch.)
    """

    def __init__(self, data_settings, params):
        self.parser = procdata.load
        self.data_settings = data_settings
        self.params = params
        self.n_times = None
        self.n_species = None

    def _preprocess(self, devices, inputs, times, observations):
        self.devices = devices
        self.dev_1hot = get_cassettes(devices, self.data_settings)
        self.inputs = np.log(1.0 + inputs)
        self.times = times
        self.n_times = len(times)
        obs, self.scales = scale_data(observations, self.data_settings)
        self.observations = obs
        self.n_species = np.shape(observations)[1]

    def init_single(self, f):
        devices, inputs, times, observations = self.parser(f, self.data_settings)
        self._preprocess(devices, inputs, times, observations)

    def init_multiple_merge(self):
        # Files with no rows for the requested devices parse to None — skip
        # them (the reference crashes on this case, SURVEY.md §2.5 family).
        parsed = [self.parser(f, self.data_settings) for f in self.data_settings.files]
        parsed = [p for p in parsed if p is not None]
        if not parsed:
            raise ValueError("No data found for devices %s" % list(self.data_settings.devices))
        devices, inputs, times_list, observations_list = zip(*parsed)
        times, observations = merge_observations(times_list, observations_list)
        self._preprocess(np.concatenate(devices), np.concatenate(inputs), times, observations)

    def __len__(self):
        return len(self.devices)

    def select(self, idx):
        """Gather a batch dict for integer indices ``idx`` (numpy array)."""
        return AttrDict(
            devices=self.devices[idx],
            dev_1hot=self.dev_1hot[idx],
            inputs=self.inputs[idx],
            observations=self.observations[idx],
            times=self.times,
        )


class MultiTimeSeriesDataset:
    """Non-merged multi-file dataset (``data: merge: false``): every CSV keeps
    its NATIVE time grid.

    The reference declares this path but it is dead there (ConcatDataset
    batches would be ragged and its Encoder raises NotImplementedError,
    reference vihds/datasets.py:188-196, vihds/encoders.py:362-365).  The
    TPU-first semantics implemented here:

      * per-signal scaling uses the max over ALL files — the same
        normalisation a merged load would compute;
      * the encoder consumes every series snapped onto the SHORTEST grid by
        nearest-time subsampling (the rule merge uses, and the reference's
        declared intent: "use the time vector with the fewest time-points
        for the encoder") so the amortised q sees ONE static input shape;
      * the ODE + likelihood run on each file's native grid — nothing about
        the generative side is lossy, which is the point of merge: false;
      * training/eval group batches by file: static shapes per file, one
        compiled program per distinct grid (SURVEY §7 hard part #5), and
        report-facing arrays (``select``/xval artifacts) are snapped onto
        the shortest grid so the artifact contract stays rectangular.
    """

    def __init__(self, data_settings, params):
        self.data_settings = data_settings
        self.params = params

    def init_multiple(self):
        import copy

        parsed = [procdata.load(f, self.data_settings) for f in self.data_settings.files]
        parsed = [p for p in parsed if p is not None]
        if not parsed:
            raise ValueError("No data found for devices %s" % list(self.data_settings.devices))
        n_signals = parsed[0][3].shape[1]
        if self.data_settings.normalize is None:
            scales = [
                float(max(np.max(obs[:, i, :]) for _, _, _, obs in parsed))
                for i in range(n_signals)
            ]
        else:
            scales = self.data_settings.normalize
        shared = copy.copy(self.data_settings)
        shared.normalize = scales

        self.files = []
        for devices, inputs, times, observations in parsed:
            ds = TimeSeriesDataset(shared, self.params)
            ds._preprocess(devices, inputs, times, observations)
            self.files.append(ds)
        self.scales = scales
        self.n_species = self.files[0].n_species

        # encoder/report grid = the shortest native grid; per-file
        # nearest-time snap indices onto it
        enc_file = int(np.argmin([f.n_times for f in self.files]))
        self.times = self.files[enc_file].times
        self.n_times = len(self.times)
        self.enc_idx = [
            np.array([find_nearest(f.times, t) for t in self.times]) for f in self.files
        ]

        counts = [len(f) for f in self.files]
        self.file_of = np.concatenate([np.full(c, i, int) for i, c in enumerate(counts)])
        self.local_of = np.concatenate([np.arange(c) for c in counts])
        self.devices = np.concatenate([f.devices for f in self.files])

    def __len__(self):
        return len(self.file_of)

    def group_by_file(self, global_ids):
        """[(file_idx, local row ids, positions within ``global_ids``)] for
        the files represented in ``global_ids`` — the per-file static-shape
        work units for training and evaluation."""
        global_ids = np.asarray(global_ids)
        groups = []
        for i in range(len(self.files)):
            positions = np.flatnonzero(self.file_of[global_ids] == i)
            if len(positions):
                groups.append((i, self.local_of[global_ids[positions]], positions))
        return groups

    def file_batch(self, file_idx, local_ids):
        """Native-grid batch for one file, plus the encoder's snapped view."""
        ds = self.files[file_idx]
        batch = ds.select(np.asarray(local_ids))
        batch["enc_observations"] = batch.observations[:, :, self.enc_idx[file_idx]]
        return batch

    def select(self, idx):
        """Report view: batch on the shortest grid (rectangular across files)."""
        idx = np.asarray(idx)
        obs = np.empty((len(idx), self.n_species, self.n_times), np.float32)
        for i, local_ids, positions in self.group_by_file(idx):
            ds = self.files[i]
            obs[positions] = ds.observations[local_ids][:, :, self.enc_idx[i]]
        return AttrDict(
            devices=self.devices[idx],
            dev_1hot=np.concatenate([f.dev_1hot for f in self.files])[idx],
            inputs=np.concatenate([f.inputs for f in self.files])[idx],
            observations=obs,
            times=self.times,
        )


class Subset:
    """A view of a dataset restricted to ``indices``."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def batch(self):
        return self.dataset.select(self.indices)


class TimeSeriesDatasetPair:
    """Train/validation subsets plus shared shape info
    (parity: vihds/datasets.py:148-171)."""

    def __init__(self, train_subset, test_subset, data_settings):
        self.train = train_subset
        self.test = test_subset
        self.n_train = len(train_subset)
        self.n_test = len(test_subset)
        self.depth = data_settings.device_depth
        self.n_conditions = len(data_settings.conditions)


def build_datasets(args, config):
    """Load + merge CSVs, then make the k-fold train/val split for
    ``args.split`` of ``args.folds`` (parity: vihds/datasets.py:173-224)."""
    data_settings = config.data
    if data_settings.merge:
        dataset = TimeSeriesDataset(data_settings, config.params)
        dataset.init_multiple_merge()
    else:
        dataset = MultiTimeSeriesDataset(data_settings, config.params)
        dataset.init_multiple()

    # args.seed defaults to None on the CLI ("use 0"); seeding with None would
    # draw a fresh OS-entropy permutation per fold, so the k folds would no
    # longer partition the dataset.  Pin the concrete default here.
    np.random.seed(args.seed if args.seed is not None else 0)
    if getattr(args, "heldout", None):
        # Hold out one named device as the validation set — a declared but
        # unimplemented capability of the reference (vihds/datasets.py:200-206).
        all_ids = np.arange(len(dataset), dtype=int)
        held_idx = data_settings.device_map.get(args.heldout)
        if held_idx is None:
            raise ValueError("Unknown heldout device %s" % args.heldout)
        val_ids = all_ids[dataset.devices == int(held_idx)]
        train_ids = np.setdiff1d(all_ids, val_ids)
        if len(val_ids) == 0:
            raise ValueError("Heldout device %s has no data" % args.heldout)
    else:
        indices = np.random.permutation(len(dataset))
        val_chunks = np.array_split(indices, args.folds)
        assert len(val_chunks) == args.folds, "Bad chunks"
        all_ids = np.arange(len(dataset), dtype=int)
        val_ids = np.sort(val_chunks[args.split - 1])
        train_ids = np.setdiff1d(all_ids, val_ids)

    train = Subset(dataset, train_ids)
    val = Subset(dataset, val_ids)
    return TimeSeriesDatasetPair(train, val, data_settings)
