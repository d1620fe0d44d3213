"""Configuration layer: YAML spec + CLI args -> settings object.

Capability parity with reference vihds/config.py (same YAML schema:
``data:`` / ``model:`` / ``params:`` with the five parameter tiers), minus all
torch device plumbing — device placement on TPU is handled by jax/XLA and the
mesh layer (vihds_tpu/parallel).
"""

import os
import re
import shutil
import datetime
from collections import OrderedDict

import numpy as np
import yaml

from vihds_tpu.utils.attrdict import AttrDict, attrdictify


def _tidy_args(args):
    """Clamp eval/plot epochs and fix the global seed
    (parity: vihds/config.py:18-37)."""
    if args.test_epoch > args.epochs:
        args.test_epoch = args.epochs
    if args.plot_epoch > args.epochs:
        args.plot_epoch = args.epochs
    if args.seed is not None:
        np.random.seed(args.seed)
    return args


#: Default hyper-parameters merged under YAML ``params:``
#: (parity: vihds/config.py:56-88).
DEFAULT_PARAMS = dict(
    solver="midpoint",
    adjoint_solver=False,
    use_laplace=False,
    n_filters=10,
    filter_size=10,
    pool_size=5,
    lambda_l2=0.001,
    lambda_l2_hidden=0.001,
    n_hidden=50,
    n_hidden_decoder=50,
    n_batch=36,
    data_format="channels_last",
    precision_type="constant",
    precision_alpha=1000.0,
    precision_beta=1.0,
    init_prec=0.00001,
    init_latent_species=0.001,
    transfer_func="tanh",
    n_hidden_decoder_precisions=20,
    n_growth_layers=4,
    tb_gradients=False,
    plot_histograms=False,
    learning_boundaries=[250, 500],
    learning_rate=0.01,
    learning_gamma=0.2,
    # Initialisation of the GLOBAL q-site precisions: "unit" starts log-prec
    # at 0 — the reference's Q_Global convention (verified empirically: every
    # reference q_global_defs.*.log_prec initialises to 0) — and is the
    # DEFAULT because it measurably finds better optima: on dr_constant_one
    # (1000 epochs, 9 seeds) best-val ELBO 566-746 (mean 667) vs 484-622
    # (mean 524) under "prior", and +9 nats mean on dr_constant_icml; a
    # wide-prior global init injects high-variance theta samples that keep
    # the local sites from tightening (BASELINE.md round-3 section,
    # reports/posterior_parity_ctrl_unit/).  "prior" starts q at the prior
    # precision (available for init-convention experiments; reports produced
    # before round 3 used it).
    q_global_init="unit",
)


def apply_defaults_params(config):
    defaults = attrdictify(dict(DEFAULT_PARAMS))
    for k in config:
        defaults[k] = config[k]
    return defaults


def depth(group_values):
    return len(set(g for g in group_values if g is not None))


def proc_data(data_settings):
    """Device-group bookkeeping: component maps, multi-hot depth, relevance
    vectors and device index maps (parity: vihds/config.py:95-121)."""
    groups_list = [[k, v] for k, v in data_settings.groups.items()]
    data_settings.component_maps = OrderedDict()
    for k, group in groups_list:
        data_settings.component_maps[k] = OrderedDict(zip(data_settings.devices, group))
    # Total number of group-level parameters
    data_settings.device_depth = sum(
        depth(cm.values()) for cm in data_settings.component_maps.values()
    )
    # Relevance vectors decode the multi-hot cassette back into per-group one-hots
    data_settings.relevance_vectors = OrderedDict()
    k1 = 0
    for k, group in groups_list:
        k2 = depth(group) + k1
        rv = np.zeros(data_settings.device_depth)
        rv[k1:k2] = 1.0
        if k in data_settings.default_devices:
            rv[k1 + data_settings.default_devices[k]] = 0.0
        data_settings.relevance_vectors[k] = rv.astype(np.float32)
        k1 = k2
    data_settings.device_map = dict(
        zip(data_settings.devices, (float(v) for v in range(len(data_settings.devices))))
    )
    data_settings.device_idx_to_device_name = dict(enumerate(data_settings.devices))
    data_settings.device_lookup = {v: k for k, v in data_settings.device_map.items()}
    return data_settings


def apply_defaults_data(config):
    """Data-section defaults (parity: vihds/config.py:124-140)."""
    ndevices = len(config["devices"])
    defaults = attrdictify(
        dict(
            groups={"default": [0] * ndevices},
            default_devices=dict(),
            normalize=None,
            merge=True,
            subtract_background=True,
            separate_conditions=False,
            dtype="float32",
        )
    )
    for k in config:
        defaults[k] = config[k]
    defaults.data_dir = get_data_directory()
    return proc_data(defaults)


class Config:
    """Settings = YAML spec (+ defaults) + CLI args
    (parity: vihds/config.py:143-179)."""

    def __init__(self, args):
        args = _tidy_args(args)
        if args.yaml is None:
            return
        if not os.path.exists(args.yaml):
            hint = ""
            specs = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "specs")
            candidate = os.path.join(specs, os.path.basename(args.yaml))
            if os.path.exists(candidate):
                hint = " (did you mean %s?)" % candidate
            raise SystemExit("Spec file not found: %s%s" % (args.yaml, hint))
        with open(args.yaml, "r") as stream:
            config = attrdictify(yaml.safe_load(stream))
        for section in ("data", "params"):
            if not isinstance(config.get(section), dict):
                # covers both a missing section and a bare 'params:' line
                # (YAML parses the empty value as None)
                raise SystemExit(
                    "Spec %s is missing its '%s:' section (or it is empty)"
                    % (args.yaml, section)
                )
        if "model" not in config:
            # The reference's debug.yaml family nests model: under params:
            # and then crashes (reference vihds/config.py:159); fail clearly.
            raise SystemExit(
                "Spec %s has no top-level 'model:' key%s"
                % (
                    args.yaml,
                    " (found one nested under params: — move it to the top level)"
                    if "model" in config.params
                    else "",
                )
            )
        self.data = apply_defaults_data(config.data)
        self.params = apply_defaults_params(config.params)
        if getattr(args, "precision_hidden_layers", None) is not None:
            self.params.n_hidden_decoder_precisions = args.precision_hidden_layers
        if getattr(args, "q_global_init", None) is not None:
            self.params.q_global_init = args.q_global_init
        if getattr(args, "grad_clip_norm", None) is not None:
            self.params.grad_clip_norm = args.grad_clip_norm
        self.model = config.model
        self.seed = args.seed if args.seed is not None else 0
        self.trainer = None

    @classmethod
    def from_yaml(cls, yaml_path, **kw):
        """Convenience constructor used by tests and library callers."""
        from vihds_tpu.run_xval import create_parser

        args = create_parser(True).parse_args([yaml_path])
        for k, v in kw.items():
            setattr(args, k, v)
        return cls(args)


def get_data_directory():
    """Directory holding the plate-reader CSVs. ``INFERENCE_DATA_DIR`` wins;
    otherwise use the repo-local ``data/`` (parity: vihds/config.py:182-188)."""
    data_dir = os.getenv("INFERENCE_DATA_DIR")
    if data_dir:
        return data_dir
    repo_data = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    if os.path.isdir(repo_data):
        return repo_data
    return "data"


def get_results_directory():
    results_dir = os.getenv("INFERENCE_RESULTS_DIR")
    if results_dir:
        return results_dir
    return "results"


class Trainer:
    """Results-directory bookkeeping (parity: vihds/config.py:203-227)."""

    def __init__(self, args, log_dir=None, add_timestamp=False):
        self.results_dir = get_results_directory()
        self.experiment = args.experiment
        self.yaml_file_name = args.yaml
        if log_dir is None:
            self.create_logging_dirs(add_timestamp)
        else:
            self.tb_log_dir = log_dir

    def _unique_dir_name(self, experiment, add_timestamp):
        now = datetime.datetime.now().isoformat()
        time_code = re.sub("[^A-Za-z0-9]+", "", now)
        if add_timestamp is True:
            experiment += "_" + time_code
        return os.path.join(self.results_dir, experiment)

    def create_logging_dirs(self, add_timestamp=False):
        self.tb_log_dir = self._unique_dir_name(self.experiment, add_timestamp)
        os.makedirs(self.tb_log_dir, exist_ok=True)
        shutil.copyfile(
            self.yaml_file_name,
            os.path.join(self.tb_log_dir, os.path.basename(self.yaml_file_name)),
        )
