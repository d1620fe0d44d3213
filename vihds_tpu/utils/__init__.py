"""Small shared utilities (attr-dicts, logging counters, timers).

Capability parity with reference vihds/utils.py (minus torch)."""

from vihds_tpu.utils.attrdict import AttrDict, attrdictify  # noqa: F401


def default_get_value(dct, key, default_value, verbose=False):
    """Reference-parity helper (vihds/utils.py:42-47)."""
    if key in dct:
        return dct[key]
    if verbose:
        print("%s using default %s" % (key, str(default_value)))
    return default_value


class TrainingLogData:
    """Counters collected for logging during training
    (parity: vihds/utils.py:50-63)."""

    def __init__(self):
        self.training_elbo_list = []
        self.validation_elbo_list = []
        self.batch_feed_time = 0.0
        self.batch_train_time = 0.0
        self.total_train_time = 0.0
        self.total_test_time = 0.0
        self.n_test = 0
        self.max_val_elbo = -float("inf")


def variable_summaries(writer, epoch, var, name, plot_histograms=False):
    """TensorBoard scalar/histogram summaries for an array
    (parity: vihds/utils.py:30-39). ``var`` is a numpy array."""
    import numpy as np

    if writer is None:
        return
    var = np.asarray(var)
    mean = var.mean()
    writer.add_scalar(name + "/mean", mean, epoch)
    writer.add_scalar(name + "/stddev", float(np.sqrt(((var - mean) ** 2).mean())), epoch)
    writer.add_scalar(name + "/max", var.max(), epoch)
    writer.add_scalar(name + "/min", var.min(), epoch)
    if plot_histograms:
        writer.add_histogram(name + "/histogram", var, epoch)
