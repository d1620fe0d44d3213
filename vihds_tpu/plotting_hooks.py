"""Hooks from the training loop into the plotting suite.

Kept separate so the hot path never imports matplotlib unless figures are
actually requested (parity with the plot hooks at reference
vihds/training.py:212-265).
"""


def weighted_theta_plot(training, valid_writer, epoch, train_merged, sample=True):
    """Importance-weighted theta pairplot at eval time.  The reference has
    this figure but its training hook references a nonexistent attribute and
    never runs (reference vihds/training.py:252-265); wired up for real here —
    active when the spec sets ``params.theta_columns``."""
    import math

    import numpy as np

    from vihds_tpu import plotting

    columns = getattr(training.settings.params, "theta_columns", None)
    if not columns or valid_writer is None:
        return

    def normed(merged):
        lse = merged.per_item_elbo + math.log(merged.log_w.shape[1])
        w = np.exp(merged.log_w - lse[:, None])
        return w / w.sum(axis=1, keepdims=True)

    fig = plotting.plot_weighted_theta(
        training.program.names,
        normed(train_merged),
        train_merged.theta,
        training.train_data.devices,
        columns=columns,
        sample=sample,
    )
    name = "Theta/Theta-Resample" if sample else "Theta/Theta-Uniform"
    valid_writer.add_figure(name, fig, global_step=epoch)
    valid_writer.flush()


def eval_plots(training, writer, epoch, dataset, output, dynamic=False):
    """Prediction-summary (and, for dynamic precisions, variance) figures
    embedded into TensorBoard."""
    from vihds_tpu import plotting

    fig = plotting.plot_prediction_summary(
        training.settings.data.devices,
        output.species_names,
        dataset.times,
        dataset.observations,
        output.iw_predict_mu,
        output.iw_predict_std,
        dataset.devices,
        "-",
    )
    writer.add_figure("Summary", fig, global_step=epoch)
    if dynamic:
        devices = list(range(len(training.settings.data.devices)))
        fig = plotting.species_summary(
            training.settings.data.signals,
            dataset.inputs,
            dataset.devices,
            dataset.times,
            output.iw_variance,
            devices,
            training.settings.data,
            normalise=False,
        )
        writer.add_figure("Precisions", fig, global_step=epoch)
    writer.flush()
