"""Hooks from the training loop into the plotting suite.

Kept separate so the hot path never imports matplotlib unless figures are
actually requested (parity with the plot hooks at reference
vihds/training.py:212-265).
"""


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
