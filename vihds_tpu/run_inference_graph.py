"""Execute an inference-graph DAG with posterior->prior propagation.

Parity: reference vihds/run_inference_graph.py — per-node resume via
``completed.txt``, upstream posterior (mean mu, pooled precision) overwrites
the downstream prior as a LogNormal.  Same-stage nodes are independent; with
``--jobs N`` they run concurrently in worker processes (the reference declares
stage parallelism but executes serially — vihds/run_inference_graph.py:92-126).
"""

import argparse
import os

import numpy as np

from vihds_tpu import config as cfg
from vihds_tpu import inference_graph as ig
from vihds_tpu.call_run_xval import execute as call_run_xval_execute
from vihds_tpu.config import Config, Trainer
from vihds_tpu.utils.attrdict import attrdictify


def create_parser():
    parser = argparse.ArgumentParser(description="VI-HDS-TPU inference graph")
    parser.add_argument("yaml", type=str, help="Name of yaml spec file for the inference graph")
    parser.add_argument(
        "--graph",
        type=str,
        default="unnamed",
        help="Name for the inference graph; results root for all nodes",
    )
    parser.add_argument(
        "--jobs",
        type=int,
        default=1,
        help="Run up to N same-stage nodes concurrently (process pool)",
    )
    return parser


def pooled_prec(xarr):
    """Harmonic pooling of per-fold precisions
    (parity: vihds/run_inference_graph.py:28-33)."""
    return len(xarr) / sum(1.0 / x for x in xarr)


def propagate_params(node, settings, resultmap):
    """Upstream xval_q_values -> downstream prior (LogNormal with mean mu and
    pooled precision as the sigma field — mirroring the reference's contract
    at vihds/run_inference_graph.py:36-67)."""
    for incoming in node.incoming:
        print(
            "Incoming node for %s is %s with parameter %s"
            % (node.name, incoming.source.name, incoming.sourceParam)
        )
        inresultfp = resultmap[incoming.source.name]
        xval = np.load(os.path.join(inresultfp, "xval_q_values.npy"), allow_pickle=True)
        with open(os.path.join(inresultfp, "xval_q_names.txt")) as f:
            xlabels = [line.rstrip() for line in f]
        if incoming.sourceParam + ".mu" not in xlabels:
            # e.g. the shipped graph propagates dr.aR -> relay.aR, but aR is a
            # device-conditioner output in dr_constant_precisions, not a q
            # site — the reference would crash here (run_inference_graph.py:48)
            print(
                "WARNING: %s has no posterior for %r; skipping edge to %s.%s"
                % (incoming.source.name, incoming.sourceParam, node.name, incoming.targetParam)
            )
            continue
        avgmu = float(np.mean(xval[xlabels.index(incoming.sourceParam + ".mu")]))
        prec = float(pooled_prec(xval[xlabels.index(incoming.sourceParam + ".prec")]))
        # The reference writes the pooled PRECISION into the 'sigma' field
        # (vihds/run_inference_graph.py:63-67) — a units bug that inflates the
        # downstream prior's sigma by prec^(3/2) and blows up training
        # (observed: every relay/degrader fold NaN'ing under such priors).
        # Convert properly: sigma = 1/sqrt(pooled precision).
        sigma = 1.0 / np.sqrt(prec)
        for key in ("global", "local", "shared"):
            if key in settings.params and incoming.targetParam in settings.params[key]:
                print(
                    "Target parameter for %s is %s (%s tier): LogNormal(mu=%.3f, sigma=%.3f)"
                    % (node.name, incoming.targetParam, key, avgmu, sigma)
                )
                settings.params[key][incoming.targetParam] = attrdictify(
                    {"distribution": "LogNormal", "mu": avgmu, "sigma": sigma}
                )


def save_propagated_parameters(params, folder):
    with open(os.path.join(folder, "propagatedParams.txt"), "w") as f:
        f.write(str(params))


def _find_completed(rootpath, node):
    """Resume check: a subfolder with a matching completed.txt skips the node
    (parity: vihds/run_inference_graph.py:98-108)."""
    if not os.path.isdir(rootpath):
        return None
    for subfolder in os.listdir(rootpath):
        if not subfolder.startswith(node.name):
            continue
        sbpath = os.path.join(rootpath, subfolder)
        completedpath = os.path.join(sbpath, "completed.txt")
        if os.path.isdir(sbpath) and os.path.exists(completedpath):
            with open(completedpath) as f:
                if f.read() == node.args.experiment:
                    return sbpath
    return None


def _run_node(node, resultmap):
    from vihds_tpu.profiling import enable_compile_cache

    enable_compile_cache()  # idempotent; covers spawn-start worker processes
    settings = Config(node.args)
    settings.trainer = Trainer(node.args, add_timestamp=True)
    propagate_params(node, settings, resultmap)
    save_propagated_parameters(settings.params, settings.trainer.tb_log_dir)
    call_run_xval_execute(node.args, settings)
    return node.name, settings.trainer.tb_log_dir


def run_graph(graph_name, staged_nodes, jobs=1):
    rootpath = os.path.join(cfg.get_results_directory(), graph_name)
    os.makedirs(rootpath, exist_ok=True)
    resultmap = {}

    for stage in sorted(staged_nodes):
        nodes = staged_nodes[stage]
        print("--- stage %d: %d node(s) ---" % (stage, len(nodes)))
        pending = []
        for node in nodes:
            done = _find_completed(rootpath, node)
            if done is not None:
                print("Node %s already completed." % node.name)
                resultmap[node.name] = done
            else:
                pending.append(node)
        if not pending:
            continue
        if jobs > 1 and len(pending) > 1:
            # Same-stage nodes are independent by construction; run them in
            # worker processes (each gets its own jit caches / devices).
            from concurrent.futures import ProcessPoolExecutor

            with ProcessPoolExecutor(max_workers=jobs) as ex:
                for name, path in ex.map(_run_node, pending, [resultmap] * len(pending)):
                    resultmap[name] = path
        else:
            for node in pending:
                print("Running node %s" % node.name)
                name, path = _run_node(node, resultmap)
                resultmap[name] = path


def main(argv=None):
    from vihds_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    args = create_parser().parse_args(argv)
    graph_map = ig.create_inference_graph(args.yaml, args.graph)
    staged_nodes = ig.arrange_by_stage(graph_map.values())
    run_graph(args.graph, staged_nodes, jobs=args.jobs)


if __name__ == "__main__":
    main()
