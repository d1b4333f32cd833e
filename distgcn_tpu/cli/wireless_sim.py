"""Wireless scheduling simulation driver — re-designs `wireless_dqn_test.py`
(single channel), `wireless_dqn_test_mc.py` (multi-channel), and the
`_flood` fixed-load variants.

Usage (mirrors bash/test_wireless_gcn_dqn.sh / twc_major_wireless_mc_test.sh):
    python -m distgcn_tpu.cli.wireless_sim --test_datapath=data/wireless \
        --wt_sel=qr --load_min=0.1 --load_max=1.0 --load_step=0.1 \
        --num_channels=1 --opt=0 --instances=3 \
        --num_layer=1 --hidden1=32 --feature_size=1 --diver_num=1

Flood mode (fixed load 0.85, iterate instances): --flood=1
"""

from __future__ import annotations

import os
import time

import numpy as np
import scipy.io as sio
import scipy.sparse as sp

from distgcn_tpu.agents import DQNAgent
from distgcn_tpu.data.wireless import (flows_from_connectivity,
                                       multichannel_conflict_graph,
                                       multichannel_conflict_simulate,
                                       poisson_graphs_from_dict)
from distgcn_tpu.sim.wireless import (ResumableResults, SimParams,
                                      algolist_for_opt, run_instance)
from distgcn_tpu.utils.config import Config
from distgcn_tpu.utils.directory import find_model_folder


def main(argv=None, agent=None, max_networks: int = 20):
    cfg = Config.from_args(argv)
    import argparse
    extra = argparse.ArgumentParser()
    extra.add_argument("--model_root", default="./model")
    extra.add_argument("--flood", type=int, default=0)
    extra.add_argument("--benchmark", default="exact",
                       choices=["exact", "greedy"])
    ns, _ = extra.parse_known_args(argv)

    n_ch = cfg.num_channels
    params = SimParams(wt_sel=cfg.wt_sel, n_ch=n_ch, benchmark=ns.benchmark)
    algolist = algolist_for_opt(cfg.opt)

    if agent is None and any(a.startswith(("DGCN", "CGCN")) for a in algolist):
        agent = DQNAgent(cfg, model_family="gcn_dqn")
        model_origin = find_model_folder(cfg, "dqn", ns.model_root)
        if not agent.load(model_origin):
            print(f"Unable to load {model_origin} — using current params")

    out_csv = os.path.join(
        cfg.output,
        "metric_vs_load_summary_{}-channel_utility-{}_opt-{}_load-{:.1f}-{:.1f}{}.csv"
        .format(n_ch, cfg.wt_sel, cfg.opt, cfg.load_min, cfg.load_max,
                "_flood" if ns.flood else ""))
    results = ResumableResults(out_csv)

    files = sorted(f for f in os.listdir(cfg.test_datapath)
                   if f.endswith(".mat"))[:max_networks]
    if ns.flood:
        load_array = [0.85]
        inst_range = range(1, cfg.instances + 1)
    else:
        load_array = np.round(np.arange(cfg.load_min,
                                        cfg.load_max + cfg.load_step,
                                        cfg.load_step), 2).tolist()
        inst_range = [1]

    for fname in files:
        m = sio.loadmat(os.path.join(cfg.test_datapath, fname))
        gdict = m["gdict"][0, 0]
        seed = int(np.asarray(m["random_seed"]).flatten()[0])
        adj_c, xys, adj_i = poisson_graphs_from_dict(gdict)
        flows = flows_from_connectivity(adj_c)
        nflows = len(flows)
        if nflows == 0:
            continue
        if n_ch > 1:
            graphs = multichannel_conflict_simulate(
                adj_i.toarray(), n_ch, 0.8,
                np.random.default_rng(seed))
            adj_list, adj_gk = multichannel_conflict_graph(graphs)
            degs = [float(np.asarray(g.sum(1)).mean()) for g in graphs]
            avg_degree = float(np.mean(degs))
        else:
            adj_list, adj_gk = [adj_i], adj_i
            avg_degree = float(np.asarray(adj_i.sum(1)).mean())

        for load in load_array:
            for inst in inst_range:
                treeseed = inst if ns.flood else int(seed)
                key_load = load
                if results.done(seed, treeseed, key_load):
                    continue
                t0 = time.time()
                metrics = run_instance(adj_gk, nflows, load, treeseed,
                                       algolist, params, agent, adj_list)
                rows = []
                for algo, mvals in metrics.items():
                    row = {"graph": seed, "seed": treeseed, "load": load,
                           "name": algo, "avg_degree": avg_degree}
                    row.update(mvals)
                    rows.append(row)
                results.append(rows)
                lead = algolist[-1] if "Benchmark" not in algolist else \
                    [a for a in algolist if a != "Benchmark"][-1]
                print(f"net {seed} load {load} inst {inst}: "
                      f"q_mean[{lead}]={metrics[lead]['avg_queue_len']:.3f} "
                      f"u[{lead}]={metrics[lead]['avg_utility']:.3f} "
                      f"run={time.time()-t0:.2f}s")
    print("Done!")
    return results


if __name__ == "__main__":
    main()
