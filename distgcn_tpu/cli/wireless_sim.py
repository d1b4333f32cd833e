"""Wireless scheduling simulation driver — re-designs `wireless_dqn_test.py`
(single channel), `wireless_dqn_test_mc.py` (multi-channel), and the
`_flood` fixed-load variants.

Usage (mirrors bash/test_wireless_gcn_dqn.sh / twc_major_wireless_mc_test.sh):
    python -m distgcn_tpu.cli.wireless_sim --test_datapath=data/wireless \
        --wt_sel=qr --load_min=0.1 --load_max=1.0 --load_step=0.1 \
        --num_channels=1 --opt=0 --instances=3 \
        --num_layer=1 --hidden1=32 --feature_size=1 --diver_num=1

Flood mode (fixed load 0.85, iterate instances): --flood=1

Device-loop mode (--device_loop=1): the production fast path — every
network is packed into one padded batch and each load's whole episode
(arrivals, queues, utilities, GCN, LGS) runs as a single on-device scan
(`sim/device_sim`), ~3 orders of magnitude faster than the per-slot host
loop. Traffic is drawn from the device RNG, so per-slot streams are not
bit-identical to the host simulator's numpy streams (same distributions);
metrics carry the algo name 'DGCN-LGS-DL'.
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
    extra.add_argument("--device_loop", type=int, default=0)
    # per-slot online training (wireless_dqn_test.py:339-344): memorize every
    # scheduled slot, replay(199) + checkpoint after each (load, instance)
    extra.add_argument("--train", type=int, default=0)
    ns, _ = extra.parse_known_args(argv)

    n_ch = cfg.num_channels
    params = SimParams(wt_sel=cfg.wt_sel, n_ch=n_ch, benchmark=ns.benchmark)
    algolist = algolist_for_opt(cfg.opt)

    if ns.device_loop:
        return main_device_loop(cfg, ns, agent, max_networks)

    model_origin = find_model_folder(cfg, "dqn", ns.model_root)
    if agent is None and any(a.startswith(("DGCN", "CGCN")) for a in algolist):
        agent = DQNAgent(cfg, model_family="gcn_dqn")
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
                                       algolist, params, agent, adj_list,
                                       train=bool(ns.train))
                if ns.train and agent is not None:
                    loss = agent.replay(199)
                    if loss is not None and not np.isnan(loss):
                        agent.save(model_origin)
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


def main_device_loop(cfg, ns, agent=None, max_networks: int = 20):
    """All networks in one padded batch; one on-device scan per load."""
    import jax
    import jax.numpy as jnp
    from distgcn_tpu.core.graph import pad_bucket
    from distgcn_tpu.data.wireless import pad_product_graph
    from distgcn_tpu.sim.device_sim import (make_closed_loop,
                                            make_closed_loop_mc)

    n_ch = cfg.num_channels
    if agent is None:
        agent = DQNAgent(cfg, model_family="gcn_dqn")
        model_origin = find_model_folder(cfg, "dqn", ns.model_root)
        if not agent.load(model_origin):
            print(f"Unable to load {model_origin} — using current params")

    files = sorted(f for f in os.listdir(cfg.test_datapath)
                   if f.endswith(".mat"))[:max_networks]
    nets = []
    for fname in files:
        m = sio.loadmat(os.path.join(cfg.test_datapath, fname))
        gdict = m["gdict"][0, 0]
        seed = int(np.asarray(m["random_seed"]).flatten()[0])
        adj_c, xys, adj_i = poisson_graphs_from_dict(gdict)
        nflows = adj_i.shape[0]
        if nflows == 0:
            continue
        if n_ch > 1:
            graphs = multichannel_conflict_simulate(
                adj_i.toarray(), n_ch, 0.8, np.random.default_rng(seed))
            _, adj_gk = multichannel_conflict_graph(graphs)
            nets.append((seed, nflows, adj_gk))
        else:
            nets.append((seed, nflows, sp.csr_matrix(adj_i)))
    if not nets:
        print("No networks found")
        return None

    b = len(nets)
    nfp = pad_bucket(max(nf for _, nf, _ in nets))
    link_mask = np.zeros((b, nfp), bool)
    for i, (_, nf, _) in enumerate(nets):
        link_mask[i, :nf] = True
    if n_ch > 1:
        adj = np.stack([pad_product_graph(gk, nf, n_ch, nfp)
                        for _, nf, gk in nets])
    else:
        adj = np.zeros((b, nfp, nfp), np.float32)
        for i, (_, nf, a) in enumerate(nets):
            adj[i, :nf, :nf] = a.toarray()
    adj = jnp.asarray(adj)
    mask = jnp.asarray(link_mask)

    out_csv = os.path.join(
        cfg.output,
        "metric_vs_load_summary_{}-channel_utility-{}_deviceloop.csv"
        .format(n_ch, cfg.wt_sel))
    results = ResumableResults(out_csv)
    load_array = np.round(np.arange(cfg.load_min,
                                    cfg.load_max + cfg.load_step,
                                    cfg.load_step), 2).tolist()
    T = 200
    for load in load_array:
        if all(results.done(seed, seed, load) for seed, _, _ in nets):
            continue
        t0 = time.time()
        if n_ch > 1:
            run = make_closed_loop_mc(agent.model, cfg, timeslots=T,
                                      n_ch=n_ch, load=load,
                                      wt_sel=cfg.wt_sel,
                                      feature_mode=agent.feature_mode)
        else:
            run = make_closed_loop(agent.model, cfg, timeslots=T, load=load,
                                   wt_sel=cfg.wt_sel,
                                   feature_mode=agent.feature_mode,
                                   with_baseline=True)
        q0 = jnp.zeros((b, nfp))
        # TPU-native rbg bit generator: the inverse-CDF arrival sampler is
        # impl-agnostic, and threefry costs ~60 us/slot at production batch
        key = jax.random.key(int(load * 1000), impl="rbg")
        _, metrics = run(agent.params, adj, mask, q0, key)
        rows = []
        for i, (seed, nf, _) in enumerate(nets):
            if results.done(seed, seed, load):
                continue
            # column-semantics divergence (documented): the reference's
            # summary CSV stores the per-load tree seed here
            # (wireless_dqn_test.py treeseed=i); the device-loop rows
            # repeat the graph seed instead — resume keys include `load`,
            # so resumability is unaffected, but the column is not
            # byte-compatible with the reference format for these rows
            row = {"graph": seed, "seed": seed, "load": load,
                   "name": "DGCN-LGS-DL", "avg_degree": 0.0,
                   "avg_queue_len": float(metrics["avg_queue_len"][i]),
                   "med_queue_len": 0.0, "95p_queue_len": 0.0,
                   "5p_queue_len": 0.0,
                   "avg_utility": float(metrics.get(
                       "avg_utility_ratio", metrics["avg_utility"])[i])}
            rows.append(row)
        if rows:
            results.append(rows)
        print(f"load {load}: {b} nets x {T} slots in {time.time()-t0:.2f}s "
              f"({b * T / max(time.time()-t0, 1e-9):,.0f} decisions/s)")
    print("Done!")
    return results


if __name__ == "__main__":
    main()
