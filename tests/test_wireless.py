"""Wireless graph utilities + simulator tests."""

import numpy as np
import pytest
import scipy.sparse as sp

from distgcn_tpu.data import generate, wireless
from distgcn_tpu.sim.wireless import (SimParams, algolist_for_opt,
                                      gen_arrivals, gen_link_rates,
                                      run_instance, slot_weights)


@pytest.fixture
def gdict(tmp_path, rng):
    n = generate.generate_wireless_network(str(tmp_path), n_networks=1,
                                           area=100, n_nodes=40,
                                           r_connect=2.0, r_interfere=4.0,
                                           seed=7)
    assert n == 1
    import scipy.io as sio
    import os
    f = sorted(os.listdir(tmp_path))[0]
    m = sio.loadmat(str(tmp_path / f))
    return m["gdict"][0, 0]


def test_poisson_graphs_from_dict(gdict):
    adj_c, xys, adj_i = wireless.poisson_graphs_from_dict(gdict)
    assert adj_c.shape[0] == xys.shape[0]
    flows = wireless.flows_from_connectivity(adj_c)
    assert adj_i.shape == (len(flows), len(flows))
    # conflict graph symmetric, zero diagonal
    assert (adj_i != adj_i.T).nnz == 0
    assert adj_i.diagonal().sum() == 0


def test_multichannel_conflict_graph(gdict, rng):
    adj_c, graphs = wireless.poisson_multigraphs_from_dict(
        gdict, k=3, p=0.8, rng=rng)
    adj_list, adj_gk = wireless.multichannel_conflict_graph(graphs)
    nn = graphs[0].shape[0]
    assert adj_gk.shape == (3 * nn, 3 * nn)
    # single-radio cliques: node (i, k1) conflicts with (i, k2)
    for i in range(min(nn, 5)):
        assert adj_gk[i, nn + i] == 1
        assert adj_gk[nn + i, 2 * nn + i] == 1
    # channel-local edges present
    iu, ju = sp.triu(graphs[1], k=1).nonzero()
    if iu.size:
        assert adj_gk[nn + iu[0], nn + ju[0]] == 1


def test_arrival_and_rate_streams_deterministic():
    np.random.seed(3)
    a1 = gen_arrivals(10, 50, 0.5, 0, 100)
    r1 = gen_link_rates(10, 50, 2, 0, 100)
    np.random.seed(3)
    a2 = gen_arrivals(10, 50, 0.5, 0, 100)
    r2 = gen_link_rates(10, 50, 2, 0, 100)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(r1, r2)
    assert (r1 >= 0).all() and (r1 <= 100).all()
    assert a1.shape == (50, 10)


def test_slot_weights_modes():
    q = np.array([2.0, 0.0, 5.0])
    r = np.array([[10], [20], [0]])
    assert np.allclose(slot_weights(q, r, "qr")[:, 0], [20, 0, 0])
    assert np.allclose(slot_weights(q, r, "q")[:, 0], [2, 0, 5])
    assert np.allclose(slot_weights(q, r, "qrm")[:, 0], [2, 0, 0])
    qor = slot_weights(q, r, "qor")[:, 0]
    assert np.allclose(qor, [0.2, 0.0, 0.0])


def test_run_instance_greedy_only(gdict):
    _, _, adj_i = wireless.poisson_graphs_from_dict(gdict)
    nflows = adj_i.shape[0]
    if nflows == 0:
        pytest.skip("degenerate instance")
    params = SimParams(timeslots=20, benchmark="greedy")
    metrics = run_instance(adj_i, nflows, 0.5, 1, ["Greedy"], params)
    m = metrics["Greedy"]
    assert m["avg_queue_len"] >= 0
    assert 0 < m["avg_utility"] <= 1.0 + 1e-9


def test_algolist_for_opt():
    assert algolist_for_opt(0) == ["Greedy", "DGCN-LGS", "Benchmark"]
    assert algolist_for_opt(2) == ["DGCN-RS"]
    assert algolist_for_opt(7) == ["LGS-Seq"]
    with pytest.raises(ValueError):
        algolist_for_opt(42)


def test_run_instance_with_agent(gdict):
    from distgcn_tpu.agents import DQNAgent
    from distgcn_tpu.utils.config import Config
    _, _, adj_i = wireless.poisson_graphs_from_dict(gdict)
    nflows = adj_i.shape[0]
    if nflows == 0:
        pytest.skip("degenerate instance")
    cfg = Config(feature_size=1, hidden1=8, num_layer=1, diver_num=1,
                 max_degree=1, predict="mwis", epsilon=0.0, pad_to=64)
    agent = DQNAgent(cfg, model_family="gcn_dqn")
    params = SimParams(timeslots=10, benchmark="greedy")
    metrics = run_instance(adj_i, nflows, 0.4, 2,
                           ["Greedy", "DGCN-LGS"], params, agent=agent)
    assert set(metrics) == {"Greedy", "DGCN-LGS"}
    for m in metrics.values():
        assert np.isfinite(m["avg_queue_len"])


def test_run_instance_multichannel_seq(gdict, rng):
    """3-channel product graph with the sequential LGS-Seq algorithm
    (wireless_dqn_test_mc.py:292-312)."""
    adj_c, graphs = wireless.poisson_multigraphs_from_dict(
        gdict, k=3, p=0.8, rng=rng)
    adj_list, adj_gk = wireless.multichannel_conflict_graph(graphs)
    nflows = graphs[0].shape[0]
    if nflows == 0:
        pytest.skip("degenerate instance")
    params = SimParams(timeslots=10, n_ch=3, wt_sel="qr", benchmark="greedy")
    metrics = run_instance(adj_gk, nflows, 0.4, 3, ["LGS-Seq", "Greedy"],
                           params, adj_list=adj_list)
    for algo, m in metrics.items():
        assert np.isfinite(m["avg_queue_len"]), algo
    # scheduling across 3 channels must drain at least as fast as 1 channel
    p1 = SimParams(timeslots=10, n_ch=1, wt_sel="qr", benchmark="greedy")
    m1 = run_instance(graphs[0], nflows, 0.4, 3, ["Greedy"], p1)
    assert metrics["Greedy"]["avg_queue_len"] <= \
        m1["Greedy"]["avg_queue_len"] + 1e-6


def test_cli_device_loop(tmp_path, rng):
    """--device_loop=1 end-to-end: CSV written, sane metrics, resumable."""
    from distgcn_tpu.data import generate
    import os
    netdir = tmp_path / "nets"
    netdir.mkdir()
    generate.generate_wireless_network(str(netdir), n_networks=2, area=100,
                                       n_nodes=30, r_connect=2.0,
                                       r_interfere=4.0, seed=11)
    out = tmp_path / "out"
    from distgcn_tpu.cli import wireless_sim
    argv = [f"--test_datapath={netdir}", "--wt_sel=qr", "--load_min=0.5",
            "--load_max=0.5", "--load_step=1.0", "--num_channels=1",
            "--opt=0", "--num_layer=1", "--hidden1=8", "--feature_size=1",
            "--diver_num=1", "--max_degree=1", "--predict=mwis",
            f"--output={out}", "--device_loop=1",
            f"--model_root={tmp_path / 'nomodel'}"]
    res = wireless_sim.main(argv)
    df = res.df
    assert len(df) == 2
    assert set(df["name"]) == {"DGCN-LGS-DL"}
    assert (df["avg_queue_len"] >= 0).all()
    assert (df["avg_utility"] > 0.5).all()
    # resumability: second run adds nothing
    res2 = wireless_sim.main(argv)
    assert len(res2.df) == 2


def test_cli_device_loop_multichannel(tmp_path, rng):
    from distgcn_tpu.data import generate
    netdir = tmp_path / "nets"
    netdir.mkdir()
    generate.generate_wireless_network(str(netdir), n_networks=1, area=100,
                                       n_nodes=30, r_connect=2.0,
                                       r_interfere=4.0, seed=13)
    out = tmp_path / "out"
    from distgcn_tpu.cli import wireless_sim
    argv = [f"--test_datapath={netdir}", "--wt_sel=qr", "--load_min=0.4",
            "--load_max=0.4", "--load_step=1.0", "--num_channels=2",
            "--opt=5", "--num_layer=1", "--hidden1=8", "--feature_size=1",
            "--diver_num=1", "--max_degree=1", "--predict=mwis",
            f"--output={out}", "--device_loop=1",
            f"--model_root={tmp_path / 'nomodel'}"]
    res = wireless_sim.main(argv)
    assert len(res.df) == 1
    assert (res.df["avg_queue_len"] >= 0).all()
