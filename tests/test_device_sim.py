"""Device-resident closed-loop scheduler (sim/device_sim) tests."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from distgcn_tpu.core.graph import GraphBatch
from distgcn_tpu.sim import device_sim
from distgcn_tpu.sim.wireless import slot_weights
from distgcn_tpu.solvers.greedy import local_greedy_search
from distgcn_tpu.utils.config import Config
from distgcn_tpu.agents import DQNAgent

from conftest import random_graph


def _batch(rng, b=3, n=40, pad=48):
    adjs = [random_graph(rng, n=n, p=0.1) for _ in range(b)]
    wtss = [np.ones(n) for _ in range(b)]
    return GraphBatch.from_scipy(adjs, wtss, pad_to=pad), adjs


def _agent(pad):
    cfg = Config(feature_size=1, hidden1=8, num_layer=2, diver_num=1,
                 max_degree=1, predict="mwis", pad_to=pad, batch_size=4,
                 epsilon=0.0)
    return DQNAgent(cfg, model_family="gcn_dqn"), cfg


def test_slot_step_matches_host_math(rng):
    """One deterministic slot == host simulator queue/schedule math."""
    gb, adjs = _batch(rng)
    agent, cfg = _agent(gb.wts.shape[1])
    step = device_sim.make_slot_step(agent.model, cfg, use_gcn=False)
    b, n = gb.wts.shape
    queue = (rng.random((b, n)) * 50).astype(np.float32) * np.asarray(gb.mask)
    arrivals = (rng.random((b, n)) * 10).astype(np.float32) * np.asarray(gb.mask)
    rates = np.trunc(rng.random((b, n)) * 100).astype(np.float32) * np.asarray(gb.mask)

    q2, sel, util, wts = step(agent.params, None, gb.adj > 0, gb.mask,
                              jnp.asarray(queue), jnp.asarray(arrivals),
                              jnp.asarray(rates))
    q2, sel, util, wts = (np.asarray(x) for x in (q2, sel, util, wts))

    for i, a in enumerate(adjs):
        nn = a.shape[0]
        q = queue[i, :nn] + arrivals[i, :nn]
        w_host = slot_weights(q, rates[i, :nn, None], "qr")[:, 0]
        np.testing.assert_allclose(wts[i, :nn], w_host, rtol=1e-5)
        mwis, total = local_greedy_search(a, w_host)
        assert set(np.nonzero(sel[i, :nn] == 1)[0].tolist()) == mwis
        np.testing.assert_allclose(util[i], total, rtol=1e-5)
        cap = np.zeros(nn)
        on = sorted(mwis)
        cap[on] = rates[i, on]
        dep = np.minimum(q, cap)
        np.testing.assert_allclose(q2[i, :nn], q - dep, rtol=1e-5)


def test_slot_step_gcn_reweights(rng):
    """use_gcn=True runs the model and schedules an independent set."""
    gb, adjs = _batch(rng)
    agent, cfg = _agent(gb.wts.shape[1])
    from distgcn_tpu.core import prep
    sup = prep.masked_simple_polynomials_dense(gb.adj, gb.mask,
                                               cfg.max_degree)
    step = device_sim.make_slot_step(agent.model, cfg, use_gcn=True)
    b, n = gb.wts.shape
    queue = (rng.random((b, n)) * 50).astype(np.float32) * np.asarray(gb.mask)
    arrivals = np.zeros((b, n), np.float32)
    rates = np.full((b, n), 50.0, np.float32)
    _, sel, util, _ = step(agent.params, sup, gb.adj > 0, gb.mask,
                           jnp.asarray(queue), jnp.asarray(arrivals),
                           jnp.asarray(rates))
    sel = np.asarray(sel)
    for i, a in enumerate(adjs):
        nn = a.shape[0]
        chosen = np.nonzero(sel[i, :nn] == 1)[0]
        sub = a[chosen][:, chosen]
        assert sub.nnz == 0  # independent set
        assert not np.any(sel[i, nn:] == 1)  # padding never scheduled


def test_closed_loop_runs_and_queues_are_stable(rng):
    gb, _ = _batch(rng, b=4, n=30, pad=32)
    agent, cfg = _agent(32)
    run = device_sim.make_closed_loop(agent.model, cfg, timeslots=50,
                                      load=0.5, with_baseline=True)
    b, n = gb.wts.shape
    q0 = jnp.zeros((b, n))
    qT, metrics = run(agent.params, gb.adj, gb.mask, q0,
                      jax.random.PRNGKey(0))
    qT = np.asarray(qT)
    assert qT.shape == (b, n)
    assert np.all(qT >= 0)
    assert np.all(np.asarray(metrics["avg_queue_len"]) >= 0)
    assert np.all(np.asarray(metrics["avg_utility"]) >= 0)
    # GCN-reweighted LGS never schedules padding and stays near greedy
    ratio = np.asarray(metrics["avg_utility_ratio"])
    assert np.all(ratio > 0.8)
    # padding queues stay exactly zero (masked arrivals)
    mask = np.asarray(gb.mask)
    assert np.all(qT[~mask] == 0)


def test_closed_loop_low_load_drains_queues(rng):
    """At very low load service capacity >> arrivals: queues stay tiny."""
    gb, _ = _batch(rng, b=2, n=20, pad=24)
    agent, cfg = _agent(24)
    run = device_sim.make_closed_loop(agent.model, cfg, timeslots=100,
                                      load=0.02, use_gcn=False)
    b, n = gb.wts.shape
    qT, metrics = run(agent.params, gb.adj, gb.mask, jnp.zeros((b, n)),
                      jax.random.PRNGKey(1))
    high = device_sim.make_closed_loop(agent.model, cfg, timeslots=100,
                                       load=2.0, use_gcn=False)
    qT2, m2 = high(agent.params, gb.adj, gb.mask, jnp.zeros((b, n)),
                   jax.random.PRNGKey(1))
    low_q = float(np.mean(np.asarray(metrics["avg_queue_len"])))
    high_q = float(np.mean(np.asarray(m2["avg_queue_len"])))
    assert low_q < high_q  # overload builds backlog


def test_slot_utilities_modes(rng):
    q = jnp.asarray(rng.random((2, 5)).astype(np.float32) * 10)
    r = jnp.asarray(np.trunc(rng.random((2, 5)) * 100).astype(np.float32))
    np.testing.assert_allclose(device_sim.slot_utilities(q, r, "qr"),
                               np.asarray(q) * np.asarray(r), rtol=1e-6)
    np.testing.assert_allclose(device_sim.slot_utilities(q, r, "q"),
                               np.asarray(q), rtol=1e-6)
    qor = np.asarray(device_sim.slot_utilities(q, r, "qor"))
    expect = slot_weights(np.asarray(q)[0], np.asarray(r)[0][:, None],
                          "qor")[:, 0]
    np.testing.assert_allclose(qor[0], expect, rtol=1e-5)
    np.testing.assert_allclose(device_sim.slot_utilities(q, r, "qrm"),
                               np.minimum(np.asarray(q), np.asarray(r)),
                               rtol=1e-6)
    u = device_sim.slot_utilities(q, r, "random", key=jax.random.PRNGKey(0))
    assert u.shape == q.shape


def test_multichannel_closed_loop(rng):
    """Product-graph scheduling: never two channels of the same link on,
    queues drain via per-channel rates, padding clean."""
    n_ch, nf = 3, 20
    adjs = [random_graph(rng, n=nf, p=0.15) for _ in range(2)]
    from distgcn_tpu.data.wireless import multichannel_conflict_graph
    import jax.numpy as jnp
    gks = []
    for a in adjs:
        _, gk = multichannel_conflict_graph([a] * n_ch)
        gks.append(gk)
    nk = n_ch * nf
    adj_gk = np.zeros((2, nk, nk), np.float32)
    for i, gk in enumerate(gks):
        adj_gk[i] = gk.toarray()
    link_mask = np.ones((2, nf), bool)
    agent, cfg = _agent(nk)
    run = device_sim.make_closed_loop_mc(agent.model, cfg, timeslots=40,
                                         n_ch=n_ch, load=0.5)
    qT, m = run(agent.params, jnp.asarray(adj_gk), jnp.asarray(link_mask),
                jnp.zeros((2, nf)), jax.random.PRNGKey(0))
    qT = np.asarray(qT)
    assert qT.shape == (2, nf)
    assert np.all(qT >= 0)
    assert np.all(np.asarray(m["avg_utility"]) >= 0)
    # cross-channel clique: scheduled product nodes form an IS, so at most
    # one channel per link ever fires — validated via one deterministic slot
    step = device_sim.make_slot_step(agent.model, cfg, use_gcn=False)
    queue = (rng.random((2, nk)) * 20).astype(np.float32)
    sel = np.asarray(step(agent.params, None, jnp.asarray(adj_gk) > 0,
                          jnp.asarray(np.ones((2, nk), bool)),
                          jnp.asarray(queue),
                          jnp.zeros((2, nk), np.float32),
                          jnp.full((2, nk), 10.0, np.float32))[1])
    per_link = (sel == 1).reshape(2, n_ch, nf).sum(axis=1)
    assert per_link.max() <= 1


def test_sharded_closed_loop_matches_single_device(rng):
    """8-virtual-device data-sharded episode == unsharded episode."""
    from distgcn_tpu.parallel.mesh import make_mesh
    gb, _ = _batch(rng, b=8, n=24, pad=32)
    agent, cfg = _agent(32)
    b, n = gb.wts.shape
    q0 = jnp.zeros((b, n))
    key = jax.random.PRNGKey(3)
    run1 = device_sim.make_closed_loop(agent.model, cfg, timeslots=30,
                                       load=0.5)
    mesh = make_mesh(n_data=8, n_model=1)
    run8 = device_sim.make_closed_loop(agent.model, cfg, timeslots=30,
                                       load=0.5, mesh=mesh)
    qA, mA = run1(agent.params, gb.adj, gb.mask, q0, key)
    qB, mB = run8(agent.params, gb.adj, gb.mask, q0, key)
    np.testing.assert_allclose(np.asarray(qA), np.asarray(qB), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mA["avg_queue_len"]),
                               np.asarray(mB["avg_queue_len"]), rtol=1e-5)


def test_online_training_loop_improves_or_holds(rng):
    """On-device online training: params change, loss finite, scheduling
    quality does not collapse, queue dynamics intact."""
    import optax
    from distgcn_tpu.rl.train import make_optimizer
    gb, _ = _batch(rng, b=4, n=30, pad=32)
    agent, cfg = _agent(32)
    opt = make_optimizer(1e-3)
    opt_state = opt.init(agent.params)
    run = device_sim.make_online_training_loop(agent.model, cfg, opt,
                                               timeslots=60, load=0.6)
    b, n = gb.wts.shape
    p2, os2, qT, m = run(agent.params, opt_state, gb.adj, gb.mask,
                         jnp.zeros((b, n)), jax.random.PRNGKey(0))
    losses = np.asarray(m["loss"])
    ratios = np.asarray(m["avg_utility_ratio"])
    assert np.all(np.isfinite(losses))
    assert np.all(np.isfinite(ratios)) and np.all(ratios > 0.2)
    # the regression objective itself is being optimized
    assert losses[-10:].mean() < losses[:10].mean()
    assert np.all(np.asarray(qT) >= 0)
    # parameters actually moved
    d = jax.tree_util.tree_map(lambda a, b_: float(np.abs(np.asarray(a)
                                                          - np.asarray(b_)).max()),
                               agent.params, p2)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_sequential_multichannel_loop(rng):
    """Device LGS-Seq: per-channel independence, drain-estimate chaining,
    valid queues; GCN variant also runs."""
    n_ch, nf, b = 2, 24, 3
    adjs = [[random_graph(rng, n=nf, p=0.15) for _ in range(n_ch)]
            for _ in range(b)]
    adj_ch = np.zeros((b, n_ch, nf, nf), np.float32)
    for i in range(b):
        for c in range(n_ch):
            adj_ch[i, c] = adjs[i][c].toarray()
    link_mask = np.ones((b, nf), bool)
    agent, cfg = _agent(nf)
    for use_gcn in (False, True):
        run = device_sim.make_closed_loop_seq(agent.model, cfg, timeslots=30,
                                              n_ch=n_ch, load=0.5,
                                              use_gcn=use_gcn)
        qT, m = run(agent.params, jnp.asarray(adj_ch),
                    jnp.asarray(link_mask), jnp.zeros((b, nf)),
                    jax.random.PRNGKey(0))
        qT = np.asarray(qT)
        assert qT.shape == (b, nf)
        assert np.all(qT >= 0)
        assert np.all(np.asarray(m["avg_utility"]) >= 0)


def test_sequential_slot_matches_host_sequential(rng):
    """One deterministic slot of device LGS-Seq == host _sequential."""
    from distgcn_tpu.sim.wireless import AlgoRunner, SimParams
    from distgcn_tpu.data.wireless import multichannel_conflict_graph
    n_ch, nf = 2, 20
    chans = [random_graph(rng, n=nf, p=0.2) for _ in range(n_ch)]
    adj_list, adj_gk = multichannel_conflict_graph(chans)
    params = SimParams(wt_sel="qr", n_ch=n_ch)
    runner = AlgoRunner("LGS-Seq", adj_gk, params, adj_list=adj_list,
                        nflows=nf)
    queue = (rng.random(nf) * 50 + 1).astype(np.float64)
    rates_t = np.trunc(rng.random((nf, n_ch)) * 99 + 1)
    q_algo = np.tile(queue[:, None], (1, n_ch)).astype(float)
    mwis_host = runner._sequential("LGS-Seq", q_algo.copy(), rates_t)

    # device: replicate the per-channel loop for one slot
    from distgcn_tpu.ops.lgs import batched_lgs
    q_est = jnp.asarray(queue[None, :].astype(np.float32))
    got = set()
    for ic in range(n_ch):
        wts_ic = q_est * jnp.asarray(rates_t[None, :, ic].astype(np.float32))
        mask_ic = wts_ic > 0
        adjb = jnp.asarray(chans[ic].toarray()[None]) > 0
        sel, _, _ = batched_lgs(adjb, wts_ic, mask_ic)
        on = np.nonzero(np.asarray(sel)[0] == 1)[0]
        got |= {int(v) + ic * nf for v in on}
        drain = jnp.minimum(q_est, jnp.asarray(
            rates_t[None, :, ic].astype(np.float32))) \
            * (sel == 1).astype(jnp.float32)
        q_est = q_est - drain
    assert got == mwis_host


def test_closed_loop_bfloat16_matches_f32_quality(rng):
    """compute_dtype='bfloat16' (the bench's production episode dtype)
    must track the f32 loop's utility metrics closely — measured on TPU
    the per-slot utility ratio is identical to 3e-5; on CPU we assert a
    loose bound plus basic sanity (bf16 rank flips can shift individual
    schedules, so only aggregate metrics are compared)."""
    import dataclasses
    gb, _ = _batch(rng, b=4, n=30, pad=32)
    agent, cfg = _agent(32)
    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg_d = dataclasses.replace(cfg, compute_dtype=dt)
        run = device_sim.make_closed_loop(agent.model, cfg_d, timeslots=50,
                                          load=0.5, with_baseline=True)
        b, n = gb.wts.shape
        qT, metrics = run(agent.params, gb.adj, gb.mask,
                          jnp.zeros((b, n)), jax.random.PRNGKey(0))
        assert np.all(np.asarray(qT) >= 0)
        outs[dt] = float(np.mean(np.asarray(metrics["avg_utility_ratio"])))
    assert abs(outs["bfloat16"] - outs["float32"]) < 0.02, outs


def test_poisson_arrivals_matches_scipy_quantiles():
    """Inverse-CDF arrivals == scipy.stats.poisson.ppf at every bin
    midpoint (deterministic oracle — no sampling noise), plus the sampler
    works under both threefry and rbg PRNG impls with matching moments.
    Arrival semantics: wireless_dqn_test.py:181-188 (Poisson counts)."""
    from scipy import stats
    for lam in (1.0, 7.5, 45.0):
        draw = device_sim.make_poisson_arrivals(lam)
        cdf64 = stats.poisson.cdf(np.arange(0, int(8 * lam + 32)), lam)
        keep = np.diff(cdf64) > 1e-5  # midpoints with f32-safe gaps
        mids = ((cdf64[:-1] + cdf64[1:]) / 2)[keep]
        want = stats.poisson.ppf(mids, lam)
        # feed the midpoints through the device quantile lookup directly
        cdf = np.asarray(device_sim._poisson_cdf(lam), np.float32)
        got = np.sum(mids[:, None] > cdf[None, :], axis=1)
        np.testing.assert_array_equal(got, want)
        for impl in ("threefry2x32", "rbg"):
            k = jax.random.key(3, impl=impl)
            s = np.asarray(draw(k, (40000,)))
            assert abs(s.mean() - lam) < 0.15 * np.sqrt(lam)
            assert abs(s.var() - lam) < 0.2 * lam
