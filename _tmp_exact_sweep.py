import os, time, numpy as np, pandas as pd
from distgcn_tpu.data.matio import load_mat, list_dataset
from distgcn_tpu.solvers.exact import mwis_exact
from distgcn_tpu.solvers.greedy import greedy_search

for dist in ["ER", "BA"]:
    d = f'/root/reference/data/{dist}_Graph_Uniform_GEN21_test2'
    ref = pd.read_csv(f'/root/reference/output/mlp_gurobi_{dist}_Graph_Uniform_GEN21_test2.csv').set_index('data')
    files = list_dataset(d)
    t0 = time.perf_counter()
    match, total, worse, better = 0, 0, 0, 0
    maxdev = 0.0
    times = []
    for f in files:
        inst = load_mat(os.path.join(d, f))
        t1 = time.perf_counter()
        solu, val, status = mwis_exact(inst.adj, inst.weights, timeout=30.0)
        times.append(time.perf_counter() - t1)
        _, gu = greedy_search(inst.adj, inst.weights)
        p = val / gu
        key = f
        if key in ref.index:
            ref_p = float(ref.loc[key, "p"])
            if ref_p > 0:
                dev = (p - ref_p) / ref_p
                maxdev = max(maxdev, abs(dev))
                total += 1
                if abs(dev) < 1e-6: match += 1
                elif dev > 0: better += 1
                else: worse += 1
    print(f"{dist}: {total} instances vs Gurobi CSV: exact match {match}, ours better {better}, ours worse {worse}, maxdev {maxdev:.2e}")
    print(f"  solve time: mean {np.mean(times)*1e3:.1f} ms, p95 {np.percentile(times,95)*1e3:.1f} ms, max {np.max(times)*1e3:.1f} ms, total {time.perf_counter()-t0:.0f}s")
