import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from distgcn_tpu.large import (build_large_graph, geometric_conflict_graph,
                               make_large_solve, params_to_list,
                               graph_arrays)
from distgcn_tpu.models.gcn import ChebGCN
import scipy.sparse as sp

n = 1 << 20
t0 = time.time()
adj, wts, _ = geometric_conflict_graph(n, avg_degree=48.0, seed=0,
                                       order="grid")
print(f"graph {time.time()-t0:.0f}s nnz={adj.nnz}", flush=True)
t0 = time.time()
lg = build_large_graph(adj, block_size=512)
print(f"build {time.time()-t0:.0f}s pr={lg.panels.panel_rows} "
      f"W={lg.panels.win_blocks} "
      f"Wg={None if lg.gather is None else lg.gather[3]} "
      f"nb={lg.ind_bsr.nb_real} bitmap={lg.bitmap}", flush=True)
model = ChebGCN(num_layer=20, hidden_dim=128, out_dim=1, num_supports=2)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 1)),
                    jnp.zeros((1, 2, 256, 256)))["params"]
plist = params_to_list(params)
solve = make_large_solve(lg, predict="dqn")
arrs = graph_arrays(lg)
wpad = np.zeros(lg.n_pad, np.float32)
wpad[:n] = wts
wj = jnp.asarray(wpad)
t0 = time.time()
sel, util, _ = solve(plist, wj)
sel = np.asarray(sel)
print(f"first solve (incl. compile+upload) {time.time()-t0:.0f}s "
      f"util={float(util):.0f}", flush=True)
s = np.flatnonzero(sel[:n] == 1)
a = sp.csr_matrix(adj)
print("picked", len(s), "independent:", a[s][:, s].nnz == 0, flush=True)

import functools
@functools.partial(jax.jit, static_argnames="k")
def many(arrs, ps, w, k):
    def body(c, i):
        scale = 1.0 + 0.001 * i.astype(jnp.float32)
        _, u, _ = solve.jitted(arrs, ps, w * scale)
        return c + u, 0
    r, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
    return r

np.asarray(many(arrs, plist, wj, 2))
np.asarray(many(arrs, plist, wj, 8))
t = []
for k in (2, 8):
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(many(arrs, plist, wj, k))
        best = min(best, time.perf_counter() - t0)
    t.append(best)
ms = (t[1] - t[0]) / 6 * 1000
print(f"1M solve marginal {ms:.1f} ms = "
      f"{adj.nnz*20/(ms/1000)/1e9:.2f} Gedge/s", flush=True)
