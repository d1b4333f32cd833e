"""Worker for tests/test_multiprocess.py: joins a 2-process CPU cluster and
runs the sharded paths over the GLOBAL 8-device mesh, asserting equality
with locally-computed single-process results. Run via:

    DISTGCN_COORDINATOR=localhost:PORT DISTGCN_NUM_PROCESSES=2 \
    DISTGCN_PROCESS_ID=i XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    python tests/mp_worker.py
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distgcn_tpu.parallel import distributed as dist  # noqa: E402

assert dist.initialize(), "DISTGCN_* env not set"

import numpy as np                                    # noqa: E402
import jax.numpy as jnp                               # noqa: E402
from jax.sharding import PartitionSpec as P           # noqa: E402

from distgcn_tpu.core.graph import GraphBatch         # noqa: E402
from distgcn_tpu.models.gcn import make_model_from_config  # noqa: E402
from distgcn_tpu.parallel import halo                 # noqa: E402
from distgcn_tpu.parallel.mesh import (make_mesh, make_sharded_solve,
                                       make_sharded_train_step)  # noqa: E402
from distgcn_tpu.pipeline import make_solve_pipeline  # noqa: E402
from distgcn_tpu.rl.train import make_optimizer       # noqa: E402
from distgcn_tpu.solvers.greedy import local_greedy_search  # noqa: E402
from distgcn_tpu.utils.config import Config           # noqa: E402


def main():
    pid, nproc, nlocal, nglobal = dist.process_info()
    # any NPROC x (8/NPROC) layout — the global mesh is always 8 devices
    assert nproc == int(os.environ["DISTGCN_NUM_PROCESSES"]), (pid, nproc)
    assert nglobal == 8 and nlocal * nproc == 8, (nlocal, nglobal)

    rng = np.random.default_rng(0)   # same stream on every process

    # ---- 1. data-parallel solve over the global mesh vs local pipeline
    cfg = Config(feature_size=1, hidden1=8, num_layer=2, diver_num=1,
                 max_degree=1, predict="mwis", pad_to=64, epsilon=0.0)
    model = make_model_from_config(cfg, "gcn_dqn")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 1)),
                        jnp.zeros((1, 2, 64, 64)))["params"]
    insts = []
    for _ in range(8):
        n = int(rng.integers(20, 60))
        a = (rng.random((n, n)) < 0.1).astype(np.float32)
        a = np.triu(a, 1)
        insts.append((a + a.T, rng.random(n).astype(np.float32)))
    import scipy.sparse as sp
    gb = GraphBatch.from_scipy([sp.csr_matrix(a) for a, _ in insts],
                               [w for _, w in insts], pad_to=64)

    mesh = make_mesh(n_data=8, n_model=1)      # global 8 devices, 2 procs
    solve = make_sharded_solve(model, cfg, mesh)
    gadj = dist.host_to_global(mesh, P("data"), np.asarray(gb.adj))
    gwts = dist.host_to_global(mesh, P("data"), np.asarray(gb.wts))
    gmask = dist.host_to_global(mesh, P("data"), np.asarray(gb.mask))
    gparams = jax.tree_util.tree_map(
        lambda x: dist.host_to_global(mesh, P(), np.asarray(x)), params)
    sel, util, gutil = solve(gparams, gadj, gwts, gmask)
    util_g = dist.gather_global(util)

    local = make_solve_pipeline(model, cfg)
    _, util_l, _ = local(params, gb.adj, gb.wts, gb.mask)
    np.testing.assert_allclose(util_g, np.asarray(util_l), rtol=1e-5)
    print(f"[{pid}] sharded solve OK", flush=True)

    # ---- 2. sharded train step vs local jit step (same optimizer/update)
    optimizer = make_optimizer(1e-3, 1.0)
    opt_state = optimizer.init(params)
    labels = rng.random((8, 64, 1)).astype(np.float32)
    step = make_sharded_train_step(model, cfg, optimizer, mesh)
    gopt = jax.tree_util.tree_map(
        lambda x: dist.host_to_global(mesh, P(), np.asarray(x)), opt_state)
    glabels = dist.host_to_global(mesh, P("data"), labels)
    gmaskf = dist.host_to_global(mesh, P("data"),
                                 np.asarray(gb.mask, np.float32))
    p2, _, loss2 = step(gparams, gopt, gadj, gwts, gmaskf, glabels)

    # local single-process reference of the same math
    from distgcn_tpu.agents import build_state_arrays
    import optax

    def loss_fn(p):
        feats, sups = build_state_arrays(gb.adj, gb.wts, gb.mask,
                                         cfg.feature_size, cfg.max_degree,
                                         cfg.predict, "gdpg")
        out = model.apply({"params": p}, feats, sups)
        err = (out[..., :1] - labels) ** 2
        maskf = np.asarray(gb.mask, np.float32)
        mse = jnp.sum(err[..., 0] * maskf, axis=-1) / jnp.maximum(
            jnp.sum(maskf, axis=-1), 1.0)
        loss = jnp.mean(jnp.sqrt(mse))
        l2 = sum(jnp.sum(v ** 2) / 2.0
                 for v in jax.tree_util.tree_leaves(p["gc1"]))
        return loss + cfg.weight_decay * l2

    loss1, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    upd, _ = optimizer.update(grads, opt_state, params)
    p1 = optax.apply_updates(params, upd)
    np.testing.assert_allclose(float(dist.gather_global(loss2)),
                               float(loss1), rtol=1e-5)
    for k in p1:
        for kk in p1[k]:
            np.testing.assert_allclose(
                dist.gather_global(p2[k][kk]), np.asarray(p1[k][kk]),
                rtol=1e-5, atol=1e-7)
    print(f"[{pid}] sharded train step OK", flush=True)

    # ---- 3. giant-graph sharded LGS (ring ppermute across processes)
    n = 256
    a = (rng.random((n, n)) < 0.05).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    w = rng.random(n).astype(np.float32)
    gmesh = dist.global_mesh(("graph",))
    lgs = halo.make_sharded_lgs(gmesh, n)
    ga = dist.host_to_global(gmesh, P("graph", None), a)
    gw = dist.host_to_global(gmesh, P("graph"), w)
    gm = dist.host_to_global(gmesh, P("graph"), np.ones(n, bool))
    sel, _ = lgs(ga, gw, gm)
    sel_full = dist.gather_global(sel)
    ref_set, _ = local_greedy_search(sp.csr_matrix(a), w)
    assert set(np.nonzero(sel_full == 1)[0].tolist()) == ref_set
    print(f"[{pid}] sharded LGS OK", flush=True)

    # ---- 4. giant-graph BITMAP panel solve (parallel/large_sharded) over
    # the multi-process mesh vs the single-process ELL reference
    from distgcn_tpu.large import (build_large_graph, make_large_solve,
                                   geometric_conflict_graph)
    from distgcn_tpu.parallel.large_sharded import (
        make_sharded_large_solve, shard_large_graph, AXIS)

    adj_l, wts_l, _ = geometric_conflict_graph(700, avg_degree=9.0, seed=61)
    sg = shard_large_graph(adj_l, 8, block_size=32, interpret=True)
    assert sg.bitmap and sg.separable, (sg.bitmap, sg.separable)
    gmesh_l = dist.global_mesh((AXIS,))
    plist = [{"w_0": jnp.full((1, 1), 0.3), "w_1": jnp.full((1, 1), 0.9),
              "bias": jnp.full((1,), 0.05)}]

    def shp(x):
        return dist.host_to_global(gmesh_l, P(AXIS), np.asarray(x))

    wpad = np.zeros(sg.n_pad, np.float32)
    wpad[: sg.n] = wts_l
    solve_l = make_sharded_large_solve(gmesh_l, sg)
    sel_l, util_l2 = solve_l(shp(sg.ind), shp(sg.rptr), shp(sg.cols),
                             shp(sg.r), plist, shp(wpad), shp(sg.mask))
    sel_lf = dist.gather_global(sel_l)[: sg.n]
    util_lf = float(dist.gather_global(util_l2).flatten()[0])

    g1 = build_large_graph(adj_l, block_size=128, use_pallas=False)
    s1 = make_large_solve(g1)
    w1 = np.zeros(g1.n_pad, np.float32)
    w1[: g1.n] = wts_l
    sel1, util1, _ = s1(plist, jnp.asarray(w1))
    assert np.array_equal(sel_lf, np.asarray(sel1)[: sg.n])
    assert np.isclose(util_lf, float(util1), rtol=1e-5), (util_lf, util1)
    print(f"[{pid}] sharded giant-graph bitmap solve OK", flush=True)

    print(f"[{pid}] WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
