"""Closed-loop per-slot breakdown (VERDICT r4 next #8).

Times the 128x256 x 500-slot episode in ablations:
  full      — 20-layer GCN every slot (dqn features) + LGS + queue glue
  hoisted   — GCN hoisted (gdpg features): LGS + glue per slot
  nogcn     — use_gcn=False: plain LGS + glue per slot
  glue      — traffic + queue updates only (no solver): custom scan
plus the int8-vs-f32 adjacency UPLOAD cost (the only thing the r3
persistent-int8-adjacency change could move — the episode converts the
adjacency once outside the scan, so per-slot time is unaffected by
construction).
"""
import sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from distgcn_tpu.agents import DQNAgent
from distgcn_tpu.core.graph import GraphBatch
from distgcn_tpu.sim.device_sim import make_closed_loop
from distgcn_tpu.utils.config import Config
from bench import build_workload

cfg = Config(feature_size=1, hidden1=32, num_layer=20, diver_num=1,
             max_degree=1, predict="mwis", pad_to=256, epsilon=0.0)
agent = DQNAgent(cfg, model_family="gcn_dqn")
agent.load("/root/reference/model/"
           "result_IS4SAT_deep_ld1_c32_l20_cheb1_diver1_mwis_dqn")
rng = np.random.default_rng(0)
instances = build_workload(256, rng)[:128]
gb = GraphBatch.from_scipy([a for a, _ in instances],
                           [w for _, w in instances], pad_to=256)
b, n = gb.wts.shape
T = 500
cfgb = dataclasses.replace(cfg, compute_dtype="bfloat16")
q0 = jnp.zeros((b, n))


def time_run(run, label):
    # rbg keys = the bench episode RNG (see device_sim.make_poisson_arrivals)
    np.asarray(run(agent.params, gb.adj, gb.mask, q0,
                   jax.random.key(0, impl="rbg"))[0])
    best = 1e9
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(run(agent.params, gb.adj, gb.mask, q0,
                       jax.random.key(i + 1, impl="rbg"))[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:8s}: {best*1000:8.1f} ms episode = "
          f"{best/T*1e6:7.1f} us/slot = {T*b/best:9.0f} graphs/s",
          flush=True)
    return best


t_full = time_run(make_closed_loop(agent.model, cfgb, timeslots=T,
                                   load=0.9, feature_mode="dqn"), "full")
t_hoist = time_run(make_closed_loop(agent.model, cfgb, timeslots=T,
                                    load=0.9), "hoisted")
t_nogcn = time_run(make_closed_loop(agent.model, cfgb, timeslots=T,
                                    load=0.9, use_gcn=False), "nogcn")


# glue-only scan: same traffic model + queue update, no solver
def make_glue(timeslots, load=0.9, rate_lo=0.0, rate_hi=100.0):
    from distgcn_tpu.sim.device_sim import make_poisson_arrivals
    arrival_rate = 0.5 * (rate_lo + rate_hi) * load
    draw_arrivals = make_poisson_arrivals(arrival_rate)
    mean_r = 0.5 * (rate_lo + rate_hi)
    std_r = 0.25 * (rate_hi - rate_lo)

    @jax.jit
    def run(params, adj, mask, queue0, key):
        m = mask.astype(queue0.dtype)

        def body(carry, _):
            queue, key = carry
            key, ka, kr = jax.random.split(key, 3)
            arrivals = draw_arrivals(ka, queue.shape,
                                     queue.dtype) * m
            rates = jax.random.normal(kr, queue.shape) * std_r + mean_r
            rates = jnp.clip(jnp.trunc(rates), rate_lo, rate_hi) * m
            # pretend everything with queue>0 drains (no solver)
            queue = jnp.maximum(queue + arrivals - rates, 0.0)
            return (queue, key), jnp.sum(queue * m, axis=-1)

        (queue, _), qs = jax.lax.scan(body, (queue0, key), None,
                                      length=timeslots)
        return queue, qs

    return run


t_glue = time_run(make_glue(T), "glue")

print(f"\nbreakdown per slot (us): GCN-20L {1e6*(t_full-t_hoist)/T:.1f}  "
      f"GCN-reweight-vs-raw-LGS {1e6*(t_hoist-t_nogcn)/T:.1f}  "
      f"LGS {1e6*(t_nogcn-t_glue)/T:.1f}  glue {1e6*t_glue/T:.1f}",
      flush=True)

# int8 vs f32 adjacency upload (the persistent-int8 claim)
a8 = np.asarray(gb.adj, np.int8)
a32 = np.asarray(gb.adj, np.float32)
for arr, lbl in ((a8, "int8"), (a32, "f32")):
    jnp.asarray(arr).block_until_ready()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jnp.asarray(arr).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"adjacency upload {lbl}: {arr.nbytes/1e6:.1f} MB in "
          f"{best*1000:.1f} ms", flush=True)
