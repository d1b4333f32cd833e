"""Fully device-resident wireless scheduling loop (closed-loop, one XLA scan).

The reference's production loop (`wireless_dqn_test.py:215-293`) iterates
timeslots on the host: draw arrivals/rates, form per-link utilities from the
queues, solve MWIS, apply the schedule, update queues. `sim/wireless.py`
mirrors that host loop for driver parity. This module is the TPU-native
steady-state form: the conflict graphs, GCN parameters, supports, queues and
the traffic RNG all live on device, and the whole T-slot episode runs as a
single `lax.scan` — zero host round-trips per slot. On a tunneled/remote
accelerator this is the difference between ~0.1 ms/slot of device compute
and multi-ms/slot of transfer stalls.

Semantics per slot (matching wireless_dqn_test.py):
- arrivals ~ Poisson(0.5*(rate_lo+rate_hi)*load) per link (:181-188 counts
  exponential interarrivals per slot, i.e. Poisson counts);
- link rates = truncated-Gaussian integers in [rate_lo, rate_hi] (:190-194);
- utilities per `wt_sel` in {qr, q, qor, qrm, random} (:219-230);
- schedule = GCN-reweighted LGS (DGCN-LGS) or plain LGS;
- queue += arrivals; departures = min(queue, rate * scheduled); queue -=
  departures (:285-293).

`make_slot_step` exposes the deterministic per-slot math (arrivals/rates as
inputs) for parity testing against the host simulator; `make_closed_loop`
wraps it in a scan with device RNG for the streaming benchmark/production
path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from distgcn_tpu.core import prep
from distgcn_tpu.ops.lgs import batched_lgs
from distgcn_tpu.utils.config import Config


def _poisson_cdf(lam: float, tail: float = 1e-9) -> np.ndarray:
    """Poisson(lam) CDF table up to the (1-tail) quantile (float64 host)."""
    if lam <= 0:
        return np.ones(1)
    pmf = [np.exp(-lam)]
    while sum(pmf) < 1.0 - tail and len(pmf) < int(8 * lam + 64):
        pmf.append(pmf[-1] * lam / len(pmf))
    return np.cumsum(pmf)


def make_poisson_arrivals(lam: float):
    """Exact static-rate Poisson sampler: inverse-CDF from ONE uniform.

    ``jax.random.poisson``'s rejection sampler costs ~105 us/slot at
    [128, 256] on a v5e scan and is threefry-only; with the rate known at
    trace time the quantile lookup ``#{k: u > cdf[k]}`` is
    distribution-identical (the >q(1-1e-9) tail folds into the top bin,
    below one part in 1e9 — and below f32 uniform resolution anyway), runs
    under ANY PRNG impl including the TPU-native ``rbg`` generator, and
    measures at the scan noise floor (<1 us/slot). Arrival semantics per
    wireless_dqn_test.py:181-188 (Poisson counts per slot).
    """
    cdf = jnp.asarray(_poisson_cdf(lam), jnp.float32)

    def draw(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape)
        return jnp.sum(u[..., None] > cdf, axis=-1).astype(dtype)

    return draw


def slot_utilities(queue: jnp.ndarray, rates: jnp.ndarray, wt_sel: str,
                   key: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-slot utilities [B, N] (wireless_dqn_test.py:219-230)."""
    if wt_sel == "qr":
        return queue * rates
    if wt_sel == "q":
        return queue
    if wt_sel == "qor":
        return jnp.where(rates > 0, queue / jnp.maximum(rates, 1e-9), 0.0)
    if wt_sel == "qrm":
        return jnp.minimum(queue, rates)
    if wt_sel == "random":
        if key is None:
            raise ValueError("wt_sel='random' needs a PRNG key")
        return jax.random.uniform(key, queue.shape)
    raise ValueError(f"unsupported wt_sel {wt_sel}")


def _features_for(wts: jnp.ndarray, mask: jnp.ndarray, flags: Config,
                  feature_mode: str) -> jnp.ndarray:
    """Per-slot feature construction (agents.build_state_arrays semantics)."""
    b, n = wts.shape
    m = mask.astype(wts.dtype)
    if flags.predict == "mwis":
        base = jnp.full((b, n, flags.feature_size), 1.0 / flags.feature_size,
                        dtype=wts.dtype)
        if feature_mode == "dqn":
            nz = (wts != 0).astype(wts.dtype)
            return base * (m * nz)[..., None]
        return base * m[..., None]
    norm = jnp.max(jnp.abs(wts) * m, axis=-1, keepdims=True) + 1e-9
    feats = jnp.repeat((wts / norm)[..., None], flags.feature_size, axis=-1)
    return feats * m[..., None]


def make_slot_step(model, flags: Config, feature_mode: str = "gdpg",
                   wt_sel: str = "qr", use_gcn: bool = True):
    """Deterministic one-slot step for parity tests.

    Returns step(params, supports, adjb, mask, queue, arrivals, rates) ->
    (queue', sel [B,N] int8, util [B], wts [B,N] scheduling-time utilities).
    """

    def step(params, supports, adjb, mask, queue, arrivals, rates):
        queue = queue + arrivals
        wts = slot_utilities(queue, rates, wt_sel) * mask
        if use_gcn:
            # features follow the episode compute dtype (supports carry it):
            # queues/utilities are f32, and an f32 operand under
            # Precision.HIGHEST forces the multi-pass f32 MXU path — ~3x
            # the bf16 forward (measured r5: 752 -> ~250 us/slot at
            # [128, 256] x 20 layers)
            feats = _features_for(wts, mask, flags, feature_mode)
            feats = feats.astype(supports.dtype)
            out = model.apply({"params": params}, feats, supports)
            act = out[..., 0].astype(wts.dtype) * mask
            gcn_wts = act * wts if flags.predict == "mwis" else act
        else:
            gcn_wts = wts
        sel, _, _ = batched_lgs(adjb, gcn_wts, mask)
        on = (sel == 1).astype(queue.dtype)
        capacity = rates * on
        departures = jnp.minimum(queue, capacity)
        queue = queue - departures
        util = jnp.sum(jnp.where(sel == 1, wts, 0.0), axis=-1)
        return queue, sel, util, wts

    return step


def make_closed_loop(model, flags: Config, timeslots: int,
                     load: float = 0.9, rate_lo: float = 0.0,
                     rate_hi: float = 100.0, wt_sel: str = "qr",
                     feature_mode: str = "gdpg", use_gcn: bool = True,
                     with_baseline: bool = False, mesh=None):
    """Closed-loop T-slot scheduling episode as one jitted scan.

    Returns run(params, adj, mask, queue0, key) ->
      (queueT [B,N],
       {"avg_queue_len": [B], "avg_utility": [B], "sched_rate": [B]}
       plus "avg_utility_ratio": [B] if with_baseline)

    adj is the dense [B,N,N] 0/1 conflict adjacency (static over the
    episode); supports are built once outside the scan and stay resident.

    mesh: optional ('data','model') jax Mesh — shards the graph batch over
    the 'data' axis (params/key replicated); the whole episode then runs
    SPMD with XLA collectives over ICI.
    """
    arrival_rate = 0.5 * (rate_lo + rate_hi) * load
    draw_arrivals = make_poisson_arrivals(arrival_rate)
    mean_r = 0.5 * (rate_lo + rate_hi)
    std_r = 0.25 * (rate_hi - rate_lo)
    step = make_slot_step(model, flags, feature_mode, wt_sel, use_gcn)

    def run(params, adj, mask, queue0, key):
        m = mask.astype(queue0.dtype)
        supports = prep.masked_simple_polynomials_dense(
            adj, mask, flags.max_degree)
        if getattr(flags, "compute_dtype", "float32") == "bfloat16":
            supports = supports.astype(jnp.bfloat16)
            params_c = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16), params)
        else:
            params_c = params
        adjb = adj > 0

        def body(carry, _):
            queue, key = carry
            key, ka, kr = jax.random.split(key, 3)
            arrivals = draw_arrivals(ka, queue.shape,
                                      queue.dtype) * m
            # truncated-Gaussian integer rates (astype(int) truncates toward
            # zero, then clamp — wireless_dqn_test.py:190-194)
            rates = jax.random.normal(kr, queue.shape) * std_r + mean_r
            rates = jnp.clip(jnp.trunc(rates), rate_lo, rate_hi) * m
            queue, sel, util, wts = step(params_c, supports, adjb, mask,
                                         queue, arrivals, rates)
            slot = {
                "queue_sum": jnp.sum(queue * m, axis=-1),
                "util": util,
                "nsched": jnp.sum((sel == 1).astype(jnp.float32), axis=-1),
            }
            if with_baseline:
                _, gutil, _ = batched_lgs(adjb, wts, mask)
                slot["gutil"] = gutil
            return (queue, key), slot

        (queue, _), slots = jax.lax.scan(body, (queue0, key), None,
                                         length=timeslots)
        nreal = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
        metrics = {
            "avg_queue_len": jnp.mean(slots["queue_sum"], axis=0) / nreal,
            "avg_utility": jnp.mean(slots["util"], axis=0),
            "sched_rate": jnp.mean(slots["nsched"], axis=0) / nreal,
        }
        if with_baseline:
            metrics["avg_utility_ratio"] = jnp.mean(
                slots["util"] / jnp.maximum(slots["gutil"], 1e-9), axis=0)
        return queue, metrics

    if mesh is None:
        return jax.jit(run)
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))
    # output shardings inferred by GSPMD (metrics is a dict keyed by mode)
    return jax.jit(run, in_shardings=(rep, dat, dat, dat, rep))


def make_closed_loop_mc(model, flags: Config, timeslots: int, n_ch: int,
                        load: float = 0.9, rate_lo: float = 0.0,
                        rate_hi: float = 100.0, wt_sel: str = "qr",
                        feature_mode: str = "gdpg", use_gcn: bool = True):
    """Multi-channel closed loop on the product conflict graph.

    The reference's multichannel drivers schedule MWIS on a product graph
    with one node per (link, channel), per-channel conflict edges plus a
    single-radio clique across a link's channel copies
    (wireless_rollout_test_flood.py:98-133); flat node id = ch*nflows+link
    (order='F' reshape, wireless_dqn_test_mc.py:229). Queues are per LINK;
    a scheduled (link, ch) drains at that channel's rate (the cross-channel
    clique guarantees at most one channel per link).

    Returns run(params, adj_gk, link_mask, queue0, key) ->
      (queueT [B,Nf], metrics) with adj_gk [B, n_ch*Nf, n_ch*Nf] and
      link_mask [B, Nf].
    """
    arrival_rate = 0.5 * (rate_lo + rate_hi) * load
    draw_arrivals = make_poisson_arrivals(arrival_rate)
    mean_r = 0.5 * (rate_lo + rate_hi)
    std_r = 0.25 * (rate_hi - rate_lo)

    @jax.jit
    def run(params, adj_gk, link_mask, queue0, key):
        b, nf = queue0.shape
        nk = adj_gk.shape[-1]
        assert nk == n_ch * nf, (nk, n_ch, nf)
        m = link_mask.astype(queue0.dtype)
        mask_k = jnp.tile(link_mask, (1, n_ch))             # [B, nch*Nf]
        supports = prep.masked_simple_polynomials_dense(
            adj_gk, mask_k, flags.max_degree)
        adjb = adj_gk > 0

        def body(carry, _):
            queue, key = carry
            key, ka, kr = jax.random.split(key, 3)
            arrivals = draw_arrivals(ka, queue.shape,
                                      queue.dtype) * m
            rates = jax.random.normal(kr, (b, nf, n_ch)) * std_r + mean_r
            rates = jnp.clip(jnp.trunc(rates), rate_lo, rate_hi) \
                * m[..., None]
            queue = queue + arrivals
            wts3 = slot_utilities(queue[:, :, None], rates, wt_sel)
            # order='F' flatten: node ch*nflows+link
            wts = wts3.transpose(0, 2, 1).reshape(b, nk) * mask_k
            if use_gcn:
                feats = _features_for(wts, mask_k, flags, feature_mode)
                out = model.apply({"params": params}, feats, supports)
                act = out[..., 0].astype(wts.dtype) * mask_k
                gcn_wts = act * wts if flags.predict == "mwis" else act
            else:
                gcn_wts = wts
            sel, _, _ = batched_lgs(adjb, gcn_wts, mask_k)
            on3 = (sel == 1).reshape(b, n_ch, nf).astype(queue.dtype)
            capacity = jnp.sum(rates.transpose(0, 2, 1) * on3, axis=1)
            departures = jnp.minimum(queue, capacity)
            queue = queue - departures
            util = jnp.sum(jnp.where(sel == 1, wts, 0.0), axis=-1)
            return (queue, key), {
                "queue_sum": jnp.sum(queue * m, axis=-1),
                "util": util,
                "nsched": jnp.sum((sel == 1).astype(jnp.float32), axis=-1),
            }

        (queue, _), slots = jax.lax.scan(body, (queue0, key), None,
                                         length=timeslots)
        nreal = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
        metrics = {
            "avg_queue_len": jnp.mean(slots["queue_sum"], axis=0) / nreal,
            "avg_utility": jnp.mean(slots["util"], axis=0),
            "sched_rate": jnp.mean(slots["nsched"], axis=0) / nreal,
        }
        return queue, metrics

    return run


def make_online_training_loop(model, flags: Config, optimizer,
                              timeslots: int, load: float = 0.9,
                              rate_lo: float = 0.0, rate_hi: float = 100.0,
                              wt_sel: str = "qr",
                              feature_mode: str = "gdpg"):
    """Online RL training inside the scheduling episode, fully on device.

    The reference trains online in its wireless loop by memorizing each
    slot's (state, action, reward) and replaying on the host
    (wireless_dqn_test.py:339-344). TPU-native form: every slot schedules
    with the CURRENT params, computes reward = scheduled-utility /
    plain-LGS-baseline-utility, regresses the model's node scores toward
    the DQN-style assignment target (target[solution] = reward,
    mwis_dqn_call.py:168-171) with the reference RMSE + layer-1 L2 loss,
    and applies one Adam update — one gradient step per slot, batched over
    all B graphs, inside the same `lax.scan` as the queue dynamics.

    Returns run(params, opt_state, adj, mask, queue0, key) ->
      (params, opt_state, queueT,
       {"loss": [T], "avg_utility_ratio": [T], "avg_queue_len": [B]}).
    """
    arrival_rate = 0.5 * (rate_lo + rate_hi) * load
    draw_arrivals = make_poisson_arrivals(arrival_rate)
    mean_r = 0.5 * (rate_lo + rate_hi)
    std_r = 0.25 * (rate_hi - rate_lo)
    wd = flags.weight_decay
    import optax

    def loss_fn(params, feats, supports, labels, mask, lmask):
        out = model.apply({"params": params}, feats, supports)  # [B,N,D]
        err = (out[..., 0] - labels) ** 2 * mask * lmask
        mse = jnp.sum(err, axis=-1) / jnp.maximum(
            jnp.sum(mask * lmask, axis=-1), 1.0)
        loss = jnp.mean(jnp.sqrt(mse))
        first_key = "gc1" if "gc1" in params else sorted(params.keys())[0]
        l2 = sum(jnp.sum(v ** 2) / 2.0
                 for v in jax.tree_util.tree_leaves(params[first_key]))
        return loss + wd * l2

    @jax.jit
    def run(params, opt_state, adj, mask, queue0, key):
        m = mask.astype(queue0.dtype)
        supports = prep.masked_simple_polynomials_dense(
            adj, mask, flags.max_degree)
        adjb = adj > 0

        def body(carry, _):
            params, opt_state, queue, key = carry
            key, ka, kr = jax.random.split(key, 3)
            arrivals = draw_arrivals(ka, queue.shape,
                                      queue.dtype) * m
            rates = jax.random.normal(kr, queue.shape) * std_r + mean_r
            rates = jnp.clip(jnp.trunc(rates), rate_lo, rate_hi) * m
            queue = queue + arrivals
            wts = slot_utilities(queue, rates, wt_sel) * m

            feats = _features_for(wts, mask, flags, feature_mode)
            out = model.apply({"params": params}, feats, supports)
            act = out[..., 0].astype(wts.dtype) * mask
            gcn_wts = act * wts if flags.predict == "mwis" else act
            sel, util, _ = batched_lgs(adjb, gcn_wts, mask)
            _, gutil, _ = batched_lgs(adjb, wts, mask)
            reward = util / jnp.maximum(gutil, 1e-9)          # [B]

            # DQN assignment target on the chosen solution's nodes
            on = (sel == 1)
            labels = jnp.where(on, reward[:, None], act)
            lmask = jnp.ones_like(m)  # regress all real nodes
            loss, grads = jax.value_and_grad(loss_fn)(
                params, feats, supports, labels, m, lmask)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            on_f = on.astype(queue.dtype)
            departures = jnp.minimum(queue, rates * on_f)
            queue = queue - departures
            slot = {"loss": loss,
                    "ratio": jnp.mean(reward),
                    "queue_sum": jnp.sum(queue * m, axis=-1)}
            return (params, opt_state, queue, key), slot

        (params, opt_state, queue, _), slots = jax.lax.scan(
            body, (params, opt_state, queue0, key), None, length=timeslots)
        nreal = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
        metrics = {
            "loss": slots["loss"],
            "avg_utility_ratio": slots["ratio"],
            "avg_queue_len": jnp.mean(slots["queue_sum"], axis=0) / nreal,
        }
        return params, opt_state, queue, metrics

    return run


def make_closed_loop_seq(model, flags: Config, timeslots: int, n_ch: int,
                         load: float = 0.9, rate_lo: float = 0.0,
                         rate_hi: float = 100.0,
                         feature_mode: str = "gdpg", use_gcn: bool = True):
    """Sequential multi-channel scheduling (LGS-Seq / DGCN-LGS-Seq) on
    device — the reference's channel-by-channel algorithm with queue-drain
    estimates (wireless_dqn_test_mc.py:292-354, requires wt_sel='qr'):

    for each channel ic: utilities = q_est * rate_ic over that channel's own
    conflict graph; links with zero utility are excluded (the host version
    deletes them from the subgraph — here they are masked out, which is
    equivalent: they can neither enter nor block); scheduled links' drain
    estimate min(q_est, rate_ic) carries to the next channel's utilities.

    adj_ch: [B, n_ch, Nf, Nf] per-channel conflict adjacencies (static).
    Returns run(params, adj_ch, link_mask, queue0, key) ->
      (queueT [B,Nf], {"avg_queue_len": [B], "avg_utility": [B]}).
    """
    arrival_rate = 0.5 * (rate_lo + rate_hi) * load
    draw_arrivals = make_poisson_arrivals(arrival_rate)
    mean_r = 0.5 * (rate_lo + rate_hi)
    std_r = 0.25 * (rate_hi - rate_lo)

    @jax.jit
    def run(params, adj_ch, link_mask, queue0, key):
        b, nf = queue0.shape
        m = link_mask.astype(queue0.dtype)
        sup_ch = [prep.masked_simple_polynomials_dense(
            adj_ch[:, ic], link_mask, flags.max_degree)
            for ic in range(n_ch)]
        adjb_ch = adj_ch > 0

        def body(carry, _):
            queue, key = carry
            key, ka, kr = jax.random.split(key, 3)
            arrivals = draw_arrivals(ka, queue.shape,
                                      queue.dtype) * m
            rates = jax.random.normal(kr, (b, nf, n_ch)) * std_r + mean_r
            rates = jnp.clip(jnp.trunc(rates), rate_lo, rate_hi) \
                * m[..., None]
            queue = queue + arrivals

            q_est = queue
            total_cap = jnp.zeros_like(queue)
            util = jnp.zeros((b,), queue.dtype)
            for ic in range(n_ch):
                wts_ic = q_est * rates[:, :, ic]            # qr utilities
                mask_ic = link_mask & (wts_ic > 0)
                if use_gcn:
                    feats = _features_for(wts_ic, mask_ic, flags,
                                          feature_mode)
                    out = model.apply({"params": params}, feats, sup_ch[ic])
                    act = out[..., 0].astype(wts_ic.dtype) \
                        * mask_ic.astype(wts_ic.dtype)
                    gw = act * wts_ic if flags.predict == "mwis" else act
                else:
                    gw = wts_ic
                sel, _, _ = batched_lgs(adjb_ch[:, ic], gw, mask_ic)
                on = (sel == 1).astype(queue.dtype)
                util = util + jnp.sum(wts_ic * on, axis=-1)
                drain = jnp.minimum(q_est, rates[:, :, ic]) * on
                total_cap = total_cap + rates[:, :, ic] * on
                q_est = q_est - drain                       # estimate only

            departures = jnp.minimum(queue, total_cap)
            queue = queue - departures
            return (queue, key), {
                "queue_sum": jnp.sum(queue * m, axis=-1),
                "util": util,
            }

        (queue, _), slots = jax.lax.scan(body, (queue0, key), None,
                                         length=timeslots)
        nreal = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
        return queue, {
            "avg_queue_len": jnp.mean(slots["queue_sum"], axis=0) / nreal,
            "avg_utility": jnp.mean(slots["util"], axis=0),
        }

    return run
