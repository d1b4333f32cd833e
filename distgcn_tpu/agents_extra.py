"""Additional agent families: legacy DQN, MLP ablation, diver tree-search.

- `LegacyDQNAgent`: the flag-driven DQN of `mwis_dqn_call.py` (GCN_DQN
  model, scope 'gcn_dqn'): L2-normalized weight features (:129-138),
  epsilon randomizes the *score vector* during training (:226-228, unlike
  the GDPG agent where it only perturbs the returned action), replay
  assigns target_f[solution] = reward without batch standardization and
  does NOT clear memory (:151-186).
- `MLPAgent`: topology-blind ablation of `mwis_mlp_call.py` — MLP2 Q-net
  over per-node degree features (:70-81).
- `DiverAgent`: re-spec of the missing `mwis_rollout_call` module
  (SURVEY §2.3): a GCN_DEEP_DIVER-style model emits diver_num score heads;
  `solve_mwis_iterative` runs a best-solution-first tree search — each head
  proposes a greedy schedule on head-weighted utilities, partial states are
  queued with probability backoff_prob (runtime_config.py:19), and the best
  complete IS wins. The original module is absent from the reference tree;
  this follows the visible call sites (`wireless_rollout_test*.py:37-43`,
  `bsf_q` machinery in `mwis_dqn_test.py:59-135`).
"""

from __future__ import annotations

import heapq
import os
from typing import Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from distgcn_tpu.agents import DQNAgent, MWISSolver
from distgcn_tpu.core.graph import GraphBatch, pad_bucket
from distgcn_tpu.ops.lgs import batched_lgs
from distgcn_tpu.utils.config import Config


class LegacyDQNAgent(DQNAgent):
    """mwis_dqn_call.py DQNAgent semantics."""

    def __init__(self, flags: Config, memory_size: int = 5000, seed: int = 0):
        super().__init__(flags, memory_size, model_family="gcn_dqn",
                         seed=seed)
        self.feature_mode = "dqn"      # wts/||wts|| features (row-normalized)
        self.trainer.style = "dqn"     # assignment targets, no standardization

    def act(self, state, train: bool = False):
        act_values, action = self.predict(state)
        if train and self._rng.random() <= self.epsilon:
            # legacy DQN randomizes the score vector itself
            # (mwis_dqn_call.py:226-228)
            act_values = self._rng.uniform(size=act_values.shape)
        return act_values, action

    def replay(self, batch_size: int):
        """mwis_dqn_call.py:151-186: no target net sync, memory retained."""
        import random as _random
        if len(self.memory) < batch_size:
            return None
        minibatch = _random.sample(list(self.memory), batch_size)
        loss = self.trainer.train_minibatch(minibatch)
        if self.epsilon > self.epsilon_min:
            self.epsilon *= self.epsilon_decay
        return loss


class MLPAgent(DQNAgent):
    """mwis_mlp_call.py: MLP2 Q-net over degree features (graph-blind)."""

    def __init__(self, flags: Config, memory_size: int = 5000, seed: int = 0):
        super().__init__(flags, memory_size, model_family="mlp2", seed=seed)

    def _init_params(self, key):
        n0 = self.flags.pad_to
        self.params = self.model.init(
            key, jnp.zeros((1, n0, self.flags.feature_size)))["params"]

    def makestate(self, adj, wts_nn) -> dict:
        adj = sp.csr_matrix(adj)
        n = adj.shape[0]
        deg = np.asarray((adj != 0).sum(axis=1)).flatten().astype(np.float32)
        feats = np.repeat(deg[:, None], self.flags.feature_size, axis=1)
        norm = feats.max() + 1e-9
        feats = feats / norm
        bucket = max(self.flags.pad_to,
                     -(-n // self.flags.pad_to) * self.flags.pad_to)
        padded = np.zeros((1, bucket, self.flags.feature_size), np.float32)
        padded[0, :n] = feats
        gb = GraphBatch.single(adj, np.asarray(wts_nn).flatten(),
                               pad_to=bucket)
        return {"graph": gb, "features": jnp.asarray(padded),
                "supports": None,
                "wts": np.asarray(wts_nn, dtype=np.float32).flatten(),
                "adj": adj}

    def _model_init_args(self, n0):
        return (jnp.zeros((1, n0, self.flags.feature_size)),)

    def predict(self, state):
        gb: GraphBatch = state["graph"]
        out = self._mlp_forward(self.params, state["features"], gb.mask)
        n = int(gb.nn[0])
        act_values = np.asarray(out[0, :n, :])
        return act_values, np.argmax(act_values, axis=0)

    @property
    def _mlp_forward(self):
        if not hasattr(self, "_mlp_fwd"):
            model = self.model

            @jax.jit
            def fwd(params, features, mask):
                out = model.apply({"params": params}, features)
                return out * mask[..., None]

            self._mlp_fwd = fwd
        return self._mlp_fwd


class _BsfSearch:
    """Per-graph state of the best-solution-first tree search, factored out
    of `DiverAgent.solve_mwis_bsf` so that independent instances' searches
    can run in LOCKSTEP and share device launches
    (`DiverAgent.solve_mwis_bsf_many`). Semantics identical to the inline
    loop this replaces: a heap of partial labelings nIS_vec in {-1 remain,
    0 excluded, 1 fixed} ordered best-solution-first, deepen/backoff
    children per head with probability `backoff` (mwis_dqn_test.py:59-135
    machinery; flags runtime_config.py:19-20)."""

    def __init__(self, adj_0, wts_0, max_pops, batch_pops, noout, backoff,
                 rng):
        self.adj = sp.csr_matrix(adj_0)
        self.wts = np.asarray(wts_0, dtype=np.float64).flatten()
        self.max_pops = max_pops
        self.batch_pops = batch_pops
        self.noout = noout
        self.backoff = backoff
        self.rng = rng
        root = -np.ones(self.wts.size, dtype=np.int8)
        self.heap = [(-np.inf, 0, root.tobytes())]
        self.seen = {root.tobytes()}
        self.counter = 1
        self.best_set, self.best_util = set(), -np.inf
        self.pops = 0

    @property
    def done(self) -> bool:
        return not self.heap or self.pops >= self.max_pops

    def pop_batch(self):
        """Pop up to batch_pops best-first states; complete states settle
        immediately. Returns [(nis, rem_idx, fixed_idx, fixed_util)]."""
        batch = []
        while (self.heap and len(batch) < self.batch_pops
               and self.pops < self.max_pops):
            _, _, blob = heapq.heappop(self.heap)
            nis = np.frombuffer(blob, dtype=np.int8).copy()
            self.pops += 1
            remain = nis == -1
            fixed_idx = np.nonzero(nis == 1)[0]
            fixed_util = float(self.wts[fixed_idx].sum())
            if not remain.any():
                if fixed_util > self.best_util:
                    self.best_util = fixed_util
                    self.best_set = set(fixed_idx.tolist())
                continue
            batch.append((nis, np.nonzero(remain)[0], fixed_idx,
                          fixed_util))
        return batch

    def absorb(self, batch, sels, probs_l):
        """Fold the device evaluation of `batch`'s states back in: record
        head completions as candidates, push deepen/backoff children.
        sels/probs index GLOBAL node ids (masked resident evaluation —
        rows of excluded nodes carry sel 0 / probs 0, so the head order
        and branch choices match the old subgraph-extracted evaluation
        exactly: relative id order is preserved by extraction)."""
        adj, wts = self.adj, self.wts
        for (nis, rem_idx, fixed_idx, fixed_util), sel, probs in zip(
                batch, sels, probs_l):
            order = np.argsort(-probs.max(axis=0))[: self.noout]
            for k in order:
                chosen = np.nonzero(sel[k] == 1)[0]       # global ids
                if chosen.size == 0:
                    continue
                comp = set(chosen.tolist())
                util = fixed_util + float(wts[chosen].sum())
                if util > self.best_util:
                    self.best_util = util
                    self.best_set = set(fixed_idx.tolist()) | comp
                if self.rng.random() >= self.backoff:
                    continue
                # branch on the head's highest-scored selected node
                v = int(chosen[np.argmax(probs[chosen, k])])
                # deepen: fix v in, exclude its neighbors
                child = nis.copy()
                child[v] = 1
                nbrs = adj.indices[adj.indptr[v]: adj.indptr[v + 1]]
                child[nbrs[child[nbrs] == -1]] = 0
                b = child.tobytes()
                if b not in self.seen:
                    self.seen.add(b)
                    heapq.heappush(self.heap, (-util, self.counter, b))
                    self.counter += 1
                # backoff: exclude v
                child2 = nis.copy()
                child2[v] = 0
                b2 = child2.tobytes()
                if b2 not in self.seen:
                    self.seen.add(b2)
                    heapq.heappush(self.heap, (-util, self.counter, b2))
                    self.counter += 1

    def result(self):
        if self.best_util == -np.inf:
            return set(), 0.0
        return self.best_set, float(self.best_util)


class DiverAgent(MWISSolver):
    """Diverse-head tree-search agent (re-spec of mwis_rollout_call)."""

    def __init__(self, flags: Config, memory_size: int = 5000, seed: int = 0):
        # deep_diver model emits 2*diver_num logits (diver_num 2-class heads)
        super().__init__(flags, memory_size, model_family="deep_diver",
                         seed=seed)

    def head_scores(self, state) -> np.ndarray:
        """Per-head node scores: softmax over each head's 2 logits, take the
        'in-IS' class probability (GCN_DEEP_DIVER outputs_softmax,
        gcn/models.py:398-400 — head k at the interleaved column pair
        (2k, 2k+1), class 1 = in-IS at the odd column). Returns
        [N, diver_num]."""
        gb = state["graph"]
        out = self._forward_fn(self.params, state["features"],
                               state["supports"], gb.mask)
        n = int(gb.nn[0])
        logits = np.asarray(out[0, :n, :])              # [N, 2*diver]
        d = self.flags.diver_num
        heads = logits[:, : 2 * d].reshape(n, d, 2)
        neg, pos = heads[..., 0], heads[..., 1]
        z = np.exp(pos - np.maximum(pos, neg))
        zn = np.exp(neg - np.maximum(pos, neg))
        return z / (z + zn)

    def _resident_adjs(self, adjs, bucket):
        """Upload a group's dense padded adjacencies [G, Np, Np] ONCE; per
        pop batch only [Q, Np] masks travel (the old path rebuilt a
        GraphBatch from scipy SUBGRAPH extractions every batch — the
        host-side slicing + re-upload was the bsf throughput limiter,
        VERDICT r4 weak #2). Single-graph groups are cached by content
        (the wireless DGCN-RS root pop re-presents the same conflict
        graph every slot)."""
        from distgcn_tpu.core.graph import graph_fingerprint
        if len(adjs) == 1:
            cache = getattr(self, "_bsf_adj_cache", None)
            if cache is None:
                cache = self._bsf_adj_cache = {}
            key = (graph_fingerprint(adjs[0]), bucket)
            dev = cache.get(key)
            if dev is not None:
                return dev
            if len(cache) >= 16:
                cache.pop(next(iter(cache)))
        dense = np.zeros((len(adjs), bucket, bucket), np.float32)
        for i, a in enumerate(adjs):
            a = sp.csr_matrix(a)
            n = a.shape[0]
            dense[i, :n, :n] = a.toarray()
        dev = jnp.asarray(dense)
        if len(adjs) == 1:
            cache[key] = dev
        return dev

    def _eval_heads_resident(self, adjs_dev, gidx, masks, wts_rows, ns):
        """Q states -> ONE device launch: masked supports, GCN head
        scores, and all Q x diver_num guided LGS completions. gidx maps
        each state to its graph's row of `adjs_dev`; masks/wts_rows are
        [Q, Np] host arrays (remain-mask and masked weights). Returns
        (sels: list of [D, n] int8, probs: list of [n, D]) in GLOBAL node
        ids — equivalent to evaluating the extracted subgraphs: masked
        prep renormalizes by masked degrees, the GCN is
        permutation-equivariant, and the LGS (weight, -id) tie order is
        preserved under extraction."""
        q = len(ns)
        # pad the BATCH axis to a multiple of 8: the pop count per
        # iteration varies (heap draining, searches retiring), and an
        # unpadded Q re-specializes the jitted eval per distinct value
        q_pad = -(-q // 8) * 8
        if q_pad != q:
            pad = ((0, q_pad - q), (0, 0))
            masks = np.pad(masks, pad)
            wts_rows = np.pad(wts_rows, pad)
            gidx = np.pad(gidx, (0, q_pad - q))
        sel, probs = self._bsf_eval_fn(
            self.params, adjs_dev, jnp.asarray(gidx),
            jnp.asarray(wts_rows), jnp.asarray(masks))
        sel = np.asarray(sel)                                # [Q, D, Np]
        probs = np.asarray(probs)                            # [Q, Np, D]
        return ([sel[i, :, : ns[i]] for i in range(q)],
                [probs[i, : ns[i]] for i in range(q)])

    @property
    def _bsf_eval_fn(self):
        """ONE jitted launch per pop batch: mask the resident adjacencies,
        GCN forward, per-head in-IS softmax, head-guided weights, and all
        Q x diver_num LGS completions through `batched_lgs_multi` (one
        adjacency per state shared by all diver heads). Only [Q, Np]
        masks/weights cross the tunnel per batch."""
        if not hasattr(self, "_bsf_eval"):
            from distgcn_tpu.agents import build_state_arrays
            from distgcn_tpu.ops.lgs import batched_lgs_multi
            model, flags, fmode = self.model, self.flags, self.feature_mode
            d = flags.diver_num
            bf16 = getattr(flags, "compute_dtype",
                           "float32") == "bfloat16"

            @jax.jit
            def ev(params, adjs, gidx, wts, mask):
                madj = adjs[gidx] * mask[:, :, None] * mask[:, None, :]
                bmask = mask > 0
                feats, sups = build_state_arrays(
                    madj, wts, bmask, flags.feature_size, flags.max_degree,
                    flags.predict, fmode)
                if bf16:
                    # search scoring in bf16 (native MXU dtype — same
                    # trade as pipeline.make_solve_pipeline / the bf16
                    # closed-loop episodes); guided-LGS weight math and
                    # probs stay f32 so tie-breaks are unchanged
                    feats = feats.astype(jnp.bfloat16)
                    sups = sups.astype(jnp.bfloat16)
                    params = jax.tree_util.tree_map(
                        lambda p: p.astype(jnp.bfloat16), params)
                out = model.apply({"params": params}, feats, sups)
                out = out.astype(jnp.float32)
                out = out * mask[..., None]                  # [Q, Np, 2D]
                qn, npad = wts.shape
                heads = out[..., : 2 * d].reshape(qn, npad, d, 2)
                probs = jax.nn.softmax(heads, axis=-1)[..., 1]   # [Q,Np,D]
                probs = probs * mask[..., None]   # excluded rows -> 0
                guided = (jnp.transpose(probs, (0, 2, 1))
                          * wts[:, None, :])                 # [Q, D, Np]
                sel, _, _ = batched_lgs_multi(madj, guided, bmask)
                return sel, probs

            self._bsf_eval = ev
        return self._bsf_eval

    def solve_mwis_bsf(self, adj_0, wts_0, max_pops: int = 16,
                       time_limit: float = None,
                       batch_pops: int = 4) -> Tuple[set, float]:
        """Best-solution-first tree search over partial states (re-spec of
        the missing `mwis_rollout_call.solve_mwis_iterative`; queue + backoff
        machinery visible at mwis_dqn_test.py:59-135, flags
        runtime_config.py:19-20).

        A priority queue holds partial labelings nIS_vec in {-1 remain,
        0 excluded, 1 fixed}, ordered best-solution-first by the utility of
        the completion that spawned them. Per pop, all diver heads are
        evaluated in ONE device batch on the remaining subgraph
        (`_eval_heads_on_subgraph`); each of the first `diver_out` heads
        contributes its completion as a candidate and, with probability
        `backoff_prob`, two children: (a) a DEEPEN child fixing the head's
        highest-scored selected node (graph-reduction step, the
        reduce_graph/add_rnd_q analog) and (b) a BACKOFF child excluding
        that node (the drop-the-top branch). Children accumulate — unlike
        the bounded 4-pass retry (`solve_mwis_iterative`), multi-node
        exclusions are reachable, so multi-level traps are escaped.

        Pops are processed `batch_pops` at a time: the best `batch_pops`
        states come off the heap together and their subgraphs evaluate in
        TWO device launches total (`_eval_heads_on_subgraphs`) instead of
        two per state — on a tunneled TPU the per-launch round-trip
        dominated the old one-pop loop (0.5 graphs/s, VERDICT r2 weak #4).
        batch_pops=1 recovers strict best-first order; batched order only
        differs when a pop's children would outrank the next heap entries.
        """
        import time as _time

        s = _BsfSearch(adj_0, wts_0, max_pops, batch_pops,
                       min(self.flags.diver_num, self.flags.diver_out),
                       self.flags.backoff_prob, self._rng)
        n = s.wts.size
        bucket = pad_bucket(n, self.flags.pad_to)
        adjs_dev = self._resident_adjs([s.adj], bucket)
        wfull = np.zeros(bucket, np.float32)
        wfull[:n] = s.wts
        deadline = (_time.time() + time_limit) if time_limit else None
        while not s.done:
            if deadline and _time.time() > deadline:
                break
            batch = s.pop_batch()
            if not batch:
                continue
            q = len(batch)
            masks = np.zeros((q, bucket), np.float32)
            for i, (_, ri, _, _) in enumerate(batch):
                masks[i, ri] = 1.0
            sels, probs_l = self._eval_heads_resident(
                adjs_dev, np.zeros(q, np.int32), masks,
                masks * wfull[None, :], [n] * q)
            s.absorb(batch, sels, probs_l)
        return s.result()

    def solve_mwis_bsf_many(self, insts, max_pops: int = 16,
                            time_limit: float = None,
                            batch_pops: int = 4, group: int = 4):
        """Run `group` instances' bsf searches in LOCKSTEP: each iteration
        pops up to `batch_pops` states from every active search and
        evaluates ALL their subgraphs in one `_eval_heads_on_subgraphs`
        pass, so the per-launch tunnel round-trip (and XLA dispatch) is
        amortized across graphs, not just across one graph's pops.

        Per-graph search semantics are identical to `solve_mwis_bsf` (same
        heap order, same children). Each instance gets its OWN backoff RNG
        seeded (agent seed, instance index), so per-instance results are
        bit-reproducible regardless of group size or lockstep interleaving
        — quality deltas between runs are real, not draw-order noise
        (VERDICT r3 weak #5). Finished searches retire and the next
        instance takes their slot, so the device batch stays full until
        the tail. insts: list of (adj, wts); returns a list of
        (set, util) in input order.
        """
        import time as _time

        noout = min(self.flags.diver_num, self.flags.diver_out)
        backoff = self.flags.backoff_prob
        deadline = (_time.time() + time_limit) if time_limit else None
        results = [None] * len(insts)
        todo = list(range(len(insts)))
        bucket = pad_bucket(max(np.asarray(w).size for _, w in insts),
                            self.flags.pad_to)
        active = []                                     # (idx, _BsfSearch)
        adjs_dev = None                       # rebuilt on active-set change
        self._bsf_nactive = -1
        while todo or active:
            joined = False
            while todo and len(active) < group:
                i = todo.pop(0)
                active.append((i, _BsfSearch(
                    insts[i][0], insts[i][1], max_pops, batch_pops,
                    noout, backoff,
                    np.random.default_rng((getattr(self, "_seed", 0), i)))))
                joined = True
            if joined or adjs_dev is None or self._bsf_nactive != len(active):
                # pad the graph axis to the constant `group` (zero rows for
                # empty slots): a shrinking G at the sweep tail would
                # re-specialize the jitted eval per distinct size — a fresh
                # XLA compile per retirement (review r5 #4)
                pads = [sp.csr_matrix((1, 1), dtype=np.float32)
                        ] * (group - len(active))
                adjs_dev = self._resident_adjs(
                    [s.adj for _, s in active] + pads, bucket)
                self._bsf_nactive = len(active)
                wrows = np.zeros((group, bucket), np.float32)
                for gi, (_, s) in enumerate(active):
                    wrows[gi, : s.wts.size] = s.wts
            batches = []
            gidx, masks, wl, ns = [], [], [], []
            for gi, (_, s) in enumerate(active):
                b = s.pop_batch()
                batches.append(b)
                for _, ri, _, _ in b:
                    m = np.zeros(bucket, np.float32)
                    m[ri] = 1.0
                    gidx.append(gi)
                    masks.append(m)
                    wl.append(m * wrows[gi])
                    ns.append(s.wts.size)
            if masks:
                sels, probs_l = self._eval_heads_resident(
                    adjs_dev, np.asarray(gidx, np.int32),
                    np.asarray(masks), np.asarray(wl), ns)
                o = 0
                for (_, s), b in zip(active, batches):
                    s.absorb(b, sels[o: o + len(b)], probs_l[o: o + len(b)])
                    o += len(b)
            timed_out = deadline and _time.time() > deadline
            still = []
            for idx, s in active:
                if s.done or timed_out:
                    results[idx] = s.result()
                else:
                    still.append((idx, s))
            active = still
            if timed_out:
                for idx, s in active:
                    results[idx] = s.result()
                break
        return results

    def solve_mwis_rollout_wrap(self, adj_0, wts_0, train: bool = False,
                                grd: float = 1.0) -> Tuple[set, float]:
        """Route the rollout-search entry point (DGCN-RS / CGCN-RS-Seq in
        sim/wireless.py) through the diver tree search, as the reference's
        rollout sims route through rollout_agent.solve_mwis_iterative
        (wireless_rollout_test.py:37-43). Per-timeslot scheduling wants
        bounded latency; with device-batched pops (batch_pops) 8 pops cost
        roughly the launches 4 unbatched ones did, so the per-slot budget
        runs the full max_pops=8 search (DISTGCN_SLOT_POPS overrides)."""
        pops = int(os.environ.get("DISTGCN_SLOT_POPS", "8"))
        return self.solve_mwis_bsf(adj_0, wts_0, max_pops=pops,
                                   batch_pops=pops)

    def solve_mwis_iterative(self, adj_0, wts_0, train: bool = False,
                             grd: float = 1.0) -> Tuple[set, float]:
        """Single-pass diver evaluation with the bounded 4-pass backoff
        retry (the cheap rollout path; `solve_mwis_bsf` is the full tree
        search)."""
        adj = sp.csr_matrix(adj_0)
        wts = np.asarray(wts_0, dtype=np.float64).flatten()
        n = wts.size
        state = self.makestate(adj, wts.reshape(-1, 1))
        probs = self.head_scores(state)                 # [N, D]
        d = probs.shape[1]
        # evaluate every head's guided LGS on device in one batch
        gb = state["graph"]
        padded = np.zeros((d, gb.pad_n), dtype=np.float32)
        for k in range(d):
            padded[k, :n] = probs[:, k] * wts
        adj_rep = jnp.broadcast_to(gb.adj, (d,) + gb.adj.shape[1:])
        mask_rep = jnp.broadcast_to(gb.mask, (d, gb.pad_n))
        sel, _, _ = batched_lgs(adj_rep, jnp.asarray(padded), mask_rep)
        sel = np.asarray(sel)
        best_set, best_util = set(), -np.inf
        for k in range(d):
            s = set(np.nonzero(sel[k, :n] == 1)[0].tolist())
            u = float(wts[list(s)].sum()) if s else 0.0
            if u > best_util:
                best_util, best_set = u, s
        # backoff exploration: with prob backoff_prob per extra pass, re-run
        # the best head with its top node forced out (tree-search backoff)
        rng = self._rng
        passes = 0
        while rng.random() < self.flags.backoff_prob and passes < 4:
            passes += 1
            if not best_set:
                break
            drop = max(best_set, key=lambda v: wts[v])
            w2 = padded.copy()
            w2[:, drop] = -1.0
            sel2, _, _ = batched_lgs(adj_rep, jnp.asarray(w2), mask_rep)
            sel2 = np.asarray(sel2)
            for k in range(d):
                s = set(np.nonzero(sel2[k, :n] == 1)[0].tolist())
                u = float(wts[list(s)].sum()) if s else 0.0
                if u > best_util:
                    best_util, best_set = u, s
        return best_set, best_util
