"""Packed-dataset cache round-trip tests (data/matio pack_dataset /
load_dataset_cached).

Regression: the v1 pack stored local CSR indptrs but the loader subtracted
global edge offsets, corrupting every graph after the first (scipy then
segfaults downstream on the malformed CSR). The round-trip here compares
every instance, not just the first.
"""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from conftest import random_graph
from distgcn_tpu.data.matio import (list_dataset, load_dataset_cached,
                                    load_mat, pack_dataset, save_mat)


@pytest.fixture
def dataset_dir(tmp_path, rng, monkeypatch):
    d = tmp_path / "ds"
    d.mkdir()
    monkeypatch.setenv("DISTGCN_PACK_CACHE", str(tmp_path / "packs"))
    for i in range(7):
        n = int(rng.integers(10, 80))
        a = random_graph(rng, n, 0.15)
        w = rng.random(n)
        save_mat(str(d / f"ER_n{n}_p0.15_b{i}_uni.mat"), a, w,
                 greedy_utility=np.array([[float(i)]]),
                 mwis_utility=np.array([[float(i) + 0.5]]))
    return str(d)


def test_pack_roundtrip_every_instance(dataset_dir):
    insts = load_dataset_cached(dataset_dir)   # builds the pack
    insts2 = load_dataset_cached(dataset_dir)  # loads from the pack
    files = list_dataset(dataset_dir)
    assert len(insts2) == len(files)
    for i, f in enumerate(files):
        ref = load_mat(os.path.join(dataset_dir, f))
        for got in (insts[i], insts2[i]):
            got.adj.check_format(full_check=True)
            assert got.adj.indptr.dtype == got.adj.indices.dtype
            assert np.array_equal(np.asarray(ref.adj.todense()),
                                  np.asarray(got.adj.todense()))
            assert np.allclose(ref.weights, got.weights, atol=1e-6)
            assert got.greedy_utility == pytest.approx(ref.greedy_utility)
            assert got.mwis_utility == pytest.approx(ref.mwis_utility)


def test_corrupt_pack_falls_back_to_files(dataset_dir, tmp_path):
    pack = pack_dataset(dataset_dir)
    z = dict(np.load(pack, allow_pickle=False))
    z["indptr"] = z["indptr"] + 3  # break edge offsets
    np.savez_compressed(pack, **z)
    insts = load_dataset_cached(dataset_dir)
    files = list_dataset(dataset_dir)
    assert len(insts) == len(files)
    for i, f in enumerate(files):
        ref = load_mat(os.path.join(dataset_dir, f))
        assert np.array_equal(np.asarray(ref.adj.todense()),
                              np.asarray(insts[i].adj.todense()))
    assert not os.path.isfile(pack)  # corrupt pack was evicted
