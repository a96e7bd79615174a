"""Real-data runbook rehearsal (VERDICT r2 #7): the prepare_pcqm4mv2 core
loop — SDF-supplier/SMILES alignment, record building, split wiring
(reference prepare_data.py:216-333) — executed hermetically against a
hand-built 12-molecule fixture, then round-tripped through write_dataset ->
PCQM4Mv2Dataset. When egress appears the only untested step left is the
ogb/rdkit import itself.
"""
import os

import numpy as np
import pytest

pytest.importorskip("pyarrow")

from tgt_tpu.data.pcqm import Coords, PCQM4Mv2Dataset
from tgt_tpu.data.prepare import build_pcqm_records, write_dataset
from tgt_tpu.data.structural import AddStructuralData

N_TRAIN, N_VALID, N_TEST = 8, 2, 2


class FakeConf:
    def __init__(self, coords):
        self._c = np.asarray(coords, np.float64)

    def GetPositions(self):
        return self._c


class FakeSDFMol:
    """Stands in for an rdkit mol read from pcqm4m-v2-train.sdf."""

    def __init__(self, i):
        self.i = i
        self.n = 3 + i % 4

    def GetConformer(self):
        return FakeConf(np.full((self.n, 3), float(self.i)))


class FakeSupplier:
    def __init__(self, n):
        self.mols = [FakeSDFMol(i) for i in range(n)]

    def __len__(self):
        return len(self.mols)

    def __getitem__(self, i):
        return self.mols[i]


def fake_mol2graph(mol):
    n = mol.n
    edges = np.asarray([(i, i + 1) for i in range(n - 1)]
                       + [(i + 1, i) for i in range(n - 1)], np.int64)
    return {"num_nodes": n,
            "edges": edges,
            "node_features": np.full((n, 9), mol.i % 50, np.int64),
            "edge_features": np.zeros((len(edges), 3), np.int64)}


def fake_smiles2graph(smiles):
    """OGB smiles2graph-shaped dict for the valid/test-dev path."""
    n = 2 + len(smiles) % 3
    ei = np.asarray([[i for i in range(n - 1)] + [i + 1 for i in range(n - 1)],
                     [i + 1 for i in range(n - 1)] + [i for i in range(n - 1)]])
    return {"num_nodes": n, "edge_index": ei,
            "node_feat": np.ones((n, 9), np.int64),
            "edge_feat": np.ones((ei.shape[1], 3), np.int64)}


class FakeOGB:
    """PCQM4Mv2Dataset(only_smiles=True) double: indexes to (smiles, target);
    test-dev/test-challenge targets are NaN like the real dataset. Includes a
    test-challenge split that build_pcqm_records must EXCLUDE (reference
    prepare_data.py:246-263 processes only valid and test-dev)."""

    def __init__(self, n_train=N_TRAIN, n_valid=N_VALID, n_test=N_TEST,
                 n_challenge=3):
        self.n = n_train + n_valid + n_test + n_challenge
        self.split = {
            "train": np.arange(n_train),
            "valid": np.arange(n_train, n_train + n_valid),
            "test-dev": np.arange(n_train + n_valid,
                                  n_train + n_valid + n_test),
            "test-challenge": np.arange(n_train + n_valid + n_test, self.n),
        }

    def get_idx_split(self):
        return self.split

    def __getitem__(self, i):
        hidden = (i in self.split["test-dev"]
                  or i in self.split["test-challenge"])
        target = float("nan") if hidden else float(i) / 10.0
        return f"C{'C' * (i % 3)}O", target


@pytest.fixture(scope="module")
def prepared_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("prep_rehearsal")
    removed = []

    def fake_remove_all_hs(mol):
        removed.append(mol.i)
        return mol

    records, splits = build_pcqm_records(
        FakeOGB(), FakeSupplier(N_TRAIN), fake_smiles2graph,
        mol2graph=fake_mol2graph, remove_all_hs=fake_remove_all_hs)
    write_dataset(records, str(d), coords_names=("dft",), splits=splits)
    return str(d), records, splits, removed


class TestBuildRecords:
    def test_counts_and_sources(self, prepared_dir):
        _, records, _, removed = prepared_dir
        # test-challenge molecules are excluded (reference :246-263)
        assert len(records) == N_TRAIN + N_VALID + N_TEST
        for i, r in enumerate(records):
            assert r["idx"] == i
            if i < N_TRAIN:  # SDF path carries 3D coords
                assert r["dft_coords"].shape == (r["num_nodes"], 3)
                np.testing.assert_allclose(r["dft_coords"], float(i))
            else:            # SMILES path has no DFT coords
                assert "dft_coords" not in r
        # every SDF train mol went through RemoveAllHs (reference :199)
        assert removed == list(range(N_TRAIN))

    def test_targets(self, prepared_dir):
        _, records, _, _ = prepared_dir
        assert records[0]["target"] == 0.0
        assert records[N_TRAIN]["target"] == pytest.approx(N_TRAIN / 10)
        assert np.isnan(records[-1]["target"])  # test-dev target hidden

    def test_splits_partition_and_sorted(self, prepared_dir):
        _, _, splits, _ = prepared_dir
        t3, v3 = splits["train-3d"], splits["valid-3d"]
        # sorted (reference prepare_data.py:273-274 sorts in place)
        assert np.all(np.diff(t3) > 0) and np.all(np.diff(v3) > 0)
        # exact partition of the train split
        np.testing.assert_array_equal(np.sort(np.concatenate([t3, v3])),
                                      splits["train"])

    def test_misaligned_sdf_raises(self):
        with pytest.raises(ValueError, match="does not match the OGB train"):
            build_pcqm_records(FakeOGB(), FakeSupplier(N_TRAIN - 1),
                               fake_smiles2graph, mol2graph=fake_mol2graph)


class TestRoundTrip:
    """The written artifacts load through the production dataset class —
    the actual runbook step that follows prepare_pcqm4mv2."""

    def test_train_rows_load_with_structural_transform(self, prepared_dir):
        d, _, _, _ = prepared_dir
        ds = PCQM4Mv2Dataset("train-3d", d, return_idx=True,
                             additional_columns=[Coords("dft")],
                             transforms=[AddStructuralData()])
        row = ds[0]
        n = row["num_nodes"]
        assert row["node_features"].shape == (n, 9)
        assert row["distance_matrix"].shape == (n, n)
        assert row["dft_coords"].shape == (n, 3)

    def test_valid_split_loads(self, prepared_dir):
        d, _, _, _ = prepared_dir
        ds = PCQM4Mv2Dataset("valid", d)
        assert len(ds) == N_VALID
        assert np.isfinite(ds[0]["target"])

    def test_files_exist(self, prepared_dir):
        d, _, _, _ = prepared_dir
        for f in ("records.parquet", "dft_coords.parquet", "splits.npz"):
            assert os.path.exists(os.path.join(d, f))
