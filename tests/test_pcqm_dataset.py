"""PCQM parquet dataset integration: on-disk format round-trip, columns,
splits, cache ranges, and bins column."""
import json
import os

import numpy as np
import pytest

pytest.importorskip("pyarrow")

from tgt_tpu.data.bins import pack_bins_multi, bins_dtype
from tgt_tpu.data.pcqm import Bins, Coords, PCQM4Mv2Dataset
from tgt_tpu.data.prepare import train3d_split, write_synthetic_dataset
from tgt_tpu.data.structural import AddStructuralData


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pcqm")
    write_synthetic_dataset(str(d), num_samples=32, max_nodes=10, seed=0)
    return str(d)


class TestOnDiskFormat:
    def test_files_exist(self, dataset_dir):
        for f in ("records.parquet", "dft_coords.parquet",
                  "rdkit_coords.parquet", "splits.npz"):
            assert os.path.exists(os.path.join(dataset_dir, f)), f

    def test_basic_rows(self, dataset_dir):
        ds = PCQM4Mv2Dataset("train", dataset_dir, return_idx=True,
                             transforms=[AddStructuralData()])
        assert len(ds) == 24  # 75% of 32
        row = ds[0]
        n = row["num_nodes"]
        assert row["node_features"].shape == (n, 9)
        assert row["distance_matrix"].shape == (n, n)
        assert row["feature_matrix"].shape == (n, n, 3)
        assert np.isfinite(row["target"])
        assert row["idx"] == 0

    def test_split_concat(self, dataset_dir):
        tr = PCQM4Mv2Dataset("train", dataset_dir)
        va = PCQM4Mv2Dataset("valid", dataset_dir)
        both = PCQM4Mv2Dataset("train+valid", dataset_dir)
        assert len(both) == len(tr) + len(va)

    def test_coords_column(self, dataset_dir):
        ds = PCQM4Mv2Dataset("train", dataset_dir,
                             additional_columns=[Coords("dft"),
                                                 Coords("rdkit")])
        row = ds[3]
        n = row["num_nodes"]
        assert row["dft_coords"].shape == (n, 3)
        assert row["rdkit_coords"].shape == (n, 3)
        # rdkit coords are the perturbed variant, not identical
        assert not np.allclose(row["dft_coords"], row["rdkit_coords"])

    def test_cache_range_shards(self, dataset_dir):
        """Per-rank cache ranges load only the rank's contiguous shard but
        index with global offsets (reference data.py:63-83,140-141)."""
        full = PCQM4Mv2Dataset("train", dataset_dir)
        part = PCQM4Mv2Dataset("train", dataset_dir,
                               cache_range_fn=lambda n: (8, 16))
        assert part.records.num_rows == 8
        r_full = full[10]
        r_part = part[10]
        np.testing.assert_array_equal(r_full["node_features"],
                                      r_part["node_features"])

    def test_train3d_split_deterministic(self):
        idx = np.arange(1000)
        a1, b1 = train3d_split(idx, holdout=100)
        a2, b2 = train3d_split(idx, holdout=100)
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)
        assert len(b1) == 100


class TestBinsColumn:
    def test_bins_roundtrip_through_parquet(self, dataset_dir, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        # fabricate a bins prediction dir for the valid split
        ds = PCQM4Mv2Dataset("valid", dataset_dir, return_idx=True)
        s, num_bins = 3, 16
        rng = np.random.RandomState(0)
        bins_dir = tmp_path / "bins3"
        (bins_dir / "data").mkdir(parents=True)
        idxs, packed_list = [], []
        originals = {}
        for i in range(len(ds)):
            row = ds[i + ds.index_offset]
            n = row["num_nodes"]
            bins = np.triu(rng.randint(0, num_bins, (s, n, n)), 1).astype(
                bins_dtype(num_bins))
            originals[row["idx"]] = bins
            idxs.append(row["idx"])
            packed_list.append(pack_bins_multi(bins).reshape(-1))
        pq.write_table(pa.table({"idx": idxs, "bins": packed_list}),
                       bins_dir / "data" / "valid_000.parquet")
        json.dump({"num_samples": s, "num_bins": num_bins, "range_bins": 8},
                  open(bins_dir / "meta.json", "w"))

        ds2 = PCQM4Mv2Dataset("valid", dataset_dir, return_idx=True,
                              additional_columns=[Bins(str(bins_dir), s)])
        for i in range(len(ds2)):
            row = ds2[i + ds2.index_offset]
            np.testing.assert_array_equal(
                row["dist_bins"], originals[row["idx"]].astype(np.float32))

    def test_bins_join_across_rank_shards(self, dataset_dir, tmp_path):
        """Multi-host dist_pred writes one parquet shard PER RANK
        ({split}_{rank:03d}.parquet, reference dist_pred/scheme.py:256-306);
        the Bins column must join rows spread over several shard files."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        ds = PCQM4Mv2Dataset("valid", dataset_dir, return_idx=True)
        s, num_bins = 2, 16
        rng = np.random.RandomState(1)
        bins_dir = tmp_path / "bins2"
        (bins_dir / "data").mkdir(parents=True)
        rows = [ds[i + ds.index_offset] for i in range(len(ds))]
        originals = {}
        # split the rows over two "rank" shard files (interleaved, so the
        # shards are NOT contiguous in idx — the join must still line up)
        for rank in (0, 1):
            idxs, packed_list = [], []
            for row in rows[rank::2]:
                n = row["num_nodes"]
                bins = np.triu(rng.randint(0, num_bins, (s, n, n)), 1).astype(
                    bins_dtype(num_bins))
                originals[row["idx"]] = bins
                idxs.append(row["idx"])
                packed_list.append(pack_bins_multi(bins).reshape(-1))
            pq.write_table(pa.table({"idx": idxs, "bins": packed_list}),
                           bins_dir / "data" / f"valid_{rank:03d}.parquet")
        json.dump({"num_samples": s, "num_bins": num_bins, "range_bins": 8},
                  open(bins_dir / "meta.json", "w"))

        ds2 = PCQM4Mv2Dataset("valid", dataset_dir, return_idx=True,
                              additional_columns=[Bins(str(bins_dir), s)])
        assert len(ds2) == len(rows)
        for i in range(len(ds2)):
            row = ds2[i + ds2.index_offset]
            np.testing.assert_array_equal(
                row["dist_bins"], originals[row["idx"]].astype(np.float32))


class TestSchemeOnParquet:
    def test_dist_pred_scheme_runs_on_parquet(self, dataset_dir, tmp_path):
        """The dist_pred scheme trains against the parquet-backed dataset."""
        from tgt_tpu.schemes import DistPredScheme
        from tgt_tpu.training import Trainer
        over = dict(dataset_source="pcqm", dataset_path=dataset_dir,
                    save_path_prefix=str(tmp_path), model_name="pq",
                    batch_size=4, buckets=[12], model_height=2, node_width=16,
                    edge_width=8, num_heads=4, triplet_heads=2,
                    num_dist_bins=8, evaluation_samples=2, max_lr=1e-3,
                    lr_warmup_steps=2, lr_total_steps=1000,
                    coords_input="rdkit")
        scheme = DistPredScheme(over)
        trainer = Trainer(scheme)
        result = trainer.fit(num_epochs=1)
        assert np.isfinite(result["history"][-1]["val_loss"])
