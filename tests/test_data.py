"""Data layer tests: structural transform, bins packing, collate, samplers."""
import numpy as np
import pytest

from tgt_tpu.data import (AddStructuralData, DataLoader,
                          DistributedTestSampler, DistributedTrainSampler,
                          SyntheticDataset, add_edge_mask, bins_dtype,
                          flat_triu_indices, floyd_warshall, pack_bins,
                          pack_bins_multi, padded_collate, pick_bucket,
                          pad_batch_dim, preprocess_graph, slice_for_rank,
                          stack_with_pad, unpack_bins, unpack_bins_multi)


def slow_floyd_warshall(adj):
    """Direct transliteration of the reference algorithm as an oracle."""
    n = adj.shape[0]
    d = np.zeros((n, n), np.int64)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d[i, j] = 1 if adj[i, j] else 510
    for k in range(n):
        for i in range(n):
            for j in range(n):
                nd = d[i, k] + d[k, j]
                if nd < d[i, j]:
                    d[i, j] = nd
    return d


class TestStructural:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_floyd_warshall_vs_oracle(self, seed):
        rs = np.random.RandomState(seed)
        n = 12
        adj = (rs.rand(n, n) < 0.15).astype(np.int16)
        np.testing.assert_array_equal(floyd_warshall(adj),
                                      slow_floyd_warshall(adj))

    def test_unreachable_510(self):
        adj = np.zeros((4, 4), np.int16)
        adj[0, 1] = adj[1, 0] = 1
        d = floyd_warshall(adj)
        assert d[0, 1] == 1 and d[0, 2] == 510 and d[0, 0] == 0

    def test_preprocess_offsets(self):
        edges = np.array([[0, 1], [1, 0]])
        nf = np.array([[2, 3], [4, 5]], np.int16)
        ef = np.array([[1, 2], [1, 2]], np.int16)
        node_out, dist, emat = preprocess_graph(2, edges, nf, ef)
        # feat + 1 + k*offset
        np.testing.assert_array_equal(node_out,
                                      [[3, 3 + 129], [5, 5 + 129]])
        np.testing.assert_array_equal(emat[0, 1], [2, 2 + 9])
        assert emat[0, 0].sum() == 0  # no self edge
        assert dist[0, 1] == 1

    def test_transform_keys(self):
        ds = SyntheticDataset(num_samples=4, seed=1)
        row = ds[0]
        for k in ("node_features", "distance_matrix", "feature_matrix",
                  "node_mask", "target", "dft_coords"):
            assert k in row, k
        n = row["num_nodes"]
        assert row["distance_matrix"].shape == (n, n)
        assert row["feature_matrix"].shape == (n, n, 3)


class TestBins:
    def test_roundtrip(self):
        rs = np.random.RandomState(0)
        n = 9
        m = np.triu(rs.randint(0, 255, (n, n)), k=1).astype(np.uint8)
        packed = pack_bins(m)
        assert packed.shape == (n * (n - 1) // 2,)
        np.testing.assert_array_equal(unpack_bins(packed, n), m)

    def test_roundtrip_multi(self):
        rs = np.random.RandomState(0)
        s, n = 5, 7
        m = np.triu(rs.randint(0, 255, (s, n, n)), k=1).astype(np.uint16)
        np.testing.assert_array_equal(unpack_bins_multi(pack_bins_multi(m), n), m)

    def test_triu_indices_match_reference_order(self):
        """Row-major strict-upper order (reference bin_ops.py:5-15)."""
        n = 5
        idx = flat_triu_indices(n)
        expected = [i * n + j for i in range(n) for j in range(i + 1, n)]
        np.testing.assert_array_equal(idx, expected)

    def test_dtype_choice(self):
        assert bins_dtype(256) == np.uint8
        assert bins_dtype(512) == np.uint16


class TestCollate:
    def test_bucketing(self):
        assert pick_bucket(10) == 16
        assert pick_bucket(16) == 16
        assert pick_bucket(17) == 24
        assert pick_bucket(100) == 100  # oversize passes through

    def test_stack_with_pad(self):
        a = np.ones((3, 2))
        b = np.ones((5, 2))
        out = stack_with_pad([a, b], pad_to={0: 8})
        assert out.shape == (2, 8, 2)
        assert out[0, 3:].sum() == 0

    def test_padded_collate_static_shapes(self):
        ds = SyntheticDataset(num_samples=8, min_nodes=4, max_nodes=12, seed=0)
        batch = padded_collate([ds[i] for i in range(4)], buckets=(16, 32))
        assert batch["node_features"].shape == (4, 16, 9)
        assert batch["distance_matrix"].shape == (4, 16, 16)
        assert batch["feature_matrix"].shape == (4, 16, 16, 3)
        assert batch["node_mask"].shape == (4, 16)

    def test_reference_mode_per_batch_max(self):
        ds = SyntheticDataset(num_samples=8, min_nodes=4, max_nodes=12, seed=0)
        rows = [ds[i] for i in range(4)]
        batch = padded_collate(rows, buckets=None)
        max_n = max(r["num_nodes"] for r in rows)
        assert batch["node_features"].shape == (4, max_n, 9)

    def test_edge_mask(self):
        batch = {"node_mask": np.array([[1, 1, 0]], np.uint8)}
        out = add_edge_mask(batch)
        np.testing.assert_array_equal(out["edge_mask"][0],
                                      [[1, 1, 0], [1, 1, 0], [0, 0, 0]])

    def test_pad_batch_dim(self):
        batch = {"x": np.ones((3, 4))}
        out, mask = pad_batch_dim(batch, 8)
        assert out["x"].shape == (8, 4)
        np.testing.assert_array_equal(mask, [1, 1, 1, 0, 0, 0, 0, 0])


class TestSamplers:
    def test_slices_cover_everything(self):
        length, world = 103, 8
        seen = []
        for r in range(world):
            s, e = slice_for_rank(length, r, world)
            seen.extend(range(s, e))
        assert sorted(seen) == list(range(length))

    def test_train_sampler_equal_length(self):
        samplers = [DistributedTrainSampler(103, 4, rank=r, world_size=8)
                    for r in range(8)]
        lens = [sum(1 for _ in s) for s in samplers]
        assert len(set(lens)) == 1

    def test_train_sampler_epoch_shuffle(self):
        s = DistributedTrainSampler(64, 8, rank=0, world_size=1)
        s.set_epoch(0)
        a = [i for b in s for i in b]
        s.set_epoch(1)
        b = [i for bb in s for i in bb]
        assert a != b
        assert sorted(a) == sorted(b)

    def test_test_sampler_partitions(self):
        all_idx = []
        for r in range(4):
            all_idx.extend(i for b in DistributedTestSampler(50, 8, r, 4)
                           for i in b)
        assert sorted(all_idx) == list(range(50))

    def test_loader_prefetch(self):
        ds = SyntheticDataset(num_samples=16, seed=0)
        sampler = DistributedTrainSampler(len(ds), 4, shuffle=False)
        dl = DataLoader(ds, sampler, buckets=(16, 32), num_threads=2)
        batches = list(dl)
        assert len(batches) == 4
        assert all("edge_mask" in b for b in batches)

    def test_loader_propagates_errors(self):
        ds = SyntheticDataset(num_samples=8, seed=0)
        sampler = DistributedTrainSampler(len(ds), 4, shuffle=False)

        def bad_post(batch):
            raise RuntimeError("boom")

        dl = DataLoader(ds, sampler, post_fn=bad_post, num_threads=2)
        with pytest.raises(RuntimeError, match="boom"):
            list(dl)


class TestNative:
    """C++ extension (csrc/tgt_native.cpp) parity with the numpy paths."""

    @pytest.fixture(scope="class")
    def native(self):
        return pytest.importorskip("tgt_tpu.data._native")

    def test_floyd_warshall_parity(self, native):
        rs = np.random.RandomState(0)
        for n in (5, 17, 40):
            adj = (rs.rand(n, n) < 0.2).astype(np.int16)
            np.testing.assert_array_equal(native.floyd_warshall(adj),
                                          floyd_warshall(adj))

    def test_preprocess_parity(self, native):
        rs = np.random.RandomState(1)
        edges = np.array([[0, 1], [1, 0], [1, 2], [2, 1]], np.int64)
        nf = rs.randint(0, 50, (3, 9)).astype(np.int16)
        ef = rs.randint(0, 5, (4, 3)).astype(np.int16)
        import tgt_tpu.data.structural as st
        saved = st._native
        st._native = False  # force numpy path for the oracle
        try:
            expected = preprocess_graph(3, edges, nf, ef)
        finally:
            st._native = saved
        got = native.preprocess_graph(3, edges, nf, ef)
        for g, e in zip(got, expected):
            np.testing.assert_array_equal(g, e)

    def test_bins_roundtrip_parity(self, native):
        rs = np.random.RandomState(2)
        m = np.triu(rs.randint(0, 255, (5, 9, 9)), 1).astype(np.uint8)
        np.testing.assert_array_equal(native.pack_bins_multi(m),
                                      pack_bins_multi(m))
        np.testing.assert_array_equal(
            native.unpack_bins_multi(pack_bins_multi(m), 9), m)

    def test_stack_with_pad_parity(self, native):
        rs = np.random.RandomState(3)
        for shapes in ([(3,), (5,)], [(3, 2), (5, 2)],
                       [(3, 4, 2), (5, 3, 2)], [(2, 3, 3, 4), (4, 2, 2, 4)]):
            arrs = [rs.randn(*s).astype(np.float32) for s in shapes]
            np.testing.assert_array_equal(native.stack_with_pad(arrs),
                                          stack_with_pad(arrs))
            np.testing.assert_array_equal(
                native.stack_with_pad(arrs, {0: 8}),
                stack_with_pad(arrs, pad_to={0: 8}))


class TestSizeBucketedSampler:
    def _sizes(self):
        rs = np.random.RandomState(0)
        return rs.randint(4, 30, size=100)

    def test_covers_all_indices_once(self):
        from tgt_tpu.data.loader import SizeBucketedTrainSampler
        sizes = self._sizes()
        s = SizeBucketedTrainSampler(sizes, 8, buckets=(8, 16, 24, 32))
        got = sorted(i for b in s for i in b)
        assert got == list(range(100))

    def test_batches_are_size_homogeneous(self):
        from tgt_tpu.data.loader import SizeBucketedTrainSampler
        from tgt_tpu.data.collate import pick_bucket
        sizes = self._sizes()
        buckets = (8, 16, 24, 32)
        s = SizeBucketedTrainSampler(sizes, 8, buckets=buckets)
        for batch in s:
            bks = {pick_bucket(int(sizes[i]), buckets) for i in batch}
            assert len(bks) == 1

    def test_padding_reduction(self):
        """Size-bucketed batching must produce fewer padded pair-entries
        than random batching on a skewed size distribution."""
        from tgt_tpu.data.loader import (DistributedTrainSampler,
                                         SizeBucketedTrainSampler)
        from tgt_tpu.data.collate import pick_bucket
        buckets = (8, 16, 24, 32)
        sizes = self._sizes()

        def padded_pairs(sampler):
            total = 0
            for batch in sampler:
                bucket = pick_bucket(max(int(sizes[i]) for i in batch),
                                     buckets)
                total += len(batch) * bucket * bucket
            return total

        rand = padded_pairs(DistributedTrainSampler(100, 8, shuffle=True))
        bucketed = padded_pairs(SizeBucketedTrainSampler(sizes, 8, buckets))
        assert bucketed < rand * 0.8

    def test_rank_partition(self):
        from tgt_tpu.data.loader import SizeBucketedTrainSampler
        sizes = self._sizes()
        seen = []
        for r in range(4):
            s = SizeBucketedTrainSampler(sizes, 8, buckets=(16, 32),
                                         rank=r, world_size=4)
            seen.extend(i for b in s for i in b)
        assert sorted(set(seen)) == list(range(100))

    def test_scheme_integration(self, tmp_path):
        from tgt_tpu.schemes import PretrainScheme
        over = dict(dataset_source="synthetic", synth_train_samples=16,
                    synth_val_samples=8, synth_max_nodes=12, batch_size=4,
                    buckets=[8, 12], model_height=2, node_width=16,
                    edge_width=8, num_heads=4, triplet_heads=2,
                    num_dist_bins=8, size_bucketed_batching=True,
                    save_path_prefix=str(tmp_path))
        scheme = PretrainScheme(over)
        loader = scheme.train_loader(0, 0, 1)
        shapes = {b["node_features"].shape[1] for b in loader}
        assert shapes <= {8, 12}


class TestTinyMolecules:
    def test_single_atom_molecules_finite(self):
        """1-3 atom molecules (no edges for n=1) survive the structural
        transform, collate, and a full model forward with finite outputs
        (PCQM's long tail includes very small molecules)."""
        import functools
        import jax
        from tgt_tpu.data import DataLoader, DistributedTrainSampler
        from tgt_tpu.models import TGTConfig, make_model

        ds = SyntheticDataset(num_samples=8, min_nodes=1, max_nodes=3, seed=0)
        cfg = TGTConfig(node_width=16, edge_width=8, num_heads=4,
                        model_height=2, triplet_heads=2,
                        triplet_type="attention", num_dist_bins=8)
        init, apply = make_model("gap")
        params = init(jax.random.PRNGKey(0), cfg)
        japply = jax.jit(functools.partial(apply, cfg=cfg))
        for batch in DataLoader(ds, DistributedTrainSampler(len(ds), 4, 0, 1),
                                buckets=(4,)):
            batch["dist_input"] = np.linalg.norm(
                batch["dft_coords"][:, :, None] - batch["dft_coords"][:, None],
                axis=-1)
            feed = {k: batch[k] for k in
                    ("node_features", "distance_matrix", "feature_matrix",
                     "node_mask", "edge_mask", "dist_input")}
            out = japply(params, feed)
            assert np.isfinite(np.asarray(out)).all()
