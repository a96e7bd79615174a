"""Multi-device sharding tests on the virtual 8-CPU mesh.

Validates that GSPMD data parallelism and edge-block pair sharding compute
the SAME numbers as single-device execution — the correctness contract of
parallel/mesh.py (replaces the reference's 'tested only by running it'
multi-node story, SURVEY.md §4).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.conftest import make_synthetic_batch
from tgt_tpu.models import TGTConfig, make_model
from tgt_tpu.parallel import (DATA_AXIS, PAIR_AXIS, make_mesh, replicated,
                              shard_batch)

CFG = TGTConfig(node_width=32, edge_width=16, num_heads=4, model_height=2,
                triplet_heads=2, triplet_type="attention", num_dist_bins=8)


@pytest.fixture(scope="module")
def model_and_batch(rng):
    init, apply = make_model("distance")
    params = init(rng, CFG)
    batch = make_synthetic_batch(rng, b=8, n=8)
    return init, apply, params, batch


class TestMesh:
    def test_devices_available(self):
        assert len(jax.devices()) == 8

    def test_mesh_shapes(self):
        m = make_mesh()
        assert m.shape == {"data": 8, "pair": 1}
        m2 = make_mesh(num_data=4, num_pair=2)
        assert m2.shape == {"data": 4, "pair": 2}

    def test_bad_mesh_raises(self):
        with pytest.raises(ValueError):
            make_mesh(num_data=3, num_pair=2)


class TestDataParallel:
    def test_dp_matches_single_device(self, model_and_batch):
        init, apply, params, batch = model_and_batch
        fn = jax.jit(functools.partial(apply, cfg=CFG))
        expected = fn(params, batch)

        mesh = make_mesh(num_data=8, num_pair=1)
        sb = shard_batch(mesh, batch)
        sp = jax.device_put(params, replicated(mesh))
        got = jax.jit(functools.partial(apply, cfg=CFG))(sp, sb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)

    def test_dp_gradients_match(self, model_and_batch):
        init, apply, params, batch = model_and_batch

        def loss(p, b):
            return (apply(p, b, CFG) ** 2).mean()

        g_single = jax.jit(jax.grad(loss))(params, batch)

        mesh = make_mesh(num_data=8, num_pair=1)
        sb = shard_batch(mesh, batch)
        sp = jax.device_put(params, replicated(mesh))
        g_sharded = jax.jit(jax.grad(loss))(sp, sb)
        for a, b_ in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)


class TestPairSharding:
    def test_pair_sharded_forward_matches(self, model_and_batch):
        """Edge-block sharding over the pair axis must not change results —
        XLA inserts the all-gathers for the triplet contractions."""
        init, apply, params, batch = model_and_batch
        fn = jax.jit(functools.partial(apply, cfg=CFG))
        expected = fn(params, batch)

        mesh = make_mesh(num_data=4, num_pair=2)
        sb = shard_batch(mesh, batch, pair_shard=True)
        sp = jax.device_put(params, replicated(mesh))
        got = jax.jit(functools.partial(apply, cfg=CFG))(sp, sb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)

    def test_pair_sharded_train_step(self, model_and_batch):
        """Full loss+grad under (data, pair) sharding stays finite and equal."""
        init, apply, params, batch = model_and_batch

        def loss(p, b):
            return (apply(p, b, CFG) ** 2).mean()

        g_single = jax.jit(jax.grad(loss))(params, batch)
        mesh = make_mesh(num_data=2, num_pair=4)
        sb = shard_batch(mesh, batch, pair_shard=True)
        sp = jax.device_put(params, replicated(mesh))
        g = jax.jit(jax.grad(loss))(sp, sb)
        for a, b_ in zip(jax.tree.leaves(g_single), jax.tree.leaves(g)):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)


class TestTrainerMesh:
    """The PRODUCTION training path must train GSPMD-sharded: Trainer builds
    the (data, pair) mesh and its jitted step runs over it (VERDICT r1 #1 —
    the reference trains DDP on every invocation, execute.py:61-146)."""

    def _run(self, tmp_path, subdir, **mesh_overrides):
        from tgt_tpu.schemes import PretrainScheme
        from tgt_tpu.training import Trainer
        over = dict(dataset_source="synthetic", model_height=2, node_width=32,
                    edge_width=16, num_heads=4, triplet_heads=2,
                    triplet_type="attention", num_dist_bins=16,
                    batch_size=8, synth_train_samples=16, synth_val_samples=8,
                    synth_max_nodes=8, buckets=[8], lr_warmup_steps=2,
                    lr_total_steps=100, num_epochs=2, evaluation_samples=2,
                    drop_path=0.1, node_act_dropout=0.1,
                    save_path_prefix=str(tmp_path / subdir), trial_run=True)
        over.update(mesh_overrides)
        scheme = PretrainScheme(over)
        trainer = Trainer(scheme)
        result = trainer.fit()
        return trainer, result

    def test_fit_sharded_matches_unsharded(self, tmp_path):
        _, base = self._run(tmp_path, "single", use_mesh=False)
        tr_dp, dp = self._run(tmp_path, "dp", use_mesh=True,
                              num_pair_devices=1)
        assert tr_dp.mesh is not None
        assert tr_dp.mesh.shape == {"data": 8, "pair": 1}
        for lb, ld in zip(base["history"], dp["history"]):
            assert abs(lb["loss"] - ld["loss"]) < 1e-4
            assert abs(lb["val_loss"] - ld["val_loss"]) < 1e-4
        for a, b in zip(jax.tree.leaves(base["state"]["params"]),
                        jax.tree.leaves(dp["state"]["params"])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)

    def test_fit_pair_sharded_matches_unsharded(self, tmp_path):
        """(4 data x 2 pair) mesh: edge-block partitioning through the
        production train step."""
        _, base = self._run(tmp_path, "single2", use_mesh=False)
        tr, pp = self._run(tmp_path, "dp_pair", use_mesh=True,
                           num_pair_devices=2)
        assert tr.mesh.shape == {"data": 4, "pair": 2}
        for lb, ld in zip(base["history"], pp["history"]):
            assert abs(lb["loss"] - ld["loss"]) < 1e-4
        for a, b in zip(jax.tree.leaves(base["state"]["params"]),
                        jax.tree.leaves(pp["state"]["params"])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)


class TestGraftEntry:
    def test_dryrun_multichip_inprocess(self):
        """The driver's multichip validation path (8 virtual devices)."""
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)
