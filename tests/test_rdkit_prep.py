"""RDKit conformer-prep logic (reference prepare_rdkit_coords.py:121-150).

rdkit is not installed in the hermetic environment, so the selection /
fallback / dummy-atom semantics are exercised against an injected fake
chemistry toolkit; the full pipeline has a skipif-rdkit integration test.
"""
import numpy as np
import pytest

from tgt_tpu.data.prepare import (mol_to_rdkit_coords,
                                  select_min_energy_conf)


class FakeConf:
    def __init__(self, coords):
        self._coords = np.asarray(coords, np.float64)

    def GetPositions(self):
        return self._coords


class FakeAtom:
    def __init__(self, z):
        self._z = z

    def GetAtomicNum(self):
        return self._z


class FakeMol:
    def __init__(self, atomic_nums, confs=None):
        self.atomic_nums = list(atomic_nums)
        self.confs = confs or {}

    def GetNumAtoms(self):
        return len(self.atomic_nums)

    def GetAtomWithIdx(self, i):
        return FakeAtom(self.atomic_nums[i])

    def GetConformer(self, id=0):
        return self.confs[id]


class FakeChem:
    """AddHs appends 2 hydrogens; RemoveHs strips them again (and keeps the
    conformers, truncation happens in mol_to_rdkit_coords)."""

    @staticmethod
    def AddHs(mol):
        return FakeMol(mol.atomic_nums + [1, 1], dict(mol.confs))

    @staticmethod
    def RemoveHs(mol):
        heavy = [z for z in mol.atomic_nums if z != 1]
        return FakeMol(heavy, dict(mol.confs))


def fake_allchem(opt_results, conf_coords, fallback_coords=None,
                 embed_raises=False):
    """AllChem double: EmbedMultipleConfs attaches `conf_coords[i]` as
    conformer i; MMFFOptimizeMoleculeConfs returns `opt_results`."""

    class A:
        @staticmethod
        def EmbedMultipleConfs(mol, numConfs, numThreads):
            if embed_raises:
                raise RuntimeError("embedding failed")
            for i, c in enumerate(conf_coords):
                mol.confs[i] = FakeConf(c)

        @staticmethod
        def MMFFOptimizeMoleculeConfs(mol, numThreads):
            return opt_results

        @staticmethod
        def Compute2DCoords(mol):
            mol.confs[0] = FakeConf(fallback_coords)

    return A


class TestSelectMinEnergy:
    def test_lowest_energy_wins(self):
        assert select_min_energy_conf([(0, 5.0), (0, 1.0), (0, 3.0)]) == 1

    def test_converged_beats_lower_energy_unconverged(self):
        # tuple comparison: (0, 9.0) < (1, -100.0) — exactly the reference's
        # min(enumerate(res), key=lambda x: x[1]) semantics
        assert select_min_energy_conf([(1, -100.0), (0, 9.0)]) == 1

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            select_min_energy_conf([])


class TestMolToCoords:
    def test_success_picks_min_energy_and_truncates(self):
        n = 3
        confs = [np.full((n + 2, 3), float(i)) for i in range(3)]
        mol = FakeMol([6] * n)
        out = mol_to_rdkit_coords(
            mol, num_confs=3, chem=FakeChem,
            allchem=fake_allchem([(0, 7.0), (0, 2.0), (1, 0.5)], confs))
        assert out.shape == (n, 3)          # hydrogens truncated
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, 1.0)  # conformer 1: min converged

    def test_embed_failure_falls_back_to_2d(self):
        mol = FakeMol([6, 8])
        fb = np.asarray([[1.0, 2.0, 0.0], [3.0, 4.0, 0.0]])
        out = mol_to_rdkit_coords(
            mol, num_confs=3, chem=FakeChem,
            allchem=fake_allchem([], [], fallback_coords=fb,
                                 embed_raises=True))
        np.testing.assert_allclose(out, fb)

    def test_optimizer_empty_falls_back_to_2d(self):
        # MMFF returning [] trips select_min_energy_conf -> fallback path
        mol = FakeMol([6, 8])
        fb = np.zeros((2, 3)) + 9.0
        out = mol_to_rdkit_coords(
            mol, num_confs=3, chem=FakeChem,
            allchem=fake_allchem([], [np.ones((4, 3))], fallback_coords=fb))
        np.testing.assert_allclose(out, fb)

    def test_dummy_leading_atom_yields_zeros(self):
        mol = FakeMol([0, 6], {0: FakeConf(np.ones((4, 3)))})
        out = mol_to_rdkit_coords(
            mol, num_confs=2, chem=FakeChem,
            allchem=fake_allchem([(0, 1.0)], [np.ones((4, 3))]))
        np.testing.assert_allclose(out, 0.0)
        assert out.shape == (2, 3)


def test_real_rdkit_ethanol():  # pragma: no cover — runs only with rdkit
    pytest.importorskip("rdkit", reason="rdkit not installed")
    from rdkit import Chem
    mol = Chem.MolFromSmiles("CCO")
    out = mol_to_rdkit_coords(mol, num_confs=4)
    assert out.shape == (3, 3)
    assert np.linalg.norm(out[0] - out[1]) > 0.5  # a real bond length
