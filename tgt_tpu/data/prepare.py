"""Offline dataset preparation -> records.parquet / coords parquets / splits.npz.

Capability-parity with the reference prep scripts
(lib/data/pcqm/prepare_data.py:119-362, prepare_rdkit_coords.py:121-263):

- ``prepare_pcqm4mv2``: OGB SDF + SMILES -> graph records (atom/bond feature
  vectors), DFT coords, HOMO-LUMO targets; the train-3d/valid-3d holdout uses
  ``train_test_split(test_size=78606, random_state=777777)`` exactly
  (prepare_data.py:269-277) so splits match the reference bit-for-bit.
- ``prepare_rdkit_coords``: 40 ETKDG conformers + MMFF optimize, keep the
  minimum-energy one; 2D-coords fallback on embedding failure.

Both are import-gated on ogb/rdkit (not installed in every environment). The
on-disk format (also produced by ``write_dataset`` from any record iterator,
used with the synthetic generator for hermetic pipeline tests):

  records.parquet: idx, num_nodes, edges (flat i,j pairs), node_features
                   (flat, 9/atom), edge_features (flat, 3/bond), target
  {name}_coords.parquet: idx, {name}_coords (flat xyz)
  splits.npz: train / valid / test-dev / train-3d / valid-3d index arrays
"""
from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional

import numpy as np

TRAIN3D_HOLDOUT = 78606
TRAIN3D_SEED = 777777


def train3d_split(train_indices: np.ndarray,
                  holdout: int = TRAIN3D_HOLDOUT,
                  seed: int = TRAIN3D_SEED):
    """Deterministic train-3d/valid-3d holdout matching the reference
    (sklearn train_test_split with random_state=777777, then SORTED —
    prepare_data.py:270-274 sorts both index arrays in place before saving,
    so bit-for-bit splits.npz parity requires the sort)."""
    from sklearn.model_selection import train_test_split
    tr, va = train_test_split(train_indices, test_size=holdout,
                              random_state=seed)
    return np.sort(np.asarray(tr)), np.sort(np.asarray(va))


def write_dataset(records: Iterable[Dict], out_dir: str,
                  coords_names: Iterable[str] = ("dft",),
                  splits: Optional[Dict[str, np.ndarray]] = None) -> None:
    """Write records + coords parquets + splits.npz in the dataset format."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    cols: Dict[str, List] = {"idx": [], "num_nodes": [], "edges": [],
                             "node_features": [], "edge_features": [],
                             "target": []}
    coord_cols = {name: {"idx": [], f"{name}_coords": []}
                  for name in coords_names}
    for i, rec in enumerate(records):
        idx = rec.get("idx", i)
        cols["idx"].append(idx)
        cols["num_nodes"].append(int(rec["num_nodes"]))
        cols["edges"].append(np.asarray(rec["edges"], np.int64)
                             .reshape(-1).tolist())
        cols["node_features"].append(np.asarray(rec["node_features"], np.int64)
                                     .reshape(-1).tolist())
        cols["edge_features"].append(np.asarray(rec["edge_features"], np.int64)
                                     .reshape(-1).tolist())
        t = rec.get("target")
        cols["target"].append(None if t is None or
                              (isinstance(t, float) and np.isnan(t)) else
                              float(t))
        for name in coords_names:
            key = f"{name}_coords"
            if key in rec:
                coord_cols[name]["idx"].append(idx)
                coord_cols[name][key].append(
                    np.asarray(rec[key], np.float32).reshape(-1).tolist())

    pq.write_table(pa.table(cols), os.path.join(out_dir, "records.parquet"))
    for name in coords_names:
        if coord_cols[name]["idx"]:
            pq.write_table(pa.table(coord_cols[name]),
                           os.path.join(out_dir, f"{name}_coords.parquet"))
    if splits is not None:
        np.savez(os.path.join(out_dir, "splits.npz"),
                 **{k: np.asarray(v) for k, v in splits.items()})


def write_synthetic_dataset(out_dir: str, num_samples: int = 64,
                            max_nodes: int = 16, seed: int = 0) -> None:
    """Produce a synthetic dataset in the exact on-disk format, for hermetic
    end-to-end tests of the parquet-backed pipeline."""
    from tgt_tpu.data.synthetic import make_molecule
    rs = np.random.RandomState(seed)
    records = []
    for i in range(num_samples):
        n = int(rs.randint(4, max_nodes + 1))
        records.append({**make_molecule(rs, n), "idx": i})
    idx = np.arange(num_samples)
    n_train = int(num_samples * 0.75)
    train = idx[:n_train]
    valid = idx[n_train:]
    hold = max(1, n_train // 8)
    splits = {
        "train": train, "valid": valid, "test-dev": valid,
        "train-3d": train[:-hold], "valid-3d": train[-hold:],
    }
    write_dataset(records, out_dir, coords_names=("dft", "rdkit"),
                  splits=splits)


# ---------------------------------------------------------------------------
# real PCQM4Mv2 preparation (gated on ogb / rdkit)
# ---------------------------------------------------------------------------

def prepare_pcqm4mv2(raw_dir: str, out_dir: str) -> None:
    """OGB PCQM4Mv2 -> dataset format (reference prepare_data.py:119-333)."""
    try:
        from ogb.lsc import PCQM4Mv2Dataset as OGBDataset
        from ogb.utils import smiles2graph
        from rdkit import Chem
    except ImportError as e:
        raise ImportError(
            "prepare_pcqm4mv2 needs ogb and rdkit (not installed in this "
            "environment); download data/PCQM from the reference release or "
            "run on a machine with ogb+rdkit") from e

    ogb_ds = OGBDataset(root=raw_dir, only_smiles=True)
    sdf_path = os.path.join(raw_dir, "pcqm4m-v2-train.sdf")
    supplier = Chem.SDMolSupplier(sdf_path, removeHs=True)
    records, splits = build_pcqm_records(ogb_ds, supplier, smiles2graph,
                                         remove_all_hs=Chem.RemoveAllHs)
    write_dataset(records, out_dir, coords_names=("dft",), splits=splits)


def build_pcqm_records(ogb_ds, supplier, smiles2graph, mol2graph=None,
                       remove_all_hs=None):
    """Core prep loop with injectable deps (hermetically rehearsed against a
    hand-built SDF-like fixture in tests/test_rdkit_prep.py).

    Reference semantics (prepare_data.py:174-279):
    - train molecules come from the SDF supplier IN ORDER and must align
      1:1 with the OGB train split (assert at :237); each SDF mol gets
      ``Chem.RemoveAllHs`` (:199) so non-removable explicit hydrogens are
      stripped exactly like the reference (pass it as ``remove_all_hs``);
    - ONLY the valid and test-dev splits are built from SMILES (:246-263) —
      test-challenge molecules are never featurized;
    - train-3d/valid-3d = sorted train_test_split(78606 @ 777777).
    Returns (records list, splits dict) for ``write_dataset``.
    """
    split = ogb_ds.get_idx_split()
    n_sdf = len(supplier)
    train_idx = np.asarray(split["train"])
    if not np.array_equal(train_idx, np.arange(n_sdf)):
        raise ValueError(
            f"SDF molecule count/order ({n_sdf}) does not match the OGB "
            f"train split ({len(train_idx)} idx) — reference "
            f"prepare_data.py:237 asserts exact alignment")

    mol2graph = mol2graph or _mol2graph
    records = []
    for i in range(n_sdf):  # train molecules come from the SDF (3D)
        mol = supplier[i]
        if remove_all_hs is not None:
            mol = remove_all_hs(mol)
        g = mol2graph(mol)
        g["dft_coords"] = np.asarray(
            mol.GetConformer().GetPositions(), np.float32)
        _, target = ogb_ds[i]
        g["idx"] = i
        g["target"] = target
        records.append(g)
    for key in ("valid", "test-dev"):  # SMILES path; test-challenge excluded
        for idx in np.asarray(split[key]):
            smiles, target = ogb_ds[int(idx)]
            g = _ogb_graph(smiles2graph(smiles))
            g["idx"] = int(idx)
            g["target"] = target
            records.append(g)

    # real PCQM has 3,378,606 train molecules; scale the holdout down for
    # fixture-sized inputs so the rehearsal path is identical
    holdout = TRAIN3D_HOLDOUT if len(train_idx) > TRAIN3D_HOLDOUT \
        else max(1, len(train_idx) // 4)
    train3d, valid3d = train3d_split(train_idx, holdout=holdout)
    splits = {"train": train_idx,
              "valid": np.asarray(split["valid"]),
              "test-dev": np.asarray(split["test-dev"]),
              "train-3d": train3d, "valid-3d": valid3d}
    return records, splits


def _ogb_graph(g) -> Dict:
    return {"num_nodes": int(g["num_nodes"]),
            "edges": np.asarray(g["edge_index"]).T,
            "node_features": np.asarray(g["node_feat"]),
            "edge_features": np.asarray(g["edge_feat"])}


def _mol2graph(mol) -> Dict:
    from ogb.utils.features import atom_to_feature_vector, bond_to_feature_vector
    node_feats = np.asarray([atom_to_feature_vector(a)
                             for a in mol.GetAtoms()], np.int64)
    edges, edge_feats = [], []
    for b in mol.GetBonds():
        i, j = b.GetBeginAtomIdx(), b.GetEndAtomIdx()
        f = bond_to_feature_vector(b)
        edges += [(i, j), (j, i)]
        edge_feats += [f, f]
    return {"num_nodes": mol.GetNumAtoms(),
            "edges": np.asarray(edges, np.int64).reshape(-1, 2),
            "node_features": node_feats,
            "edge_features": np.asarray(edge_feats, np.int64).reshape(-1, 3)}


def select_min_energy_conf(opt_results) -> int:
    """Index of the conformer to keep from MMFFOptimizeMoleculeConfs output.

    The reference (prepare_rdkit_coords.py:139) takes
    ``min(enumerate(res), key=lambda x: x[1])`` over the (not_converged,
    energy) tuples — tuple order means a CONVERGED conformer (flag 0) always
    beats a non-converged one (flag 1), then lowest energy wins."""
    if not opt_results:
        raise ValueError("no conformers to select from")
    index, _ = min(enumerate(opt_results), key=lambda x: x[1])
    return index


def mol_to_rdkit_coords(mol, num_confs: int = 40, *, chem=None,
                        allchem=None) -> np.ndarray:
    """3D coordinates for one molecule via ETKDG + MMFF.

    Reference semantics (prepare_rdkit_coords.py:121-150):
    - AddHs -> EmbedMultipleConfs(numConfs=40) -> MMFFOptimizeMoleculeConfs
      -> RemoveHs -> keep the min-(converged, energy) conformer;
    - ANY exception falls back to Compute2DCoords on the original mol;
    - a leading dummy atom (atomic number 0) yields all-zero coords;
    - coords truncated to the heavy-atom count, float32.

    ``chem``/``allchem`` are injectable for hermetic tests; default to the
    real rdkit modules."""
    if chem is None or allchem is None:
        from rdkit import Chem as chem
        from rdkit.Chem import AllChem as allchem
    try:
        new_mol = chem.AddHs(mol)
        allchem.EmbedMultipleConfs(new_mol, numConfs=num_confs, numThreads=0)
        res = allchem.MMFFOptimizeMoleculeConfs(new_mol, numThreads=0)
        new_mol = chem.RemoveHs(new_mol)
        conf = new_mol.GetConformer(id=select_min_energy_conf(res))
    except Exception:
        new_mol = mol
        allchem.Compute2DCoords(new_mol)
        conf = new_mol.GetConformer()

    n = new_mol.GetNumAtoms()
    if new_mol.GetAtomWithIdx(0).GetAtomicNum() == 0:
        return np.zeros((n, 3), np.float32)
    return np.asarray(conf.GetPositions())[:n].astype(np.float32)


def prepare_rdkit_coords(raw_dir: str, out_dir: Optional[str] = None,
                         num_confs: int = 40,
                         progress: bool = True) -> str:
    """ETKDG conformer generation for every PCQM4Mv2 molecule ->
    ``rdkit_coords.parquet`` (reference prepare_rdkit_coords.py:153-263).

    Train molecules come from the OGB SDF (H-stripped, then re-embedded);
    valid/test-dev molecules from their SMILES. Requires rdkit + ogb.
    Returns the parquet path.
    """
    try:
        from ogb.lsc import PCQM4Mv2Dataset as OGBDataset
        from rdkit import Chem
        from rdkit.Chem import AllChem
    except ImportError as e:
        raise ImportError(
            "prepare_rdkit_coords needs ogb and rdkit (not installed in "
            "this environment)") from e
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = out_dir or raw_dir
    os.makedirs(out_dir, exist_ok=True)

    def track(it, desc):
        if not progress:
            return it
        try:
            from tqdm import tqdm
            return tqdm(it, desc=desc)
        except ImportError:
            return it

    idx_col: List[int] = []
    coords_col: List[List[float]] = []

    # training split: molecules from the SDF, all Hs removed first
    # (reference process_sdf, prepare_rdkit_coords.py:153-183)
    sdf_path = os.path.join(raw_dir, "pcqm4m-v2-train.sdf")
    for i, mol in enumerate(track(Chem.SDMolSupplier(sdf_path), "sdf")):
        mol = Chem.RemoveAllHs(mol)
        idx_col.append(i)
        coords_col.append(mol_to_rdkit_coords(
            mol, num_confs, chem=Chem, allchem=AllChem).ravel().tolist())

    # valid/test-dev: molecules from SMILES (reference process_dataset,
    # prepare_rdkit_coords.py:186-223) — same index alignment guard
    dataset = OGBDataset(root=raw_dir, only_smiles=True)
    split = dataset.get_idx_split()
    if not np.array_equal(np.asarray(split["train"]), np.asarray(idx_col)):
        raise ValueError("SDF molecule order does not match the OGB train "
                         "split (reference prepare_rdkit_coords.py:205)")
    for name in ("valid", "test-dev"):
        for idx in track(split[name], name):
            smiles, _ = dataset[int(idx)]
            mol = Chem.MolFromSmiles(smiles)
            idx_col.append(int(idx))
            coords_col.append(mol_to_rdkit_coords(
                mol, num_confs, chem=Chem, allchem=AllChem).ravel().tolist())

    path = os.path.join(out_dir, "rdkit_coords.parquet")
    pq.write_table(pa.table({"idx": idx_col, "rdkit_coords": coords_col}),
                   path)
    return path
