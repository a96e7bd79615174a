#!/bin/bash
# Download the prepared PCQM4Mv2 dataset (same artifacts the reference uses;
# the on-disk format matches tgt_tpu/data/pcqm.py expectations directly).
# Alternatively, regenerate from OGB with:
#   python -c "from tgt_tpu.data.prepare import prepare_pcqm4mv2; prepare_pcqm4mv2('raw/', 'data/PCQM')"
set -e
mkdir -p data/PCQM
cd data/PCQM

BASE=https://huggingface.co/datasets/shamim-hussain/pcqm/resolve/main
# split indices (train / valid / test-dev / test-challenge / train-3d / valid-3d)
wget -O splits.npz           "$BASE/splits.npz?download=true"
# molecular graphs: OGB-spec node/edge features, edge lists
wget -O records.parquet      "$BASE/records.parquet?download=true"
# DFT ground-truth coordinates (distance-predictor targets)
wget -O dft_coords.parquet   "$BASE/dft_coords.parquet?download=true"
# RDKit ETKDG+MMFF coordinates (distance-predictor inputs for *_rdkit configs)
wget -O rdkit_coords.parquet "$BASE/rdkit_coords.parquet?download=true"
