#!/usr/bin/env python
"""Predict: python make_predictions.py <config.yaml|model_dir> ['key: value']..."""
from tgt_tpu.cli.execute import main

if __name__ == "__main__":
    main("predict")
