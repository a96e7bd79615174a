#!/usr/bin/env python
"""Train a scheme: python run_training.py <config.yaml|model_dir> ['key: value']..."""
from tgt_tpu.cli.execute import main

if __name__ == "__main__":
    main("train")
