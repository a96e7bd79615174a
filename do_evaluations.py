#!/usr/bin/env python
"""Evaluate: python do_evaluations.py <config.yaml|model_dir> ['key: value']..."""
from tgt_tpu.cli.execute import main

if __name__ == "__main__":
    main("evaluate")
