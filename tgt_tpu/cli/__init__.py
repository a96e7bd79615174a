from tgt_tpu.cli.execute import execute, configs_from_args, main

__all__ = ["execute", "configs_from_args", "main"]
