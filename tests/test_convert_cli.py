"""Checkpoint-converter CLI round trip (runbook step 4).

Builds a tiny reference torch model, saves its state_dict the way the
released checkpoints ship (model_state.pt), runs the `python -m
tgt_tpu.models.convert` entry point, and verifies the resulting .npz loads
and produces the same outputs as the in-process converter.
"""
import sys

import jax
import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from lib.models.pcqm.distance_predictor import TGT_Distance
    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference tree unavailable")

HPARAMS = dict(model_height=2, node_width=32, edge_width=16, num_heads=4,
               triplet_heads=2, triplet_type="aggregate", num_dist_bins=8,
               upto_hop=16)


def test_convert_cli_round_trip(tmp_path, monkeypatch):
    torch.manual_seed(0)
    tmodel = TGT_Distance(
        layer_multiplier=1, embed_3d_type="gaussian", num_3d_kernels=8,
        activation="gelu", scale_degree=True, **HPARAMS)
    ckpt = tmp_path / "model_state.pt"
    torch.save(tmodel.state_dict(), str(ckpt))

    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"scheme": "pcqm.dist_pred", "num_3d_kernels": 8,
                        "save_path_prefix": str(tmp_path), **HPARAMS}, f)

    out = tmp_path / "converted.npz"
    monkeypatch.setattr(sys, "argv", ["convert", str(ckpt), str(out),
                                      "--config", str(cfg_path)])
    from tgt_tpu.models import convert as convert_mod
    convert_mod.main()
    assert out.exists()

    # the CLI artifact must equal the in-process conversion
    from tgt_tpu.models import make_model
    from tgt_tpu.schemes import get_scheme
    from tgt_tpu.training.checkpoint import load_pytree
    scheme = get_scheme("pcqm.dist_pred")(
        {"scheme": "pcqm.dist_pred", "num_3d_kernels": 8,
         "save_path_prefix": str(tmp_path), **HPARAMS})
    init, _ = make_model("distance")
    template = init(jax.random.PRNGKey(0), scheme.model_cfg)
    loaded, _, _ = load_pytree(template, str(out))

    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    expect = convert_mod.convert_torch_state_dict(state, template,
                                                  scheme.model_cfg)
    for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
