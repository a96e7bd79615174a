"""Activation parity vs the reference PyTorch implementation.

The reference repo at /root/reference is used as a black-box oracle: build its
torch model with random weights, convert the state_dict with
``convert_torch_state_dict``, and require output allclose on identical inputs.
This is the strongest correctness gate available without the released HF
checkpoints (BASELINE.md requires allclose vs those; the same converter and
comparison applies once they are downloadable).

Skipped automatically if torch or the reference tree is unavailable.
"""
import functools
import sys

import jax
import numpy as np
import pytest

from tests.conftest import make_synthetic_batch
from tgt_tpu.models import TGTConfig, make_model
from tgt_tpu.models.convert import convert_torch_state_dict

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from lib.models.pcqm.distance_predictor import TGT_Distance
    from lib.models.pcqm.gap_predictor import TGT_Gap
    from lib.models.pcqm.multitask import TGT_Multi
    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference tree unavailable")


CFG = TGTConfig(node_width=32, edge_width=16, num_heads=4, model_height=3,
                triplet_heads=4, num_dist_bins=8, upto_hop=16)


def layer_kwargs(cfg, triplet_type):
    return dict(
        model_height=cfg.model_height,
        layer_multiplier=cfg.layer_multiplier,
        upto_hop=cfg.upto_hop,
        embed_3d_type=cfg.embed_3d_type,
        num_3d_kernels=cfg.num_3d_kernels,
        node_width=cfg.node_width,
        edge_width=cfg.edge_width,
        num_heads=cfg.num_heads,
        triplet_heads=cfg.triplet_heads,
        triplet_type=triplet_type,
        activation="gelu",
        scale_degree=True,
    )


def to_torch_batch(batch):
    out = {}
    for k, v in batch.items():
        t = torch.from_numpy(np.array(v))  # copy: torch rejects non-writable
        if k in ("node_features", "distance_matrix", "feature_matrix"):
            t = t.long()
        else:
            t = t.float()
        out[k] = t
    return out


def run_parity(model_name, torch_cls, cfg, triplet_type, extra_torch_kwargs=None,
               n=8, atol=2e-4):
    kwargs = layer_kwargs(cfg, triplet_type)
    if model_name == "distance":
        kwargs["num_dist_bins"] = cfg.num_dist_bins
    if model_name == "multi":
        kwargs["num_dist_bins"] = cfg.num_dist_bins
    if extra_torch_kwargs:
        kwargs.update(extra_torch_kwargs)
    torch.manual_seed(0)
    tmodel = torch_cls(**kwargs)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    cfg = cfg.replace(triplet_type=triplet_type)
    init, apply = make_model(model_name)
    template = init(jax.random.PRNGKey(0), cfg)
    params = convert_torch_state_dict(state, template, cfg)

    batch = make_synthetic_batch(jax.random.PRNGKey(0), b=2, n=n, seed=7)
    tb = to_torch_batch(batch)
    with torch.no_grad():
        t_out = tmodel(tb)

    j_out = jax.jit(functools.partial(apply, cfg=cfg))(params, batch)

    if isinstance(t_out, tuple):
        for t, j in zip(t_out, j_out):
            np.testing.assert_allclose(np.asarray(j), t.numpy(), atol=atol,
                                       rtol=1e-3)
    else:
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=atol,
                                   rtol=1e-3)


TRIPLET_TYPES = ["aggregate", "aggregate_ungated", "attention",
                 "attention_ungated", "tiangular_update", "axial_attention"]


@pytest.mark.parametrize("triplet_type", TRIPLET_TYPES)
def test_distance_parity(triplet_type):
    run_parity("distance", TGT_Distance, CFG, triplet_type)


@pytest.mark.parametrize("triplet_type", ["attention", "aggregate"])
def test_gap_parity(triplet_type):
    run_parity("gap", TGT_Gap, CFG, triplet_type)


def test_multi_parity():
    run_parity("multi", TGT_Multi, CFG, "attention")


def test_gap_parity_layer_multiplier():
    cfg = CFG.replace(layer_multiplier=2)
    run_parity("gap", TGT_Gap, cfg, "aggregate")


def test_gap_parity_fourier():
    cfg = CFG.replace(embed_3d_type="fourier")
    run_parity("gap", TGT_Gap, cfg, "attention")


def test_gap_parity_no_3d():
    cfg = CFG.replace(embed_3d_type="none", triplet_type="attention")
    # build batch without dist_input
    torch.manual_seed(0)
    tmodel = TGT_Gap(**{**layer_kwargs(cfg, "attention"), "embed_3d_type": "none"})
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    init, apply = make_model("gap")
    template = init(jax.random.PRNGKey(0), cfg)
    params = convert_torch_state_dict(state, template, cfg)
    batch = make_synthetic_batch(jax.random.PRNGKey(0), b=2, n=8, with_3d=False,
                                 seed=7)
    tb = to_torch_batch(batch)
    with torch.no_grad():
        t_out = tmodel(tb)
    j_out = jax.jit(functools.partial(apply, cfg=cfg))(params, batch)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-4,
                               rtol=1e-3)


def test_big_widths_parity():
    """Closer-to-real widths catch reshape/head-layout mistakes."""
    cfg = TGTConfig(node_width=96, edge_width=64, num_heads=8, model_height=2,
                    triplet_heads=4, num_dist_bins=16, upto_hop=16)
    run_parity("distance", TGT_Distance, cfg, "attention", n=12)


@pytest.mark.parametrize("triplet_type,layer_multiplier",
                         [("attention", 1), ("aggregate", 2)])
def test_per_layer_activation_parity(triplet_type, layer_multiplier):
    """Per-layer h/e must match the reference LAYER BY LAYER, not just at the
    output (BASELINE.md row 3; reference layers hookable at encoder.py:79-90).
    Covers both released architectures: TGT-At-style (attention, x1) and
    TGT-Agx2-style (aggregate, x2 weight sharing)."""
    cfg = CFG.replace(triplet_type=triplet_type,
                      layer_multiplier=layer_multiplier)
    kwargs = layer_kwargs(cfg, triplet_type)
    kwargs["num_dist_bins"] = cfg.num_dist_bins
    torch.manual_seed(0)
    tmodel = TGT_Distance(**kwargs)
    tmodel.eval()

    t_caps = []

    def hook(mod, inp, out):
        t_caps.append((out["h"].detach().numpy(), out["e"].detach().numpy()))

    for layer in tmodel.encoder.TGT_layers:
        layer.register_forward_hook(hook)

    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    init, apply = make_model("distance")
    template = init(jax.random.PRNGKey(0), cfg)
    params = convert_torch_state_dict(state, template, cfg)

    batch = make_synthetic_batch(jax.random.PRNGKey(0), b=2, n=8, seed=7)
    tb = to_torch_batch(batch)
    with torch.no_grad():
        tmodel(tb)

    from tgt_tpu.models.embedding import embed_input_apply
    from tgt_tpu.models.encoder import encoder_apply
    ecfg = cfg.replace(node_ended=False, edge_ended=True)
    g = embed_input_apply(params["input_embed"], batch, ecfg)
    _, j_caps = encoder_apply(params["encoder"], g, ecfg,
                              capture_intermediates=True)

    assert len(t_caps) == len(j_caps) == \
        cfg.model_height * cfg.layer_multiplier
    for li, ((th, te), (jh, je)) in enumerate(zip(t_caps, j_caps)):
        np.testing.assert_allclose(np.asarray(jh), th, atol=5e-4, rtol=1e-3,
                                   err_msg=f"h mismatch at layer app {li}")
        np.testing.assert_allclose(np.asarray(je), te, atol=5e-4, rtol=1e-3,
                                   err_msg=f"e mismatch at layer app {li}")


@pytest.mark.parametrize("triplet_type,layer_multiplier",
                         [("attention", 1), ("aggregate", 2)])
def test_flagship_width_per_layer_parity(triplet_type, layer_multiplier):
    """Per-layer parity at the PUBLISHED geometry: node 768 / edge 256 /
    64 heads / 16 triplet heads (SURVEY §6.2; configs/pcqm/tgt_at_200m/
    dist_pred/*.yaml) — the widths the 67.1 meV checkpoints use. Toy widths
    cannot catch head-packing/reshape/dtype bugs that only appear when
    head_dim and packing factors take their production values (VERDICT r2
    weak #3). 2 layers keeps runtime tractable; both released architectures
    covered (TGT-At-style attention x1, TGT-Agx2-style aggregate x2)."""
    cfg = TGTConfig(node_width=768, edge_width=256, num_heads=64,
                    model_height=2, layer_multiplier=layer_multiplier,
                    triplet_heads=16, triplet_type=triplet_type,
                    num_dist_bins=256, upto_hop=32)
    kwargs = layer_kwargs(cfg, triplet_type)
    kwargs["num_dist_bins"] = cfg.num_dist_bins
    torch.manual_seed(0)
    tmodel = TGT_Distance(**kwargs)
    tmodel.eval()

    t_caps = []

    def hook(mod, inp, out):
        t_caps.append((out["h"].detach().numpy(), out["e"].detach().numpy()))

    for layer in tmodel.encoder.TGT_layers:
        layer.register_forward_hook(hook)

    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    init, apply = make_model("distance")
    template = init(jax.random.PRNGKey(0), cfg)
    params = convert_torch_state_dict(state, template, cfg)

    batch = make_synthetic_batch(jax.random.PRNGKey(0), b=2, n=12, seed=7)
    tb = to_torch_batch(batch)
    with torch.no_grad():
        t_out = tmodel(tb)

    from tgt_tpu.models.embedding import embed_input_apply
    from tgt_tpu.models.encoder import encoder_apply
    ecfg = cfg.replace(node_ended=False, edge_ended=True)
    g = embed_input_apply(params["input_embed"], batch, ecfg)
    _, j_caps = encoder_apply(params["encoder"], g, ecfg,
                              capture_intermediates=True)

    assert len(t_caps) == len(j_caps) == \
        cfg.model_height * cfg.layer_multiplier
    # fp32 accumulation error grows ~sqrt(width); 768-dim dots need a wider
    # absolute tolerance than the toy cases (values are O(1) post-LN)
    for li, ((th, te), (jh, je)) in enumerate(zip(t_caps, j_caps)):
        np.testing.assert_allclose(np.asarray(jh), th, atol=3e-3, rtol=2e-3,
                                   err_msg=f"h mismatch at layer app {li}")
        np.testing.assert_allclose(np.asarray(je), te, atol=3e-3, rtol=2e-3,
                                   err_msg=f"e mismatch at layer app {li}")

    j_out = jax.jit(functools.partial(apply, cfg=cfg))(params, batch)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=3e-3,
                               rtol=2e-3, err_msg="final logits mismatch")


def test_indiv_config_parity():
    """Per-layer config arrays (reference TGT_Encoder.IndivConfig,
    encoder.py:25,54-56): layers with different triplet types/head counts
    must match the reference module-for-module."""
    from lib.tgt.encoder import TGT_Encoder

    tri_types = ["aggregate", "attention", "aggregate"]
    tri_heads = [2, 4, 2]
    kwargs = layer_kwargs(CFG, None)
    kwargs["triplet_type"] = TGT_Encoder.IndivConfig(tri_types)
    kwargs["triplet_heads"] = TGT_Encoder.IndivConfig(tri_heads)
    kwargs["num_dist_bins"] = CFG.num_dist_bins
    torch.manual_seed(0)
    tmodel = TGT_Distance(**kwargs)
    tmodel.eval()
    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    cfg = CFG.replace(triplet_type=tuple(tri_types),
                      triplet_heads=tuple(tri_heads))
    init, apply = make_model("distance")
    template = init(jax.random.PRNGKey(0), cfg)
    assert "indiv" in template["encoder"]
    params = convert_torch_state_dict(state, template, cfg)

    batch = make_synthetic_batch(jax.random.PRNGKey(0), b=2, n=8, seed=7)
    tb = to_torch_batch(batch)
    with torch.no_grad():
        t_out = tmodel(tb)
    j_out = jax.jit(functools.partial(apply, cfg=cfg))(params, batch)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-4,
                               rtol=1e-3)
