"""Test environment: force CPU with 8 virtual devices for sharding tests.

Must run before jax is imported anywhere. The container's sitecustomize sets
JAX_PLATFORMS=axon (real TPU tunnel); tests run on a virtual CPU mesh instead
so they are hermetic and exercise multi-device paths without hardware
(SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import warnings

# the torch-oracle parity tests import the reference's TorchScript modules;
# torch.jit's deprecation notice is external noise, not ours
warnings.filterwarnings(
    "ignore", message=r"`torch\.jit\.script` is deprecated",
    category=DeprecationWarning)

import jax  # noqa: E402

# The container's sitecustomize activates an axon TPU-tunnel backend whose
# hooks override env-based platform selection and ignore
# xla_force_host_platform_device_count. Config updates after import win:
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


def make_synthetic_batch(rng, b=2, n=8, with_3d=True, num_bins=None, seed=0):
    """A random padded molecular batch with the model's input schema."""
    import jax.numpy as jnp
    import numpy as np
    rs = np.random.RandomState(seed)
    node_counts = rs.randint(3, n + 1, size=b)
    node_counts[0] = n  # ensure at least one full-size graph
    node_mask = np.zeros((b, n), np.float32)
    for i, c in enumerate(node_counts):
        node_mask[i, :c] = 1
    # offset encoding: k-th node feature lives in [1 + k*128, 128 + k*128],
    # k-th edge feature in [1 + k*8, 8 + k*8]; 0 = padding
    # (reference: lib/data/pcqm/structural_transform.py:31-35)
    nodef = np.stack([rs.randint(1, 33, size=(b, n)) + k * 128
                      for k in range(9)], axis=-1)
    featm = np.stack([rs.randint(1, 8, size=(b, n, n)) + k * 8
                      for k in range(3)], axis=-1)
    nodef *= node_mask[..., None].astype(nodef.dtype)
    batch = {
        "node_features": nodef,
        "distance_matrix": rs.randint(0, 34, size=(b, n, n)),
        "feature_matrix": featm,
        "node_mask": node_mask,
    }
    if with_3d:
        coords = rs.randn(b, n, 3).astype(np.float32) * 2
        d = np.linalg.norm(coords[:, :, None] - coords[:, None, :], axis=-1)
        batch["dist_input"] = d
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["edge_mask"] = batch["node_mask"][:, :, None] * batch["node_mask"][:, None, :]
    return batch
