from tgt_tpu.data.structural import (AddStructuralData, floyd_warshall,
                                     preprocess_graph)
from tgt_tpu.data.bins import (pack_bins, unpack_bins, pack_bins_multi,
                               unpack_bins_multi, flat_triu_indices, bins_dtype)
from tgt_tpu.data.collate import (padded_collate, stack_with_pad, pick_bucket,
                                  add_edge_mask, pad_batch_dim, DEFAULT_BUCKETS)
from tgt_tpu.data.synthetic import SyntheticDataset, make_molecule
from tgt_tpu.data.loader import (DataLoader, DistributedTrainSampler,
                                 DistributedTestSampler, slice_for_rank)

__all__ = [
    "AddStructuralData", "floyd_warshall", "preprocess_graph",
    "pack_bins", "unpack_bins", "pack_bins_multi", "unpack_bins_multi",
    "flat_triu_indices", "bins_dtype",
    "padded_collate", "stack_with_pad", "pick_bucket", "add_edge_mask",
    "pad_batch_dim", "DEFAULT_BUCKETS",
    "SyntheticDataset", "make_molecule",
    "DataLoader", "DistributedTrainSampler", "DistributedTestSampler",
    "slice_for_rank",
]
