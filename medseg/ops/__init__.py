from medseg.ops.losses import dice_loss, dice_ce_loss, softmax_ce_with_label_indices
from medseg.ops.post import (
    argmax_onehot,
    to_onehot,
    sigmoid_threshold,
    convert_brats_labels_to_multichannel,
    multichannel_to_label_map,
)
from medseg.ops.ranking import (
    gather_partition_slices,
    pairwise_channel_cosine,
    triplet_index_table,
    bt_ranking_loss,
    info_nce_loss,
)
from medseg.ops.augment import augment_batch, scale_intensity_range_device
from medseg.ops.metrics import (
    DiceAccumulator,
    ConfusionAccumulator,
    HausdorffAccumulator,
    hausdorff_distance,
)
from medseg.ops.sliding_window import (
    SlidingWindowSpec,
    compute_window_starts,
    gaussian_importance,
    constant_importance,
    sliding_window_inference,
)

__all__ = [
    "dice_loss",
    "dice_ce_loss",
    "softmax_ce_with_label_indices",
    "argmax_onehot",
    "to_onehot",
    "sigmoid_threshold",
    "convert_brats_labels_to_multichannel",
    "multichannel_to_label_map",
    "gather_partition_slices",
    "pairwise_channel_cosine",
    "triplet_index_table",
    "bt_ranking_loss",
    "info_nce_loss",
    "augment_batch",
    "scale_intensity_range_device",
    "DiceAccumulator",
    "ConfusionAccumulator",
    "HausdorffAccumulator",
    "hausdorff_distance",
    "SlidingWindowSpec",
    "compute_window_starts",
    "gaussian_importance",
    "constant_importance",
    "sliding_window_inference",
]
