from iif_tpu.ops.boxes import (  # noqa: F401
    bbox_overlaps,
    delta2bbox,
    bbox2delta,
)
from iif_tpu.ops.nms import nms, batched_nms, multiclass_nms  # noqa: F401
from iif_tpu.ops.roi_align import roi_align  # noqa: F401
from iif_tpu.ops.anchors import AnchorGenerator  # noqa: F401
from iif_tpu.ops.assigner import max_iou_assign  # noqa: F401
from iif_tpu.ops.sampler import random_sample_pos_neg  # noqa: F401
