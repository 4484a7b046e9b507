from iif_tpu.losses.iif import (  # noqa: F401
    IIF_VARIANTS,
    compute_iif_weights,
    IIFLoss,
)
from iif_tpu.losses.focal import FocalLoss  # noqa: F401
from iif_tpu.losses.ce import CrossEntropyLoss, softmax_cross_entropy  # noqa: F401
from iif_tpu.losses.mixup import Mixup, mixup_batch, mixup_criterion  # noqa: F401
from iif_tpu.losses.factory import get_criterion, get_deferred_weights  # noqa: F401
