from iif_tpu.detection.necks import FPN  # noqa: F401
from iif_tpu.detection.rpn import RPNHead  # noqa: F401
from iif_tpu.detection.roi_extractor import SingleRoIExtractor  # noqa: F401
from iif_tpu.detection.bbox_head import Shared2FCBBoxHead  # noqa: F401
from iif_tpu.detection.mask_head import FCNMaskHead  # noqa: F401
from iif_tpu.detection.detector import MaskRCNN  # noqa: F401
from iif_tpu.detection.losses import DetIIFLoss, load_iif_csv  # noqa: F401
from iif_tpu.detection.mask_structures import (  # noqa: F401
    BitmapMasks,
    PolygonMasks,
)
