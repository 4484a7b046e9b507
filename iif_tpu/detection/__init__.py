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


def build_detector(model_cfg: dict):
    """Config dict -> (flax detector module, train_cfg factory,
    test_cfg factory). The single registry point the CLIs dispatch
    through (reference ``build_detector``, mmdet/models/builder.py)."""
    from iif_tpu.detection.detector import (
        DetTestCfg,
        DetTrainCfg,
        MaskRCNN,
        model_kwargs_from_cfg,
    )

    mtype = model_cfg.get("type", "MaskRCNN")
    kw = model_kwargs_from_cfg(model_cfg)
    if mtype in ("RetinaNet", "FCOS"):
        from iif_tpu.detection.single_stage import (
            FCOS,
            RetinaNet,
            SSTestCfg,
            SSTrainCfg,
        )

        kw.pop("cls_predictor", None)
        kw.pop("mask_predictor", None)
        cls = RetinaNet if mtype == "RetinaNet" else FCOS
        return cls(**kw), SSTrainCfg, SSTestCfg
    if mtype == "CascadeMaskRCNN":
        from iif_tpu.detection.cascade import CascadeMaskRCNN

        return CascadeMaskRCNN(**kw), DetTrainCfg, DetTestCfg
    return MaskRCNN(**kw), DetTrainCfg, DetTestCfg
