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
    if mtype == "DETR":
        from iif_tpu.detection.detr import DETR
        from iif_tpu.detection.single_stage import SSTestCfg, SSTrainCfg

        kw.pop("cls_predictor", None)
        kw.pop("mask_predictor", None)
        kw["num_query"] = model_cfg.get("num_query", 100)
        return DETR(**kw), SSTrainCfg, SSTestCfg
    if mtype in ("RetinaNet", "FCOS", "ATSS", "SSD", "YOLOX", "YOLOV3",
                 "CenterNet", "GFL", "FSAF", "FOVEA", "YOLOF",
                 "RepPointsDetector", "VFNet", "SparseRCNN",
                 "DeformableDETR", "YOLACT", "CornerNet", "AutoAssign",
                 "NASFCOS", "PAA", "FreeAnchor", "GARetinaNet",
                 "CentripetalNet"):
        from iif_tpu.detection.atss import ATSS
        from iif_tpu.detection.autoassign import AutoAssign
        from iif_tpu.detection.centripetal import CentripetalNet
        from iif_tpu.detection.free_anchor import FreeAnchor
        from iif_tpu.detection.guided_anchor import GARetinaNet
        from iif_tpu.detection.nasfcos import NASFCOS
        from iif_tpu.detection.paa import PAA
        from iif_tpu.detection.centernet import CenterNet
        from iif_tpu.detection.cornernet import CornerNet
        from iif_tpu.detection.fovea import FoveaBox
        from iif_tpu.detection.fsaf import FSAF
        from iif_tpu.detection.gfl import GFL
        from iif_tpu.detection.reppoints import RepPoints
        from iif_tpu.detection.deformable_detr import DeformableDETR
        from iif_tpu.detection.sparse_rcnn import SparseRCNN
        from iif_tpu.detection.vfnet import VFNet
        from iif_tpu.detection.yolact import YOLACT
        from iif_tpu.detection.yolof import YOLOF
        from iif_tpu.detection.single_stage import (
            FCOS,
            RetinaNet,
            SSTestCfg,
            SSTrainCfg,
        )
        from iif_tpu.detection.ssd import SSD
        from iif_tpu.detection.yolov3 import YOLOV3
        from iif_tpu.detection.yolox import YOLOX

        kw.pop("cls_predictor", None)
        kw.pop("mask_predictor", None)
        cls = {"RetinaNet": RetinaNet, "FCOS": FCOS, "ATSS": ATSS,
               "SSD": SSD, "YOLOX": YOLOX, "YOLOV3": YOLOV3,
               "CenterNet": CenterNet, "GFL": GFL, "FSAF": FSAF,
               "FOVEA": FoveaBox, "YOLOF": YOLOF,
               "RepPointsDetector": RepPoints, "VFNet": VFNet,
               "SparseRCNN": SparseRCNN,
               "DeformableDETR": DeformableDETR, "YOLACT": YOLACT,
               "CornerNet": CornerNet, "AutoAssign": AutoAssign,
               "NASFCOS": NASFCOS, "PAA": PAA,
               "FreeAnchor": FreeAnchor,
               "GARetinaNet": GARetinaNet,
               "CentripetalNet": CentripetalNet}[mtype]
        if mtype == "SparseRCNN":
            for extra in ("num_proposals", "num_dii_stages"):
                if extra in model_cfg:
                    kw[extra] = model_cfg[extra]
        if mtype == "SSD":
            kw["input_size"] = model_cfg.get("input_size", 300)
        elif mtype == "YOLOX":
            kw["deepen"] = model_cfg.get("deepen", 0.33)
            kw["widen"] = model_cfg.get("widen", 0.5)
        return cls(**kw), SSTrainCfg, SSTestCfg
    if mtype in ("CascadeMaskRCNN", "CascadeRCNN"):
        # reference cascade_rcnn.py registers type='CascadeRCNN' for the
        # box-only and mask variants alike (with_mask comes from the
        # roi_head config); accept both spellings.
        from iif_tpu.detection.cascade import CascadeMaskRCNN

        return CascadeMaskRCNN(**kw), DetTrainCfg, DetTestCfg
    if mtype in ("HybridTaskCascade", "HTC"):
        from iif_tpu.detection.htc import HTC

        return HTC(**kw), DetTrainCfg, DetTestCfg
    if mtype == "PointRend":
        from iif_tpu.detection.point_rend import PointRend

        return PointRend(**kw), DetTrainCfg, DetTestCfg
    if mtype == "PanopticFPN":
        from iif_tpu.detection.panoptic import PanopticFPN

        return PanopticFPN(**kw), DetTrainCfg, DetTestCfg
    if mtype == "TridentFasterRCNN":
        from iif_tpu.detection.trident import TridentFasterRCNN

        for k in ("cls_predictor", "mask_predictor"):
            kw.pop(k, None)
        kw.setdefault("with_mask", False)
        return TridentFasterRCNN(**kw), DetTrainCfg, DetTestCfg
    if mtype == "DetectoRS":
        from iif_tpu.detection.detectors_rs import DetectoRS

        return DetectoRS(**kw), DetTrainCfg, DetTestCfg
    if mtype == "SCNet":
        from iif_tpu.detection.scnet import SCNet

        return SCNet(**kw), DetTrainCfg, DetTestCfg
    if mtype == "GridRCNN":
        from iif_tpu.detection.grid_rcnn import GridRCNN

        kw.setdefault("with_mask", False)
        return GridRCNN(**kw), DetTrainCfg, DetTestCfg
    if mtype == "RPN":
        from iif_tpu.detection.rpn_detector import RPNDetector

        for k in ("cls_predictor", "mask_predictor", "with_mask"):
            kw.pop(k, None)
        return RPNDetector(**kw), DetTrainCfg, DetTestCfg
    if mtype == "LD":
        # LD student = GFL; the frozen GFL teacher is built by the
        # trainer CLI from model.teacher_* (kd_one_stage.py, configs/ld)
        from iif_tpu.detection.gfl import GFL
        from iif_tpu.detection.single_stage import SSTestCfg, SSTrainCfg

        for k in ("cls_predictor", "mask_predictor", "teacher_depth",
                  "teacher_ckpt"):
            kw.pop(k, None)
        return GFL(**kw), SSTrainCfg, SSTestCfg
    if mtype == "FasterRCNNC4":
        from iif_tpu.detection.c4 import C4FasterRCNN

        for k in ("cls_predictor", "mask_predictor"):
            kw.pop(k, None)
        return C4FasterRCNN(**kw), DetTrainCfg, DetTestCfg
    if mtype == "CascadeRPN":
        from iif_tpu.detection.cascade_rpn import CascadeRPN

        for k in ("cls_predictor", "mask_predictor", "with_mask"):
            kw.pop(k, None)
        return CascadeRPN(**kw), DetTrainCfg, DetTestCfg
    # MaskRCNN variants (reference faster_rcnn.py / fast_rcnn.py /
    # mask_scoring_rcnn.py are all TwoStageDetector configs)
    if mtype == "FasterRCNN":
        kw["with_mask"] = False
    elif mtype == "FastRCNN":
        kw.setdefault("with_mask", False)
        kw["with_rpn"] = False
    elif mtype == "MaskScoringRCNN":
        kw["with_mask_iou"] = True
    elif mtype != "MaskRCNN":
        # never silently fall back to MaskRCNN: an unknown/typo'd type
        # would otherwise train the wrong architecture without warning
        raise ValueError(
            f"build_detector: unknown model type {mtype!r} "
            "(see iif_tpu/detection/__init__.py for the registry)")
    return MaskRCNN(**kw), DetTrainCfg, DetTestCfg
