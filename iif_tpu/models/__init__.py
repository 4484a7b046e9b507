from iif_tpu.models.layers import (  # noqa: F401
    NormedLinear,
    CosNormClassifier,
    SEBlock,
    make_classifier_head,
)
from iif_tpu.models.resnet_cifar import (  # noqa: F401
    ResNetS,
    resnet20,
    resnet32,
    se_resnet32,
    resnet44,
    resnet56,
    resnet110,
    resnet1202,
)
from iif_tpu.models.resnet import (  # noqa: F401
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x8d,
    wide_resnet50_2,
    wide_resnet101_2,
    se_resnet50,
    se_resnext50_32x4d,
)
from iif_tpu.models.factory import build_classifier  # noqa: F401
