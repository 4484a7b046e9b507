from iif_tpu.data.cifar_lt import (  # noqa: F401
    ImbalancedArrays,
    img_num_per_cls,
    load_cifar,
    make_synthetic_cifar,
)
from iif_tpu.data.lt_dataset import LTDataset, LTDatasetEval  # noqa: F401
from iif_tpu.data.samplers import (  # noqa: F401
    random_epoch_order,
    balanced_epoch_order,
)
from iif_tpu.data.loader import Loader, eval_batches  # noqa: F401
