from iif_tpu.engine.schedules import build_lr_schedule, build_optimizer  # noqa: F401
from iif_tpu.engine.classification import (  # noqa: F401
    TrainState,
    ClassificationTrainer,
)
