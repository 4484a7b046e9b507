from iif_tpu.utils.metrics import SmoothedValue, MetricLogger, accuracy_topk  # noqa: F401
