from pistoseg_tpu.metrics.miou import (  # noqa: F401
    confusion_matrix,
    iou_from_confusion,
    MIoUAccumulator,
)
