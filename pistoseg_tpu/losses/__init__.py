from pistoseg_tpu.losses.segmentation import (  # noqa: F401
    dice_loss,
    cross_entropy_loss,
)
from pistoseg_tpu.losses.revise import (  # noqa: F401
    multilabel_soft_margin_loss,
    adaptive_min_pooling_loss,
    max_norm,
    max_onehot,
    ecr_loss,
    rfm_l1_loss,
    revise_losses,
)
