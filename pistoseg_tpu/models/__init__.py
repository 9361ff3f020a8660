from pistoseg_tpu.models.factory import create_segmentation_model  # noqa: F401
from pistoseg_tpu.models.efficientnet import EfficientNetEncoder  # noqa: F401
from pistoseg_tpu.models.unetpp import UnetPlusPlus  # noqa: F401
from pistoseg_tpu.models.resnet38d import ResNet38d  # noqa: F401
from pistoseg_tpu.models.wide_resnet import WideResNetClassifier  # noqa: F401
from pistoseg_tpu.models.rfm import ReviseNet  # noqa: F401
