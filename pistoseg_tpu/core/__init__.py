from pistoseg_tpu.core.config import Config, DatasetProfile, DATASET_PROFILES  # noqa: F401
from pistoseg_tpu.core.prng import key_chain, fold_in_str  # noqa: F401
