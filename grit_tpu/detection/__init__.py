from grit_tpu.detection.losses import SetCriterion, hungarian_match  # noqa: F401
from grit_tpu.detection.postprocess import postprocess  # noqa: F401
