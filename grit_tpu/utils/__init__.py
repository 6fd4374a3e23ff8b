from grit_tpu.utils.nested import ImageBatch, batch_images  # noqa: F401
from grit_tpu.utils import boxes  # noqa: F401
