from grit_tpu.data.vocab import Vocab  # noqa: F401
from grit_tpu.data.tokenizer import caption_tokenize  # noqa: F401
from grit_tpu.data.field import TextField  # noqa: F401
