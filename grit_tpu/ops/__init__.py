from grit_tpu.ops.posemb import sinusoid_encoding_table, masked_sin_pos_encoding  # noqa: F401
from grit_tpu.ops.msda import ms_deform_attn  # noqa: F401
