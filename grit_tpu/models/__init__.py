from grit_tpu.models.captioner import GRITCaptioner, build_captioner  # noqa: F401
