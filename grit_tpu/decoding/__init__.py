from grit_tpu.decoding.beam_search import beam_search, greedy_search  # noqa: F401
