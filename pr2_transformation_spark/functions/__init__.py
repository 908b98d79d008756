from . import dedup, similarity, textstats, multimodal  # noqa: F401
