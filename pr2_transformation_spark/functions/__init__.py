from . import (  # noqa: F401
    dedup,
    linkage,
    multimodal,
    scoring,
    selection,
    similarity,
    sketches,
    textstats,
    tokenizer,
    web,
)
