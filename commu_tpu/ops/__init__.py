from .rel_attention import (  # noqa: F401
    build_attention_mask,
    rel_shift,
    relative_position_embedding,
)
