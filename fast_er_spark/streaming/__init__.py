from .dedup_stream import (  # noqa: F401
    streaming_dup_rate,
    streaming_exact_dedup,
    streaming_near_dup,
)

__all__ = ["streaming_exact_dedup", "streaming_dup_rate", "streaming_near_dup"]
