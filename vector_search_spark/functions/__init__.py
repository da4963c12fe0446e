from .vector import cosine_similarity, dot_product, l2_norm, l2_normalize
from .scalar import relevance_label, sigmoid
from .text import (
    md5_fingerprint,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count_bpe,
    token_count_ws,
    word_shingles,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "relevance_label",
    "sigmoid",
    "md5_fingerprint",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count_bpe",
    "token_count_ws",
    "word_shingles",
]
