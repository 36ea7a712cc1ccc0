from mevi_spark.functions.vector import (
    code_flat,
    code_unflat,
    cosine,
    dot,
    iptol2_doc,
    iptol2_query,
    l2_dist_sq,
    l2_norm,
    neg_l2_score,
)
from mevi_spark.functions.fusion import rrf_fuse_score
from mevi_spark.functions.text import (
    char_ngrams,
    norm_text,
    norm_tokens,
    normalize_text,
    tokens,
    word_shingles,
)

__all__ = [
    "dot",
    "cosine",
    "l2_norm",
    "l2_dist_sq",
    "neg_l2_score",
    "iptol2_doc",
    "iptol2_query",
    "code_flat",
    "code_unflat",
    "rrf_fuse_score",
    "tokens",
    "norm_tokens",
    "norm_text",
    "normalize_text",
    "word_shingles",
    "char_ngrams",
]
