"""Relational + training-data operators (reference §2.5-§2.8 plus the
scale extensions: near-dup, similarity search, text analysis)."""

from commercepulse_data_pipeline_spark.operators.dedup import (
    duplicate_clusters,
    exact_dedup,
    idempotent_append,
    keep_first,
    last_writer_wins,
    minhash_bands,
    minhash_candidate_pairs,
    minhash_signature,
    minhash_signature_table,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidate_pairs,
    simhash_table,
    word_shingles,
)
from commercepulse_data_pipeline_spark.operators.joins import (
    anti_join,
    asof_join,
    enrich,
    orphans,
    semi_join,
)
from commercepulse_data_pipeline_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from commercepulse_data_pipeline_spark.operators.similarity import (
    cosine,
    cosine_topk,
    ivf_assign,
    ivf_topk,
    knn_join,
    lsh_topk,
)
from commercepulse_data_pipeline_spark.operators.text import (
    bpe_ish_tokens,
    detect_language,
    quality_score,
    rolling_fingerprints,
    token_count,
    tokens,
    with_text_stats,
)
from commercepulse_data_pipeline_spark.operators.windows import (
    running_total,
    session_stats,
    sessionize,
    top_n_per_group,
)

__all__ = [
    "anti_join",
    "asof_join",
    "bpe_ish_tokens",
    "cosine",
    "cosine_topk",
    "detect_language",
    "duplicate_clusters",
    "enrich",
    "exact_dedup",
    "idempotent_append",
    "ivf_assign",
    "ivf_topk",
    "keep_first",
    "knn_join",
    "last_writer_wins",
    "lsh_topk",
    "minhash_bands",
    "minhash_candidate_pairs",
    "minhash_signature",
    "minhash_signature_table",
    "ngram_jaccard_pairs",
    "orphans",
    "quality_score",
    "rolling_fingerprints",
    "running_total",
    "salted_agg",
    "salted_join",
    "semi_join",
    "session_stats",
    "sessionize",
    "simhash",
    "simhash_candidate_pairs",
    "simhash_table",
    "token_count",
    "tokens",
    "top_n_per_group",
    "with_text_stats",
    "word_shingles",
]
