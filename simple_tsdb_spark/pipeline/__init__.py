"""Large-scale training-data pipeline operators (SURVEY.md §2.12).

These extend the reference's surface with the operations a 100 TB
text/embedding corpus pipeline needs: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding cosine), similarity search (brute-force
and LSH-bucketed k-NN), text analysis (token counts, quality score,
language ID, fingerprinting) and multimodal binary-column plumbing.

Every deterministic operator ships a DuckDB oracle twin (``*_oracle_sql``)
built from the same constants, so the driver's hash-compare gate covers
them bit-for-bit; all hashing is md5-based (available and identical in
both engines) rather than engine-private hash functions.
"""

from simple_tsdb_spark.pipeline.text import (
    token_counts,
    quality_score,
    repetition_stats,
    lang_id,
    fingerprint,
    tfidf_topk,
    bm25_topk,
    topk_ngrams,
    ngram_lm_score,
    gopher_rules,
    dup_ngram_chars,
    char_entropy,
    winnowing_fingerprints,
    winnowing_matches,
    dsir_logweights,
    dsir_resample,
    pii_scrub,
)
from simple_tsdb_spark.pipeline.dedup import (
    exact_dedup,
    semdedup,
    ngram_jaccard_pairs,
    minhash_lsh_pairs,
    minhash_est_jaccard,
    block_dedup,
    simhash_band_dedup,
    simhash_pairs,
    embedding_dup_pairs,
)
from simple_tsdb_spark.pipeline.export import write_training_shards
from simple_tsdb_spark.pipeline.spans import (
    boilerplate_spans,
    exact_substr_spans,
    decontaminate,
    decontaminate_pairs,
)
from simple_tsdb_spark.pipeline.curation import (
    dedup_components,
    domain_topk,
    hash_split,
    stratified_split,
    curate_corpus,
    mixture_sample,
    pack_sequences,
)
from simple_tsdb_spark.pipeline.ann_index import (
    embedding_dups_against_index,
    search_ann_index,
    write_ann_index,
)
from simple_tsdb_spark.pipeline.dedup_index import (
    append_to_minhash_index,
    dedup_against_index,
    filter_against_digest_index,
    write_digest_index,
    write_minhash_index,
)
from simple_tsdb_spark.pipeline.similarity import (
    cluster_prune,
    default_centroids,
    kmeans_clusters,
    rp_project,
    knn_rp,
    rp_signs,
    knn_brute,
    range_search,
    knn_ivf_pq,
    knn_ivf,
    knn_lsh,
    pq_codebooks,
    pq_encode,
    train_pq_codebooks,
    train_pq_codebooks_duck,
    train_ivf_centroids,
    train_ivf_centroids_duck,
)
from simple_tsdb_spark.pipeline.multimodal import (
    attach_blob,
    extract_blob_features,
    resize_images,
    sample_frames,
)
from simple_tsdb_spark.pipeline.prewarm import prewarm

__all__ = [
    "prewarm",
    "kmeans_clusters",
    "rp_project",
    "knn_rp",
    "write_ann_index",
    "search_ann_index",
    "embedding_dups_against_index",
    "write_minhash_index",
    "append_to_minhash_index",
    "dedup_against_index",
    "write_digest_index",
    "filter_against_digest_index",
    "rp_signs",
    "cluster_prune",
    "topk_ngrams",
    "ngram_lm_score",
    "gopher_rules",
    "dup_ngram_chars",
    "char_entropy",
    "winnowing_fingerprints",
    "winnowing_matches",
    "token_counts",
    "quality_score",
    "repetition_stats",
    "boilerplate_spans",
    "exact_substr_spans",
    "decontaminate",
    "decontaminate_pairs",
    "write_training_shards",
    "lang_id",
    "fingerprint",
    "tfidf_topk",
    "bm25_topk",
    "dsir_logweights",
    "dsir_resample",
    "pii_scrub",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_est_jaccard",
    "block_dedup",
    "simhash_band_dedup",
    "simhash_pairs",
    "embedding_dup_pairs",
    "semdedup",
    "dedup_components",
    "hash_split",
    "stratified_split",
    "curate_corpus",
    "domain_topk",
    "mixture_sample",
    "pack_sequences",
    "default_centroids",
    "knn_brute",
    "range_search",
    "knn_ivf_pq",
    "knn_ivf",
    "knn_lsh",
    "pq_codebooks",
    "pq_encode",
    "train_pq_codebooks",
    "train_pq_codebooks_duck",
    "train_ivf_centroids",
    "train_ivf_centroids_duck",
    "attach_blob",
    "extract_blob_features",
    "resize_images",
    "sample_frames",
]
