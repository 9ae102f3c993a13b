from .text import (
    add_token_counts,
    add_language_id,
    add_quality,
    add_fingerprint,
    add_normalized,
    normalize_text_arrow,
    LanguageId,
)
from .dedup import (
    exact_dedup,
    lsh_plan,
    minhash_signatures,
    minhash_lsh_pairs,
    minhash_similarity_join,
    tag_sides,
    simhash_pairs,
    simhash_batch,
    contamination_check,
    contamination_check_partitioned,
    ngram_jaccard,
    ngram_jaccard_exact_pairs,
    verify_pairs_ngram,
    verify_pairs_equal,
    window_hashes_batch,
    embedding_near_dup_pairs,
    connected_components,
    dedup_clusters,
)
from .similarity import (
    build_ivf_index,
    knn_brute,
    knn_ivf,
    pca_fit,
    pca_transform,
    query_ivf_index,
    train_centroids,
)
from .cleaning import (boilerplate_segments, duplicate_spans,
                       remove_duplicate_spans)
from .selection import dsir_weights, kcenter_select, train_linear_classifier
from .index import build_inverted_index, query_inverted_index, query_phrase
from .jsonfield import json_int_field, json_string_field
from .sampling import hash_split, split_assignments, weighted_sample
from .tfidf import doc_frequencies, tfidf_top_terms
from .url import add_url_parts, parse_urls, stratified_sample
from .multimodal import (
    DecodeImage,
    FakeDecode,
    ResizeNearest,
    ImageFeatures,
    decode_pipeline,
    encode_fake_image,
    decode_fake_image,
    encode_ppm,
    decode_ppm,
    encode_bmp,
    decode_bmp,
    encode_ppm_stream,
    decode_ppm_stream,
    DecodeVideo,
    encode_wav,
    decode_wav,
    DecodeAudio,
    AudioFeatures,
    audio_pipeline,
)

__all__ = [
    "add_token_counts", "add_language_id", "add_quality", "add_fingerprint",
    "add_normalized", "normalize_text_arrow",
    "LanguageId", "exact_dedup", "minhash_signatures", "minhash_lsh_pairs",
    "minhash_similarity_join", "tag_sides",
    "simhash_pairs", "simhash_batch", "ngram_jaccard",
    "ngram_jaccard_exact_pairs", "verify_pairs_ngram", "verify_pairs_equal",
    "contamination_check", "contamination_check_partitioned", "window_hashes_batch",
    "embedding_near_dup_pairs", "connected_components", "dedup_clusters",
    "duplicate_spans", "boilerplate_segments", "remove_duplicate_spans",
    "dsir_weights", "kcenter_select", "train_linear_classifier", "lsh_plan",
    "knn_brute", "knn_ivf", "train_centroids",
    "pca_fit", "pca_transform",
    "build_ivf_index", "query_ivf_index",
    "hash_split", "split_assignments", "weighted_sample",
    "build_inverted_index", "query_inverted_index", "query_phrase",
    "json_int_field", "json_string_field",
    "doc_frequencies", "tfidf_top_terms",
    "add_url_parts", "parse_urls", "stratified_sample",
    "DecodeImage", "FakeDecode", "ResizeNearest", "ImageFeatures",
    "decode_pipeline", "encode_fake_image", "decode_fake_image",
    "encode_ppm", "decode_ppm", "encode_bmp", "decode_bmp",
    "encode_ppm_stream", "decode_ppm_stream", "DecodeVideo",
    "encode_wav", "decode_wav", "DecodeAudio", "AudioFeatures",
    "audio_pipeline",
]
