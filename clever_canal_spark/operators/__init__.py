from .dedup import (
    exact_dedup,
    minhash_lsh_buckets,
    minhash_signature,
    neardup_clusters,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
    simhash_wide,
)
from .ann_index import (
    ann_indexed_topk,
    apply_index_changes,
    build_ivf_index,
    build_lsh_index,
    ivf_indexed_topk,
    open_ann_index,
)
from .lww import lww_dedup, salted_lww_dedup
from .multimodal import extract_media_meta, resize_images, sample_frames
from .similarity import (
    ann_lsh_topk,
    ann_multiprobe_topk,
    brute_force_topk,
    cosine_neardup_pairs,
    embedding_norms,
    ivf_topk,
    lsh_buckets,
)
from .history import asof_join, range_join, scd2_history, sessionize
from .text import doc_fingerprint, lang_id, quality_score, token_stats

__all__ = [
    "ann_indexed_topk",
    "apply_index_changes",
    "ann_lsh_topk",
    "asof_join",
    "ann_multiprobe_topk",
    "brute_force_topk",
    "build_ivf_index",
    "build_lsh_index",
    "cosine_neardup_pairs",
    "doc_fingerprint",
    "embedding_norms",
    "exact_dedup",
    "extract_media_meta",
    "ivf_indexed_topk",
    "ivf_topk",
    "lang_id",
    "lsh_buckets",
    "lww_dedup",
    "minhash_lsh_buckets",
    "minhash_signature",
    "neardup_clusters",
    "ngram_jaccard_pairs",
    "open_ann_index",
    "quality_score",
    "range_join",
    "resize_images",
    "salted_lww_dedup",
    "sample_frames",
    "scd2_history",
    "sessionize",
    "simhash",
    "simhash_neardup_pairs",
    "simhash_wide",
    "token_stats",
]
