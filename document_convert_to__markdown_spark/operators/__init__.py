"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing, graph clustering — the ops a 100 TB web-text
pipeline needs beyond per-document extraction."""

from .dedup import (  # noqa: F401
    dedup_keep_first,
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_bands,
    neardup_pipeline,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from .graph import connected_components  # noqa: F401
from .multimodal import (  # noqa: F401
    media_features,
    media_metadata,
    media_resize,
    video_frame_sample,
)
from .similarity import (  # noqa: F401
    brute_force_topk,
    ivf_ann_topk,
    lsh_ann_topk,
    neardup_pairs_cosine,
    train_ivf_centroids,
)
from .charset import detect_and_decode  # noqa: F401
from .joins import (  # noqa: F401
    bloom_prune_join,
    salted_join,
)
from .retrieval import bm25_topk, rrf_fuse  # noqa: F401
from .text import (  # noqa: F401
    cleanup_chain,
    fingerprint,
    language_id,
    quality_score,
    token_stats,
    top_terms_per_lang,
    winnow_fingerprints,
)
