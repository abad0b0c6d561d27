"""Large-scale training-data-pipeline operators beyond the reference:
dedup, similarity/ANN, text quality, sampling/mixing, packing,
components, multimodal, time series.  Convenience re-exports of the
most commonly composed entry points; the submodules remain the
canonical import path.
"""

from .components import canonical_duplicates, connected_components, pagerank
from .dedup import (
    decontaminate,
    duplicate_substring_spans,
    exact_dedup,
    fuzzy_join_edit1,
    minhash_lsh_candidate_pairs,
    ngram_jaccard_pairs,
    remove_duplicate_substrings,
    simhash_near_duplicates,
)
from .multimodal import (
    attach_media_metadata,
    audio_features,
    extract_image_features,
    image_stats,
    register_codec,
    resize_images,
    sample_video_frames,
    synthesize_png_images,
    unregister_codec,
)
from .packing import pack_sequences
from .sampling import (
    global_shuffle,
    hash_sample,
    hash_split,
    stratified_sample,
    temperature_mix,
    token_budget_mix,
    weighted_sample,
)
from .similarity import (
    brute_force_knn,
    embedding_near_duplicates,
    ivf_knn,
    ivfpq_index,
    ivfpq_knn,
    kmeans_centroids,
    pca_fit,
    pca_project,
    pq_encode,
    pq_fit,
    pq_knn,
    sq_encode,
    sq_fit,
    sq_knn,
)
from .text import (
    chunk_documents,
    document_fingerprint,
    language_id,
    quality_score,
    redact_pii,
    repetition_stats,
    tfidf_top_terms,
    token_count,
    unigram_logprob,
)
from .sketches import approx_quantiles, hll_distinct, hll_rollup
from .timeseries import asof_join, time_rollup
