from hama_spark.extensions.dedup import (
    dedup_embedding,
    dedup_exact,
    dedup_near,
    embedding_cosine_dup_pairs,
    minhash_lsh_dup_pairs,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
)
from hama_spark.extensions.multimodal import (
    extract_audio_features,
    extract_image_features,
    sample_frames,
)
from hama_spark.extensions.pipeline import clean_corpus, corpus_stats
from hama_spark.extensions.sampling import (
    global_shuffle,
    interleave_datasets,
    pack_sequences,
    ranked_by,
    seeded_sample,
    stratified_sample,
)
from hama_spark.extensions.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_cosine_dup_pairs,
    lsh_cosine_topk,
)
from hama_spark.extensions.text import (
    bpe_token_count,
    doc_fingerprint,
    lang_id,
    text_stats,
    token_count,
    tokenize,
    winnow_fingerprints,
)

__all__ = [
    "dedup_exact",
    "dedup_near",
    "dedup_embedding",
    "minhash_lsh_dup_pairs",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
    "embedding_cosine_dup_pairs",
    "cosine_topk",
    "lsh_cosine_topk",
    "lsh_cosine_dup_pairs",
    "ivf_topk",
    "extract_image_features",
    "extract_audio_features",
    "sample_frames",
    "clean_corpus",
    "corpus_stats",
    "seeded_sample",
    "stratified_sample",
    "global_shuffle",
    "ranked_by",
    "interleave_datasets",
    "pack_sequences",
    "tokenize",
    "token_count",
    "bpe_token_count",
    "text_stats",
    "lang_id",
    "doc_fingerprint",
    "winnow_fingerprints",
]
