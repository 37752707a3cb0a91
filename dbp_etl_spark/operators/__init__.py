"""Reusable relational + training-data operators.

Everything here is built from JVM-side DataFrame primitives (no Python
in the hot path) unless explicitly noted; each operator documents its
scale story (shuffle shape, broadcast choice, skew behavior).
"""

from dbp_etl_spark.operators.dedup_ops import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
)
from dbp_etl_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    embedding_neardup_pairs,
    lsh_bucketed_topk,
)
from dbp_etl_spark.operators.windows import (  # noqa: F401
    asof_join,
    merge_overlapping_ranges,
    sessionize,
)
from dbp_etl_spark.operators.multimodal import (  # noqa: F401
    extract_image_features,
    sample_audio_frames,
)
from dbp_etl_spark.operators.derive import (  # noqa: F401
    derive_variants,
    normalize_url,
)
