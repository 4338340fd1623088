"""Large-scale training-data operators (beyond the reference's surface).

Components a 100 TB training-data pipeline needs on top of the log
engine: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine), approximate similarity search, text analysis
(language id, quality scoring, token counting, fingerprinting), and
multimodal column plumbing.  All are Dataset->Dataset operators built
on map_batches / groupby with explicit shuffle-minimizing structure.
"""

from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_clusters,
    embedding_dedup,
)
from .relational import (  # noqa: F401
    asof_join_grouped,
    range_join_count,
    window_topk,
)
from .sketch import hll_distinct, hll_distinct_by_group  # noqa: F401
from .similarity import knn_bruteforce, knn_ivf, knn_lsh  # noqa: F401
from .textstats import (  # noqa: F401
    add_text_stats,
    language_id,
    fingerprint,
    quality_score,
    token_count_bpe,
)
from .window import (  # noqa: F401
    sessionize,
    forward_fill_by_group,
    rolling_count_by_group,
)
