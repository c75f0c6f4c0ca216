"""Engine operators beyond plain relational algebra.

- ``dedup``: exact, MinHash+LSH, SimHash, n-gram Jaccard near-dup
- ``similarity``: fuzzy top-1 join (reference J8), ANN cosine search
- ``http_enrich``: bounded-concurrency per-row HTTP enrichment (E1-E3/E5)
- ``incremental``: partition ledger / idempotent per-date processing
"""

from wopen_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    ngram_jaccard,
    simhash,
)
from wopen_spark.operators.similarity import cosine_topk, fuzzy_top1_join

__all__ = [
    "cosine_topk",
    "exact_dedup",
    "fuzzy_top1_join",
    "minhash_signatures",
    "ngram_jaccard",
    "simhash",
]
