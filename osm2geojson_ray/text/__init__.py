from .analysis import TextAnalyzer, analyze_documents  # noqa: F401
from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_pairs,
    simhash_signatures,
    embedding_neardup_pairs,
)
