"""Large-scale training-data-pipeline operators (SURVEY.md §7.1 M6) —
new capabilities beyond the reference, built DataFrame-first:

- dedup: exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine
- similarity: brute-force cosine top-k, LSH-bucketed ANN
- text: language-ID, quality scoring, token counting, fingerprinting
- multimodal: binary payload plumbing with stubbed decoders
"""

from shc_spark.operators import dedup, linkage, multimodal, similarity, text  # noqa: F401
