"""Large-scale training-data pipeline operators (BASELINE.json north-star).

Not part of the OpenTSDB reference surface — these are the data-pipeline
extensions a 100 TB deployment needs, built on the same Spark-first rules:
native expressions, bounded shuffles, no row-at-a-time Python on hot paths.

  dedup       exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine
  similarity  brute-force cosine top-k + bucketed (LSH) candidate pruning
  text        language-ID heuristic, quality scores, token counts, fingerprints
  multimodal  opaque binary media columns + Arrow-batched decode plumbing
"""
