"""Engine operators: graph closure, dedup, similarity search, text
analysis, multimodal plumbing — the reference's non-relational pieces plus
the large-scale training-data-pipeline extensions."""
