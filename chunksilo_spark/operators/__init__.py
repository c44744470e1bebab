"""Spark operators: pipeline stages 1-4 plus the training-data operator set
(dedup family, similarity search, text analysis, multimodal plumbing)."""
