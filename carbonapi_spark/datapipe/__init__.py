"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication, similarity search, text analysis,
multimodal plumbing. All DataFrame-native; Python only in clearly-marked
kernels."""
