"""Large-scale training-data pipeline operators (dedup, similarity,
text analysis, multimodal plumbing, relational/windowed demos) over the
driver's ``documents`` / ``embeddings`` / TPC-H-ish tables.
"""
