"""Large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) over the engine's document tables.
"""
