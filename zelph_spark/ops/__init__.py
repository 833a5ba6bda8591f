from . import dedup, multimodal, neural, similarity, textops

__all__ = ["dedup", "multimodal", "neural", "similarity", "textops"]
