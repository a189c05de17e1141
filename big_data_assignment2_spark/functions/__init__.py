from . import bm25, hashing, text, vectors

__all__ = ["bm25", "hashing", "text", "vectors"]
