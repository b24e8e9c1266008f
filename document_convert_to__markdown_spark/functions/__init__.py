"""Column-expression helpers (JVM-side, no Python UDFs)."""

from .vector import cosine_similarity, dot, l2_norm

__all__ = ["cosine_similarity", "dot", "l2_norm"]
