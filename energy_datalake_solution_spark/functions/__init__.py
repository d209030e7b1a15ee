from .scalar import categorize_like, sha256_hex, audit_columns
from .vector import dot, l2_norm, cosine

__all__ = ["categorize_like", "sha256_hex", "audit_columns", "dot", "l2_norm", "cosine"]
