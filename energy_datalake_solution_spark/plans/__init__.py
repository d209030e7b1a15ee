from .registry import QUERIES, QuerySpec, register, get_queries, get_oracles
from .session import get_spark

__all__ = ["QUERIES", "QuerySpec", "register", "get_queries", "get_oracles", "get_spark"]
