"""Query plans: the named-query registry backing ``__spark_entry__.py``."""

from .registry import QUERIES, ORACLE_SQL, register, QuerySpec

__all__ = ["QUERIES", "ORACLE_SQL", "register", "QuerySpec"]
