"""Operator library.

Each module re-expresses one capability area Spark-first:

- :mod:`.graph` — the reference's entire surface (triangle pipeline).
- :mod:`.relational` — scans, filters, aggregations, joins, windows,
  set ops (the relational primitives SURVEY §2 decomposes the
  reference into, generalized to real queries).
- :mod:`.dedup` — exact + near deduplication (north star).
- :mod:`.similarity` — embedding similarity search (north star).
- :mod:`.text` — text analysis (north star).
- :mod:`.events` — sessionization / time windows (north star).
- :mod:`.multimodal` — binary media columns (north star, decode stubbed).
"""
