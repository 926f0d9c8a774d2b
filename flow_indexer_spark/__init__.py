"""flow_indexer_spark — a from-scratch PySpark-native reimagining of
JustinAzoff/flow-indexer's extract → index → query pipeline.

Instead of scanning chunked bro/nfdump/syslog log files for IP addresses
(reference: /root/reference/backend/*.go) and building LevelDB posting
lists (reference: /root/reference/store/leveldb.go), this engine reads a
table of multi-turn agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)``, runs a vectorized
grok/regex parse stage over the text/tool columns to extract entities
(IP-like tokens, tool invocations, role markers), enriches them via
broadcast hash-joins against lookup dimensions, fans out to per-entity-class
routed sinks, and builds an inverted entity → (conv_id, turn_idx)
posting-list index as a salted, skew-aware groupBy aggregate.

Everything is DataFrame/Catalyst-first: native ``pyspark.sql.functions``
in the hot path, Arrow-batched pandas UDFs only where semantics require
Python (IPv6 canonicalization), no RDDs, no driver-side loops.
"""

__version__ = "0.1.0"

from flow_indexer_spark.session import get_spark  # noqa: F401
