"""mito_spark — a PySpark-native analytics engine with the capability
surface of elastic/mito (reference: /root/reference, a CEL-based message
stream processing engine), rebuilt Spark-first.

Design (see SURVEY.md):
  - mito's "state" JSON document  -> DataFrame (one row per event)
  - CEL comprehensions (map/filter/all/exists) -> DataFrame ops + array HOFs
  - mito lib functions (collections/strings/crypto/time/regexp/json/try)
    -> Column-expression builders in ``mito_spark.functions`` (JVM-side,
    whole-stage-codegen friendly; Python UDFs only where unavoidable)
  - want_more continuation loop -> ``mito_spark.streaming.continuation``
  - HTTP source + rate-limit policies -> ``mito_spark.sources.http``
  - Beyond parity: large-scale training-data ops (dedup, similarity
    search, text analysis, multimodal) in ``mito_spark.operators``.

Everything here is built only on public PySpark 4.x APIs.
"""

from mito_spark.engine import get_spark, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]
__version__ = "0.1.0"
