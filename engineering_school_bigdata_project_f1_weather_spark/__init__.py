"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo
``Martin-JMP/Engineering_School_BigData_Project_F1_Weather``.

The reference is a batch F1 + weather ETL/analytics pipeline (see SURVEY.md).
This package re-expresses every operator it runs Spark-first:

- ``sources``   : parquet/CSV/JSON scans with explicit schemas (no inference).
- ``plans``     : deterministic logical-plan builders, incl. the F1 data model
                  derived from the TPC-H-ish test tables.
- ``operators`` : the nine reference queries (marts), joins, dedup,
                  similarity search, text analysis, multimodal plumbing.
- ``functions`` : scalar expression helpers (time parse/format, vector math).
- ``streaming`` : Structured Streaming ingest of the ``events`` table.

Everything is DataFrame/Spark-SQL declarative so Catalyst plans it; Python
UDFs appear only where built-ins cannot express the semantics (and then as
Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
