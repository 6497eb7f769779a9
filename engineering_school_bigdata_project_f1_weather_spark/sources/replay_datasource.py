"""Replay parquet as a stream — a Python Data Source STREAMING connector.

`spark.readStream.format("replay")` turns any documents-shaped parquet
file into a rate-bounded micro-batch stream: offset = absolute row index,
each batch carries ``rowsPerBatch`` rows. This is the streaming-connector
counterpart of ``ergast_datasource`` (the batch one), and the local
stand-in for a queue/CDC source when testing continuous corpus ingest
(streaming dedup, incremental indexing) without Kafka in the container:

    spark.dataSource.register(ReplayDataSource)
    stream = (spark.readStream.format("replay")
              .option("path", f"{sf_dir}/documents.parquet")
              .option("rowsPerBatch", "200").load())

Exactly-once: offsets are deterministic row ranges over an immutable
file, and ``readBetweenOffsets`` re-yields any committed range verbatim
on recovery — the two properties a replayable source must provide.

Scale note: ``SimpleDataSourceStreamReader`` reads on the driver (the
documented simple-reader trade-off, right for low-throughput control
streams); a partition-parallel ``DataSourceStreamReader`` with per-split
offsets is the executor-side upgrade path and keeps the same offset
contract.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

REPLAY_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)
_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


class ReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("replay source requires .option('path', parquet_file)")
        self.rows_per_batch = int(options.get("rowsPerBatch", "1000"))
        self._table = None

    def _rows(self, start: int, end: int) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        if self._table is None:
            self._table = pq.read_table(self.path, columns=_COLS)
        sl = self._table.slice(start, end - start)
        cols = [sl.column(c).to_pylist() for c in _COLS]
        return iter(zip(*cols)) if sl.num_rows else iter(())

    def _total(self) -> int:
        import pyarrow.parquet as pq

        return pq.read_metadata(self.path).num_rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["row"]
        hi = min(lo + self.rows_per_batch, self._total())
        return self._rows(lo, hi), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._rows(start["row"], end["row"])

    def commit(self, end: dict) -> None:
        pass  # offsets are positions in an immutable file — nothing to ack


class ReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "replay"

    def schema(self) -> str:
        return REPLAY_SCHEMA

    def simpleStreamReader(self, schema) -> ReplayStreamReader:
        return ReplayStreamReader(self.options)
