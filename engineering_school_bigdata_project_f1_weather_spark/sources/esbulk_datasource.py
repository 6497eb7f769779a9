"""Elasticsearch bulk SINK as a PySpark Python Data Source WRITER (S8/S9
as a pluggable connector, completing the reader-side story of
``ergast_datasource.py``).

The reference ships marts to Elasticsearch with a driver-side loop over
``helpers.bulk`` (`Code Big Data Project.py:401-779`) — every row pulled
to one machine. The connector form distributes the same protocol:

    spark.dataSource.register(EsBulkDataSource)
    df.write.format("esbulk").option("path", out)
      .option("index", "f1_wins").mode("append").save()

- ``write(iterator)`` runs ONCE PER PARTITION on executors and renders
  that partition's rows as an Elasticsearch ``_bulk`` request body
  (action line + source line per doc, NDJSON).  Two shipping modes:

  * **file mode** (default): the body lands in a STAGED file named by a
    uuid; ``commit`` publishes atomically (below) — all-or-nothing.
  * **HTTP mode** (round 7, ``.option("url", "http://es:9200")``): the
    executor POSTs the body to ``{url}/_bulk`` directly
    (``Content-Type: application/x-ndjson``, stdlib urllib, bounded
    chunks of ``batch_docs`` rows, exponential-backoff retries, item
    errors in the bulk response raised as failures).  Each action line
    carries a DETERMINISTIC ``_id`` (md5 of the rendered source doc),
    so a speculative or retried task that re-POSTs the same partition
    overwrites the same documents instead of duplicating them —
    POST-per-partition is inherently at-least-once, and idempotent ids
    make it effectively-once, the same contract the elasticsearch-spark
    connector documents.  ``commit`` then records only the audit
    manifest.  This is the distributed form of the reference's
    driver-side ``helpers.bulk`` loop (`Code Big Data
    Project.py:425-434`), exercised end-to-end against a live local
    HTTP server in tests/test_survey_coverage.py::test_s8_esbulk_http_mode.
- ``commit(messages)`` runs on the driver only after EVERY partition
  succeeded: staged files are atomically renamed into the target
  directory and a ``_MANIFEST.json`` records per-file doc counts — the
  all-or-nothing publish the driver-side loop never had.
- ``abort(messages)`` removes whatever was staged, so a failed job
  leaves no half-shipped bulk bodies behind.

Speculative/retried tasks stage under distinct uuids but only the
attempts whose commit messages reach ``commit`` are published — the same
task-commit contract as Spark's file committers.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import urllib.error
import urllib.request
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


class EsBulkCommit(WriterCommitMessage):
    def __init__(self, staged_path: str | None, n_docs: int):
        self.staged_path = staged_path  # None in HTTP mode (already shipped)
        self.n_docs = n_docs


def _post_bulk(url: str, body: str, attempts: int = 3) -> None:
    """POST one _bulk body; retry transient failures with backoff; treat
    item-level ``errors`` in the bulk response as a failure (partial
    acceptance must not pass silently)."""
    last: Exception | None = None
    for i in range(attempts):
        try:
            req = urllib.request.Request(
                url.rstrip("/") + "/_bulk",
                data=body.encode(),
                method="POST",
                headers={"Content-Type": "application/x-ndjson"},
            )
            with urllib.request.urlopen(req, timeout=30) as resp:
                payload = resp.read()
            out = json.loads(payload or b"{}")
            if out.get("errors"):
                raise RuntimeError(f"bulk response reports item errors: {out}")
            return
        except Exception as e:  # noqa: BLE001 — retried, re-raised at the end
            last = e
            time.sleep(0.2 * (2**i))
    raise RuntimeError(f"bulk POST failed after {attempts} attempts: {last}")


class EsBulkWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        if "path" not in options:
            raise ValueError("esbulk writer requires .option('path', ...)")
        self.path = options["path"]
        self.index = options.get("index", "mart")
        self.url = options.get("url")  # HTTP mode when set
        self.batch_docs = int(options.get("batch_docs", "1000"))
        self.staging = os.path.join(self.path, "_staging")
        self.overwrite = overwrite
        # per-JOB id: published file names must be unique across jobs so
        # an append never clobbers an earlier job's committed parts.
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator: Iterator) -> EsBulkCommit:
        if self.url:
            return self._write_http(iterator)
        os.makedirs(self.staging, exist_ok=True)
        staged = os.path.join(self.staging, f"bulk-{uuid.uuid4().hex}.ndjson")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps({"index": {"_index": self.index}}) + "\n")
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return EsBulkCommit(staged, n)

    def _write_http(self, iterator: Iterator) -> EsBulkCommit:
        """HTTP mode: POST this partition's docs in bounded chunks with
        deterministic md5 ``_id``s (module docstring) — memory stays
        O(batch_docs) regardless of partition size."""
        lines: list[str] = []
        n = 0

        def flush() -> None:
            if lines:
                _post_bulk(self.url, "\n".join(lines) + "\n")
                lines.clear()

        for row in iterator:
            src = json.dumps(row.asDict(), default=str)
            doc_id = hashlib.md5(
                f"{self.index}\x00{src}".encode()
            ).hexdigest()
            lines.append(
                json.dumps({"index": {"_index": self.index, "_id": doc_id}})
            )
            lines.append(src)
            n += 1
            if n % self.batch_docs == 0:
                flush()
        flush()
        return EsBulkCommit(None, n)

    def commit(self, messages) -> None:
        """Driver-side, runs only after every partition succeeded.

        Publish order (ADVICE r3 — crash-safe at every step): (1) rename
        the staged replacements into the target directory — their
        job-unique names cannot collide with prior files; (2) rewrite the
        manifest to the new state; (3) only then delete the files the
        manifest no longer references (overwrite's garbage collection).
        A crash before (2) leaves the prior manifest pointing at prior
        files that all still exist; a crash during (3) leaves stray
        unreferenced .ndjson files but never a manifest entry for a
        deleted file — readers follow the manifest, so the committed
        state is always consistent.

        HTTP mode: the documents already shipped from the executors
        (idempotently — deterministic ids); commit records the audit
        manifest only."""
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        if self.url:
            os.makedirs(self.path, exist_ok=True)
            with open(manifest_path, "w") as f:
                json.dump(
                    {
                        "index": self.index,
                        "mode": "http",
                        "url": self.url,
                        "n_docs": sum(m.n_docs for m in messages),
                        "parts": [m.n_docs for m in messages],
                    },
                    f,
                )
            return
        prior = (
            json.load(open(manifest_path))["files"]
            if os.path.exists(manifest_path)
            else []
        )
        if self.overwrite:
            os.makedirs(self.path, exist_ok=True)
            to_remove = [
                fn for fn in os.listdir(self.path) if fn.endswith(".ndjson")
            ]
            manifest: list = []
        else:
            to_remove = []
            manifest = list(prior)
        for i, m in enumerate(messages):
            final = os.path.join(
                self.path, f"part-{self.job_id}-{i:05d}.ndjson"
            )
            os.replace(m.staged_path, final)
            manifest.append({"file": os.path.basename(final), "n_docs": m.n_docs})
        with open(manifest_path, "w") as f:
            json.dump(
                {"index": self.index, "files": manifest,
                 "n_docs": sum(e["n_docs"] for e in manifest)},
                f,
            )
        for fn in to_remove:
            try:
                os.remove(os.path.join(self.path, fn))
            except FileNotFoundError:
                pass
        try:
            os.rmdir(self.staging)
        except OSError:
            pass  # stray staged attempts from retries may remain; harmless

    def abort(self, messages) -> None:
        for m in messages:
            if (
                m is not None
                and m.staged_path
                and os.path.exists(m.staged_path)
            ):
                os.remove(m.staged_path)


class EsBulkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "esbulk"

    def writer(self, schema, overwrite: bool) -> EsBulkWriter:
        return EsBulkWriter(dict(self.options), overwrite)
