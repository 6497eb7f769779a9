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
  (action line + source line per doc, NDJSON) into a STAGED file named
  by a uuid — the offline stand-in for one executor-side bulk POST; a
  real deployment swaps the file write for the HTTP call and keeps
  everything else.
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

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


class EsBulkCommit(WriterCommitMessage):
    def __init__(self, staged_path: str, n_docs: int):
        self.staged_path = staged_path
        self.n_docs = n_docs


class EsBulkWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        if "path" not in options:
            raise ValueError("esbulk writer requires .option('path', ...)")
        self.path = options["path"]
        self.index = options.get("index", "mart")
        self.staging = os.path.join(self.path, "_staging")
        self.overwrite = overwrite
        # per-JOB id: published file names must be unique across jobs so
        # an append never clobbers an earlier job's committed parts.
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator: Iterator) -> EsBulkCommit:
        os.makedirs(self.staging, exist_ok=True)
        staged = os.path.join(self.staging, f"bulk-{uuid.uuid4().hex}.ndjson")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps({"index": {"_index": self.index}}) + "\n")
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return EsBulkCommit(staged, n)

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
        state is always consistent."""
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
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
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)


class EsBulkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "esbulk"

    def writer(self, schema, overwrite: bool) -> EsBulkWriter:
        return EsBulkWriter(dict(self.options), overwrite)
