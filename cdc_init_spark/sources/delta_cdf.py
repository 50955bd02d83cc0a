"""Streaming change-feed source over DeltaLogFormat (VERDICT r6 "Next
round" item 3) — the Delta streaming-source analog: a downstream
pipeline subscribes to a table the way the reference subscribes to the
control topic (initializer.clj:101-104; trigger semantics
sql/trigger/create_trigger.sql:1-10), getting one micro-batch per
committed version.

Built on the Spark 4 Python DataSource API (the same public extension
point as sources/pydatasource.py), full ``DataSourceStreamReader`` form
— planning on the driver, file reads on executors:

- **Offsets are version numbers.** ``latestOffset`` replays the log's
  metadata (checkpoint + JSON tail, no data IO); a micro-batch covers
  the committed versions in ``(start, end]``.
- **Partitions are files.** For each version, the rows come from
  immutable parquet the commit itself wrote: ``cdc`` actions (merge
  change-data, written when the table has ``enable_cdf=True``) or the
  version's ``add`` files (init/append/first-write = pure inserts, no
  extra copy ever made). One InputPartition per file → the batch scales
  out like any file scan.
- **Replayable by construction.** The files a version references never
  change, so re-reading any offset range after a checkpoint restart
  yields identical rows — the at-least-once contract the reference's
  control loop assumes (initializer.clj:27-39), with idempotent
  downstream sinks making it effectively-once (streaming/idempotent.py).

Row schema: the table's columns + ``type`` (insert/update/delete, the
engine's CDC vocabulary) + ``_commit_version``.

Non-CDF versions: ``compact`` commits are logical no-ops and emit
nothing. A version that REMOVES files without change data (overwrite,
restore, or a merge committed with ``enable_cdf=False``) cannot be
expressed as row-level changes — the reader raises by default, or skips
it with ``.option("onNonCdf", "skip")`` (Delta's ignoreChanges shape).

Retention: change data lives under ``{root}/_cdc`` and log JSON entries
are the per-version index; versions archived behind a checkpoint are no
longer streamable (same horizon rule as time travel after vacuum).
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "deltacdf"


def _snapshot(root: str, version: int | None = None):
    from cdc_init_spark.sources.delta_log import DeltaLogFormat

    return DeltaLogFormat(root)._snapshot(version)


def _parse_version_entry(root: str, version: int) -> dict:
    """One committed version's actions, grouped: operation, adds per
    table, removes per table, cdc files per table, cdcMeta tables."""
    path = os.path.join(root, "_log", f"{version:020d}.json")
    if not os.path.exists(path):
        raise ValueError(
            f"version {version} log entry is archived (checkpointed away) "
            "— change-feed reads need the JSON tail; lower the stream's "
            "startingVersion horizon or retain more log entries"
        )
    out: dict = {"operation": None, "adds": {}, "removes": {},
                 "cdc": {}, "cdcMeta": set(), "meta": {}, "dvs": {}}
    with open(path) as f:
        for line in f:
            a = json.loads(line)
            if "commitInfo" in a:
                out["operation"] = a["commitInfo"].get("operation")
            elif "add" in a:
                out["adds"].setdefault(a["add"]["table"], []).append(a["add"])
            elif "remove" in a:
                out["removes"].setdefault(
                    a["remove"]["table"], []
                ).append(a["remove"])
            elif "cdc" in a:
                out["cdc"].setdefault(a["cdc"]["table"], []).append(a["cdc"])
            elif "cdcMeta" in a:
                out["cdcMeta"].add(a["cdcMeta"]["table"])
            elif "metaData" in a:
                out["meta"][a["metaData"]["table"]] = a["metaData"]
            elif "dv" in a:
                out["dvs"].setdefault(a["dv"]["table"], []).append(a["dv"])
    return out


class DeltaCdfDataSource(DataSource):
    """``spark.readStream.format("deltacdf")`` options:

    - ``root`` (required): the DeltaLogFormat table root
    - ``table`` (required): table name within the root
    - ``startingVersion`` (default 0): first version to emit; version
      0's snapshot rows stream as inserts — the reference's
      seed-then-live contract in one subscription
    - ``onNonCdf`` (default "error"): "skip" to pass over versions whose
      changes aren't row-expressible (overwrite/restore/no-CDF merge)
    - ``maxVersionsPerBatch`` (default unlimited): cap how many committed
      versions one micro-batch covers (Delta's maxFilesPerTrigger shape)
      — a long catch-up becomes a sequence of bounded batches instead of
      one giant one. After a checkpoint restart the FIRST batch is
      uncapped (the reader can't know the committed offset before Spark
      hands it the start), subsequent batches are capped again.
    - ``maxBytesPerBatch`` (default unlimited): cap a micro-batch by the
      PLANNED bytes of the versions it covers (Delta's maxBytesPerTrigger
      shape; VERDICT r8 item 6) — sizes come from the action log's
      ``add``/``cdc`` file sizes, no data IO. Versions vary wildly in
      size after merge-on-read (a dv-only commit is tiny, its compaction
      huge), so a version-count cap alone cannot bound executor memory.
      A batch always advances at least ONE version — a single version
      larger than the cap forms its own oversized batch rather than
      stalling the stream. Composes with ``maxVersionsPerBatch``
      (whichever cap hits first) and shares its uncapped-first-batch
      restart rule.
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        root = self.options["root"]
        table = self.options["table"]
        snap = _snapshot(root)
        if table not in snap.schemas:
            raise ValueError(f"unknown table {table!r} under {root!r}")
        base = StructType.fromJson(json.loads(snap.schemas[table]))
        ddl_cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in base.fields
        )
        return f"{ddl_cols}, `type` string, `_commit_version` bigint"

    def streamReader(self, schema) -> "DeltaCdfStreamReader":
        return DeltaCdfStreamReader(schema, self.options)


class DeltaCdfStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.root = options["root"]
        self.table = options["table"]
        self.starting_version = int(options.get("startingversion", 0))
        self.on_non_cdf = str(options.get("onnoncdf", "error")).lower()
        self.max_versions = int(options.get("maxversionsperbatch", 0))
        self.max_bytes = int(options.get("maxbytesperbatch", 0))
        #: high-water mark of the last offset THIS reader incarnation
        #: returned — the base the per-batch version cap advances from.
        #: Deliberately NOT seeded by initialOffset: Spark may recreate
        #: the reader mid-query, and a capped offset computed from a
        #: fresh instance's floor can land BELOW the already-committed
        #: offset — an offset regression that re-delivers versions. The
        #: first latestOffset of every incarnation is therefore uncapped
        #: (current latest ≥ committed always holds); steady-state
        #: batches are capped.
        self._planned_end: int | None = None
        # output order is fixed by the declared schema; the trailing two
        # fields (type, _commit_version) are reader-synthesized
        self.spark_schema = schema
        self.fields = [f.name for f in schema.fields]
        self.data_fields = self.fields[:-2]
        #: the table version the schema was pinned at (stream start).
        #: Schema-evolution law: metaData NARROWER than the pin at
        #: versions ≤ pin is additive HISTORY (old files stream the
        #: later columns as NULL); a pinned column missing from metaData
        #: at a version AFTER the pin is a genuine drop — fail loudly.
        pin_snap = _snapshot(self.root)
        self._pin_version = pin_snap.version
        #: pinned logical → stable PHYSICAL column names (column
        #: mapping): data/cdc bytes are physical-named, so history
        #: written before a rename reads correctly under the new
        #: logical name, and a column re-added after a drop (fresh
        #: physical name) correctly reads pre-drop files as NULL
        #: instead of resurrecting the retired bytes. The dict is
        #: tiny and pickles to executors with the reader.
        self._phys = dict(pin_snap.mappings.get(self.table, {}) or {})

    # -- offsets ------------------------------------------------------------

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        # floor at startingVersion - 1 (ADVICE r7): when startingVersion
        # is AHEAD of the table's current latest, the offset must not
        # regress below the subscription floor — otherwise the first
        # batch plans with end < start, commits an offset below the
        # floor, and versions landing later in [latest+1, starting-1]
        # stream even though the subscriber asked to skip them.
        floor = self.starting_version - 1
        latest = max(_snapshot(self.root).version, floor)
        if self._planned_end is not None and (
            self.max_versions > 0 or self.max_bytes > 0
        ):
            capped = self._planned_end
            n_versions = planned_bytes = 0
            while capped < latest:
                size = self._version_bytes(capped + 1)
                if n_versions >= 1 and (
                    (self.max_versions > 0
                     and n_versions >= self.max_versions)
                    or (self.max_bytes > 0
                        and planned_bytes + size > self.max_bytes)
                ):
                    break
                capped += 1
                n_versions += 1
                planned_bytes += size
            latest = capped
        self._planned_end = latest
        return {"version": latest}

    def _version_bytes(self, version: int) -> int:
        """Planned bytes one version contributes to a batch for THIS
        table, from the action log's recorded file sizes (metadata only
        — the log entry is the index): cdc files when the commit
        captured change data, else its add files. Actions from before
        size recording fall back to one stat call; archived or
        unreadable entries plan as 0 (partitions() raises the real
        error when the batch actually covers them)."""
        try:
            entry = _parse_version_entry(self.root, version)
        except ValueError:
            return 0
        if self.table in entry["cdcMeta"]:
            files = [("_cdc", c) for c in entry["cdc"].get(self.table, [])]
        else:
            files = [("_data", a) for a in entry["adds"].get(self.table, [])]
        total = 0
        for sub, action in files:
            size = action.get("size")
            if size is None:
                try:
                    size = os.path.getsize(
                        os.path.join(self.root, sub, action["path"])
                    )
                except OSError:
                    size = 0
            total += size
        return total

    def commit(self, end: dict) -> None:
        pass

    # -- planning (driver) ----------------------------------------------------

    def _check_schema_compat(self, schema_json: str, version: int) -> None:
        """Additive evolution streams through (old files' missing
        columns become NULL; columns added after the pin are invisible
        until the subscription restarts on the widened schema). A
        NON-additive change — a pinned column dropped after the pin, or
        retyped anywhere in the subscribed range — is not representable
        in the pinned schema and fails loudly, NEVER silently, even
        under onNonCdf=skip (VERDICT r7 item 5)."""
        new = {
            f.name: f.dataType
            for f in StructType.fromJson(json.loads(schema_json)).fields
        }
        for f in self.spark_schema.fields[:-2]:
            if f.name in new:
                if new[f.name] != f.dataType:
                    raise ValueError(
                        f"version {version} retypes column {f.name!r} of "
                        f"{self.table!r} ({f.dataType.simpleString()} → "
                        f"{new[f.name].simpleString()}); the subscription's "
                        "pinned schema cannot represent the feed — restart "
                        "the stream on the new schema"
                    )
            elif version > self._pin_version:
                raise ValueError(
                    f"version {version} drops column {f.name!r} of "
                    f"{self.table!r}; the subscription's pinned schema "
                    "cannot represent the feed — restart the stream on "
                    "the new schema"
                )

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            entry = _parse_version_entry(self.root, v)
            meta = entry["meta"].get(self.table)
            if meta is not None:
                self._check_schema_compat(meta["schema_json"], v)
            if self.table in entry["cdcMeta"]:
                # merge with CDF: the commit's own change-data files
                # (possibly none — an empty diff is a valid no-op)
                for c in entry["cdc"].get(self.table, []):
                    parts.append(InputPartition(
                        ("cdc", v, os.path.join(self.root, "_cdc", c["path"]),
                         None)))
                continue
            adds = entry["adds"].get(self.table, [])
            removes = entry["removes"].get(self.table, [])
            if entry["operation"] == "compact":
                continue  # physical rewrite, zero logical change
            if removes or entry["dvs"].get(self.table):
                # removes (overwrite/restore/CoW merge) and deletion
                # vectors (MoR merge) both change rows the adds alone
                # cannot express
                if self.on_non_cdf == "skip":
                    continue
                raise ValueError(
                    f"version {v} changes table {self.table!r} without "
                    "row-level change data (overwrite/restore, or a merge "
                    "on a table without enable_cdf=True); re-create the "
                    'stream with .option("onNonCdf", "skip") to pass over '
                    "it, or enable CDF on the writer"
                )
            for a in adds:
                # init/append/first write: the added files ARE the inserts
                parts.append(InputPartition(
                    ("add", v, os.path.join(self.root, "_data", a["path"]),
                     a.get("partitionValues") or {})))
        if not parts:
            # a range of pure no-ops (compacts / other tables' commits):
            # one empty marker partition keeps the batch well-formed
            parts.append(InputPartition(("empty", end["version"], None, None)))
        return parts

    # -- execution (executors) -------------------------------------------------

    def read(self, partition: InputPartition) -> Iterator:
        """Arrow-batched file read (VERDICT r7 item 3): yields
        ``pyarrow.RecordBatch`` objects — the Spark 4 Python DataSource
        fast path — so change rows never pass through per-row Python
        tuples. Columns are assembled columnar-side: data columns come
        from the parquet file by name (absent ones — files older than an
        additive widening — become typed NULL arrays), partition columns
        and the synthesized ``type`` / ``_commit_version`` fields are
        O(1) constant arrays, and the result is cast to the declared
        schema in one vectorized pass."""
        kind, version, path, pvals = partition.value
        if kind == "empty":
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type

        tbl = pq.read_table(path)
        n = tbl.num_rows
        if n == 0:
            return iter(())

        def const(value, at):
            return pa.repeat(pa.scalar(value, at), n)

        columns: dict = {}
        for f in self.spark_schema.fields:
            at = to_arrow_type(f.dataType)
            # on-disk bytes (and partition directories) carry the
            # column's stable PHYSICAL name
            phys = self._phys.get(f.name, f.name)
            if f.name == "_commit_version":
                columns[f.name] = const(version, at)
            elif f.name == "type" and f.name not in self.data_fields:
                columns[f.name] = (
                    tbl.column("type") if kind == "cdc" else const("insert", at)
                )
            elif kind == "add" and pvals and phys in pvals:
                # Hive-partitioned add file: the value lives in the
                # path/log, not the data pages
                columns[f.name] = const(pvals[phys], at)
            elif phys in tbl.column_names:
                columns[f.name] = tbl.column(phys)
            else:
                columns[f.name] = pa.nulls(n, at)
        target = pa.schema(
            [(f.name, to_arrow_type(f.dataType)) for f in self.spark_schema.fields]
        )
        return iter(pa.table(columns).cast(target).to_batches())


def register(spark) -> None:
    """Idempotent registration: `spark.readStream.format("deltacdf")`."""
    spark.dataSource.register(DeltaCdfDataSource)


def read_change_stream(spark, root: str, table: str, **options):
    """Subscribe to a DeltaLogFormat table's change feed: one
    micro-batch per committed version, rows = that version's keyed DML
    (the streamed twin of ``DeltaLogFormat.changes_between`` — the
    equivalence law is pinned in tests/test_delta_cdf.py)."""
    register(spark)
    reader = (
        spark.readStream.format(FORMAT_NAME)
        .option("root", root)
        .option("table", table)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
