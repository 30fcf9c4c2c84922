"""Manifest-versioned parquet tables: snapshot isolation + time
travel on a plain filesystem — the Iceberg/Delta commit protocol in
miniature.

`operators/upsert.py` documents its known bound: dynamic partition
overwrite mutates files in place, so a crash mid-rewrite can lose a
partition, and a concurrent reader can see a half-committed table.
This module removes both hazards the way the table formats do, with
nothing but parquet files and one pointer:

- data files are IMMUTABLE — every commit writes its rows under a
  fresh `data/v{N}/` directory and never touches earlier files;
- a commit becomes visible by atomically swapping the `_CURRENT`
  pointer (`os.replace`, atomic on POSIX; the HDFS/S3 equivalent is
  an atomic rename / conditional put) to a manifest that lists the
  snapshot's files;
- readers resolve the pointer ONCE and then read only files named by
  that manifest — they can never observe a torn write: a crash
  before the swap leaves orphaned data files (harmless; a vacuum
  pass reclaims them) and the previous snapshot fully intact;
- any historical version stays readable (time travel) until
  explicitly vacuumed.

Two COW granularities: `commit_version`/`upsert_version` rewrite the
whole snapshot (simple; fine for dimension-sized tables), while
`commit_version_partitioned`/`upsert_version_cow` carry untouched
partitions' files into the new manifest BY REFERENCE and rewrite
only touched days — commit cost ∝ update slice, the construction
that holds at 100 TB. `read_version_pruned` turns the manifest's
partition tags into metadata-only file pruning (no listing, no
footer reads for excluded partitions). The manifest is file-level
metadata (KBs per thousand files), the pointer swap is O(1), and
snapshot reads plan exactly like any parquet scan (pushdown/pruning
untouched: readers get a file list, Catalyst does the rest).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.operators.upsert import (
    distribute_for_write,
    scratch_path,
)
from data_ingestion_pipeline_spark.sources.tables import load_table

POINTER = "_CURRENT"

# Full-manifest cadence: every CHECKPOINT_EVERY-th version is written
# as a CHECKPOINT (complete file list); versions between are DELTAS
# ({base, add, remove, partitions_add} against the previous version).
# This is the Delta-log shape that removes the second O(files) scale
# ceiling (r10 VERDICT finding b): a single-JSON manifest rewrote the
# entire file list on EVERY commit — ~100 MB of JSON per commit at a
# 10⁶-file table — whereas a delta commit writes O(changed files)
# bytes and a reader resolves at most CHECKPOINT_EVERY-1 deltas on top
# of one checkpoint. Scalar fields (version/schema/meta/committed_at/
# partition_col/project_schema) stay inline in every manifest, so
# meta/committed_at probes (manifest_meta, read_as_of) never resolve
# the chain.
CHECKPOINT_EVERY = 10

# Checkpoints of tables past this file count externalize their file
# list to a PARQUET sidecar (`_manifest_files/v{N}-….parquet`, columns
# file[, partition]) and the JSON keeps only a pointer — Delta's
# parquet-checkpoint move. A 10⁶-file list is ~100 MB of JSON but
# ~10 MB of parquet, and every reader needs the list anyway (it IS the
# scan plan), so the sidecar read replaces the JSON parse one-for-one.
# Below the threshold the inline JSON form wins (no extra file, no
# second read).
FILES_REF_MIN = 20_000


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, f"manifest_v{version}.json")


_DELTA_KEYS = ("base", "add", "remove", "partitions_add")


def _inflate_files_ref(path: str, m: dict) -> dict:
    """Materialize a parquet-checkpoint manifest into the standard
    inline shape (files [+ partitions] lists present, pointer keys
    gone)."""
    import pyarrow.parquet as _pq

    t = _pq.read_table(os.path.join(path, m["files_ref"]))
    out = {k: v for k, v in m.items() if k != "files_ref"}
    files = t.column("file").to_pylist()
    out["files"] = files  # written sorted
    if "partition" in t.column_names:
        out["partitions"] = dict(zip(files, t.column("partition").to_pylist()))
    return out


def _checkpoint_form(path: str, manifest: dict) -> dict:
    """The on-disk form for a CHECKPOINT manifest: inline JSON below
    FILES_REF_MIN files, parquet files_ref sidecar above it. Sidecar
    first, pointer after — a crash between the two leaves an orphan
    parquet (vacuum-reclaimable), never a dangling pointer."""
    files = manifest["files"]
    if len(files) < FILES_REF_MIN:
        return manifest
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    rel = os.path.join(
        "_manifest_files",
        f"v{manifest['version']}-{uuid.uuid4().hex[:8]}.parquet",
    )
    os.makedirs(os.path.join(path, "_manifest_files"), exist_ok=True)
    cols = {"file": sorted(files)}
    if "partitions" in manifest:
        cols["partition"] = [manifest["partitions"].get(f) for f in cols["file"]]
    _pq.write_table(_pa.table(cols), os.path.join(path, rel))
    out = {
        k: v for k, v in manifest.items() if k not in ("files", "partitions")
    }
    out["files_ref"] = rel
    return out


def _resolve_chain(path: str, version: int) -> tuple[dict, list[int]]:
    """(materialized manifest, versions visited). Walks delta bases
    back to the nearest checkpoint (inflating parquet-checkpoint
    pointers), then replays adds/removes forward. The returned dict
    always carries a full 'files' list (and 'partitions' when the
    table is partitioned) with the delta bookkeeping keys stripped —
    every reader sees the same shape an inline checkpoint has."""
    chain: list[dict] = []
    v = version
    while True:
        with open(_manifest_path(path, v)) as fh:
            m = json.load(fh)
        if "files_ref" in m:
            m = _inflate_files_ref(path, m)
        chain.append(m)
        if "files" in m:
            break
        v = m["base"]
    base = chain[-1]
    files = set(base["files"])
    parts = dict(base.get("partitions", {}))
    partitioned = "partitions" in base
    for d in reversed(chain[:-1]):
        files.difference_update(d.get("remove", ()))
        for f in d.get("remove", ()):
            parts.pop(f, None)
        files.update(d.get("add", ()))
        if "partitions_add" in d:
            partitioned = True
            parts.update(d["partitions_add"])
    out = {k: v for k, v in chain[0].items() if k not in _DELTA_KEYS}
    out["files"] = sorted(files)
    if partitioned:
        out["partitions"] = parts
    return out, [m["version"] for m in chain]


def _encode_manifest(path: str, manifest: dict, prev: dict | None = None) -> dict:
    """Choose the on-disk form for a new manifest: a DELTA against the
    previous version when one exists, the cadence allows it, and the
    delta is strictly smaller than the full list — else a CHECKPOINT
    (the full manifest as given). The encoding is verified by
    round-trip: if replaying the delta over the previous state would
    not reproduce the intended manifest exactly (files AND partition
    tags), the checkpoint form wins — correctness can never depend on
    a writer's carried-tag discipline."""
    v = manifest["version"]
    if v <= 1 or v % CHECKPOINT_EVERY == 0:
        return _checkpoint_form(path, manifest)
    if prev is None or prev.get("version") != v - 1:
        # writers that already resolved the previous snapshot pass it
        # in (prev) so a commit never materializes the same file list
        # twice; everyone else resolves here
        try:
            prev, _ = _resolve_chain(path, v - 1)
        except FileNotFoundError:
            return _checkpoint_form(path, manifest)
    prev_files = set(prev["files"])
    new_files = set(manifest["files"])
    add = sorted(new_files - prev_files)
    remove = sorted(prev_files - new_files)
    if len(add) + len(remove) >= len(manifest["files"]):
        return _checkpoint_form(path, manifest)
    delta = {k: val for k, val in manifest.items() if k not in ("files", "partitions")}
    delta.update(base=v - 1, add=add, remove=remove)
    if "partitions" in manifest:
        delta["partitions_add"] = {f: manifest["partitions"][f] for f in add}
        # round-trip check on carried tags: a writer that retagged a
        # carried file (nothing does today) must fall back to full
        replay = dict(prev.get("partitions", {}))
        for f in remove:
            replay.pop(f, None)
        replay.update(delta["partitions_add"])
        if replay != manifest["partitions"]:
            return _checkpoint_form(path, manifest)
    elif "partitions" in prev:
        # partitioned → unpartitioned shape change: checkpoint
        return _checkpoint_form(path, manifest)
    return delta


def current_version(path: str) -> int:
    """Version named by the pointer; 0 = no committed snapshot."""
    try:
        with open(os.path.join(path, POINTER)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return 0


class ConcurrentCommitError(RuntimeError):
    """Another writer published a version after this commit started."""


class IndexMaintenanceError(RuntimeError):
    """Write-time index maintenance failed AFTER the commit was
    durably published. `committed_version` is live and readable —
    callers must NOT retry the commit (that would double-write the
    same data); rebuild the index (build_column_stats) or let the next
    stats_lookup rebuild transparently. Raised instead of the raw
    build exception so a generic retry-on-commit-failure loop can
    distinguish 'commit lost' from 'commit won, index stale'."""

    def __init__(self, committed_version: int, cause: Exception):
        super().__init__(
            f"commit v{committed_version} is published and durable, but "
            f"write-time stats maintenance failed: {cause!r}; do not retry "
            "the commit — rebuild the index or rely on the stale-rebuild "
            "path"
        )
        self.committed_version = committed_version
        self.__cause__ = cause


# ---- CHECK constraints: write-time row contracts --------------------
# Delta's `ALTER TABLE ADD CONSTRAINT ... CHECK (expr)` on this
# format (reference analog: the consumer's range validation,
# services/consumer/main.py:142-161, moved from app code into the
# TABLE so every writer is bound by it). Constraints live in one
# atomically-swapped JSON at the table root — table property, not
# manifest state, so every commit path sees the same live set without
# threading it through manifest encoding. Enforcement is INLINE in
# the write scan via assert_true guards (Delta's invariant-check
# shape): zero extra passes over the data — a violating row fails the
# write job before any manifest publishes, and the partially-written
# data directory is a vacuum-reclaimable orphan. SQL CHECK null
# semantics: a constraint evaluating to NULL passes (unknown ≠
# violated). Enforced by every path that ingests NEW rows
# (commit/append/upsert/COW/MOR-update/MERGE); maintenance rewrites
# of already-admitted rows (compact, zorder, purge, materialize) are
# exempt by construction.

CONSTRAINTS_FILE = "_CONSTRAINTS.json"
_CHECK_MARKER = "CHECK constraint"


class ConstraintViolationError(RuntimeError):
    """A row violated a table CHECK constraint; nothing committed."""


def table_constraints(path: str) -> dict[str, str]:
    """name → SQL expression of every live constraint (empty dict for
    an unconstrained table — the common case pays one stat call)."""
    try:
        with open(os.path.join(path, CONSTRAINTS_FILE)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {}


def _constraints_lock(path: str):
    """Exclusive advisory lock serializing constraint DDL on one
    table: the read-modify-write of _CONSTRAINTS.json is otherwise a
    lost-update hazard between two concurrent ADD/DROPs (ADVICE r13
    low). flock on a sidecar lockfile — on a real object store this
    maps to conditional-put on the constraints object, the same
    substitution the manifest OCC documents."""
    import fcntl
    from contextlib import contextmanager

    @contextmanager
    def _held():
        fh = open(os.path.join(path, CONSTRAINTS_FILE + ".lock"), "a")
        try:
            fcntl.flock(fh, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)
            fh.close()

    return _held()


def add_constraint(
    spark: SparkSession,
    path: str,
    name: str,
    expr: str,
    expected_current: int | None = None,
) -> None:
    """Attach a CHECK constraint. Like Delta, the EXISTING snapshot
    must already satisfy it — validated with one early-exit scan
    before the constraint file swaps (a constraint the data violates
    never becomes live). DDL-vs-DDL races are serialized by
    _constraints_lock; DDL-vs-data-write races are bounded by an OCC
    version check on BOTH sides of the validation scan (a commit
    landing mid-validation aborts the DDL — the scan's verdict no
    longer describes the current snapshot). Residual: a data write
    PLANNED before the swap but committing after enforces the old
    set — the same in-flight window Delta closes only by running
    both through one log."""
    with _constraints_lock(path):
        _occ_check(path, expected_current)
        v0 = current_version(path)
        cons = table_constraints(path)
        if name in cons:
            raise ValueError(f"constraint {name!r} already exists")
        if v0 > 0:
            ok = F.coalesce(F.expr(expr), F.lit(True))
            bad = read_version(spark, path, v0).filter(~ok).limit(1).collect()
            if bad:
                raise ConstraintViolationError(
                    f"{_CHECK_MARKER} {name} ({expr}) is violated by "
                    f"existing row {bad[0].asDict()}; not added"
                )
        if current_version(path) != v0:
            raise ConcurrentCommitError(
                f"table advanced past v{v0} during constraint "
                "validation; retry add_constraint against the new "
                "snapshot"
            )
        cons[name] = expr
        _atomic_json(os.path.join(path, CONSTRAINTS_FILE), cons)


def drop_constraint(
    path: str, name: str, expected_current: int | None = None
) -> None:
    with _constraints_lock(path):
        _occ_check(path, expected_current)
        cons = table_constraints(path)
        del cons[name]
        _atomic_json(os.path.join(path, CONSTRAINTS_FILE), cons)


def _guard_constraints(df: DataFrame, path: str) -> DataFrame:
    """Wrap a to-be-written frame with inline per-row constraint
    guards: assert_true(ok, msg) raises inside the write scan for the
    first violating row (msg includes the row as JSON — evaluated
    only on the failure branch), and passes rows through otherwise.
    One fused pass; no separate validation job."""
    cons = table_constraints(path)
    if not cons:
        return df
    pred = None
    row_json = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    for name in sorted(cons):
        expr = cons[name]
        ok = F.coalesce(F.expr(expr), F.lit(True))  # NULL passes (SQL CHECK)
        msg = F.concat(
            F.lit(f"{_CHECK_MARKER} {name} ({expr}) violated by row: "),
            row_json,
        )
        chk = F.assert_true(ok, msg).isNull()
        pred = chk if pred is None else (pred & chk)
    return df.filter(pred)


def _guarded_write(df: DataFrame, path: str, write_fn) -> None:
    """Run write_fn over the constraint-guarded frame, converting the
    executor-side assert failure back into ConstraintViolationError
    (the job error wraps our marker message)."""
    try:
        write_fn(_guard_constraints(df, path))
    except ConstraintViolationError:
        raise
    except Exception as e:  # noqa: BLE001 — marker-match, else re-raise
        s = str(e)
        if _CHECK_MARKER in s:
            start = s.find(_CHECK_MARKER)
            raise ConstraintViolationError(s[start:].split("\n")[0]) from e
        raise


def _attempt_data_dir(path: str, v: int) -> str:
    """UNIQUE per-attempt data directory for version v. Deterministic
    `data/v{N}` dirs made concurrent writers mutually destructive: an
    OCC LOSER's mode-overwrite data write could clobber the WINNER's
    already-published files for the contested version number.
    Unique-suffix dirs (the discipline compaction/zorder already
    used, and the reason Iceberg/Delta write uniquely-located files)
    make every attempt's files private: losers and torn attempts
    leave vacuum-reclaimable orphans, never corruption. Manifests
    reference files by relpath, so readers never cared about the dir
    name."""
    return os.path.join(path, "data", f"v{v}-{uuid.uuid4().hex[:8]}")



def commit_version(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    expected_current: int | None = None,
    meta: dict | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Write df as the next snapshot and publish it atomically.

    Order is the whole protocol: (1) data files land in a fresh
    immutable directory, (2) the manifest naming them is written,
    (3) the pointer swaps via os.replace. A crash after any step
    leaves the table at the previous version with no partial state
    visible.

    `expected_current` enables OPTIMISTIC CONCURRENCY: the commit
    aborts (before any pointer movement) if another writer published
    meanwhile — the loser's data files become harmless orphans and
    the caller re-reads and retries, exactly the Iceberg/Delta
    conflict loop. The check-then-replace here has a local-FS TOCTOU
    window; a real deployment closes it with the store's conditional
    put / atomic rename-if-absent, which is a swap of primitive, not
    of protocol. `meta` rides along in the manifest (e.g. the
    streaming sink's batch id — see stream lifecycle below).

    `stats_cols` is WRITE-TIME INDEX MAINTENANCE (what Delta/Iceberg
    do on every write): immediately after the pointer swap, the
    min/max skipping index is refreshed INCREMENTALLY for each named
    column (only this commit's new files' footers are read — see
    build_column_stats), so range probes through `stats_lookup` never
    hit the stale-rebuild path for tables whose writers declare their
    skip columns; a lookup on an undeclared column still rebuilds
    transparently. Maintenance runs AFTER the pointer swap: a failure
    there leaves the commit durable and raises IndexMaintenanceError
    (never the raw error), so callers don't mistake it for a failed
    commit and double-write on retry.
    """
    _occ_check(path, expected_current)
    v = current_version(path) + 1
    data_dir = _attempt_data_dir(path, v)
    _guarded_write(
        df, path, lambda g: g.write.mode("overwrite").parquet(data_dir)
    )
    rel_dir = os.path.relpath(data_dir, path)
    files = sorted(
        os.path.join(rel_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    # schema rides in every manifest so an empty commit (zero part
    # files) stays readable via _empty_snapshot; committed_at backs
    # AS-OF-timestamp time travel (wall clock — an audit attribute,
    # never a correctness input to any query result)
    _publish_manifest(
        path,
        v,
        {"version": v, "files": files, "meta": meta or {},
         "schema": df.schema.json(), "committed_at": time.time()},
        expected_current,
    )
    for col in stats_cols or ():
        try:
            build_column_stats(spark, path, col)
        except Exception as e:  # noqa: BLE001 — commit already durable
            raise IndexMaintenanceError(v, e) from e
    # `bloom_cols` is the point-lookup twin of stats_cols: write-time
    # bloom maintenance (incremental, same carry/harvest split), same
    # post-publish failure contract
    for col in bloom_cols or ():
        try:
            build_bloom_index(spark, path, col)
        except Exception as e:  # noqa: BLE001 — commit already durable
            raise IndexMaintenanceError(v, e) from e
    return v


def manifest_meta(path: str, version: int | None = None) -> dict:
    """The meta dict a commit rode in with (empty for none)."""
    v = current_version(path) if version is None else version
    if v == 0:
        return {}
    with open(_manifest_path(path, v)) as fh:
        return json.load(fh).get("meta", {})


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot (default: current). Resolves the pointer once,
    then reads exactly the manifest's files — immune to concurrent
    commits."""
    v = current_version(path) if version is None else version
    manifest = _manifest(path, v)
    # fully-dead files (every row DV-masked, see delete_rows_dv) are
    # skipped at the scan: the anti-join would drop all their rows
    # anyway, so the skip is pure saved I/O, never a semantic change
    dead = set(manifest.get("dv", {}).get("dead_files", []))
    files = [
        os.path.join(path, f) for f in manifest["files"] if f not in dead
    ]
    if not files:
        return _empty_snapshot(spark, manifest)
    # project_schema (metadata-only evolution) and dv (deletion
    # vector) both apply here — the one snapshot-contract read path
    return _read_files_as_snapshot(spark, manifest, files, path=path)


def read_as_of(spark: SparkSession, path: str, ts: float) -> DataFrame:
    """AS-OF-TIMESTAMP time travel: the snapshot current at wall-clock
    ``ts`` (unix seconds) — ``SELECT ... TIMESTAMP AS OF`` on the
    version chain. Resolution walks the retained manifests' recorded
    commit times (falling back to manifest file mtime for pre-upgrade
    tables) and picks the highest version committed at or before ts;
    versions vacuumed past the horizon or torn commits beyond the
    pointer are never candidates. Commit times are audit attributes
    (wall clock, host-dependent): use version pins for reproducible
    reads; AS OF answers "what did readers see at 3pm".
    """
    cur = current_version(path)
    # walk BACKWARD with early exit: the answer is the HIGHEST version
    # committed at or before ts, so the first hit going down is it —
    # identical result to a full ascending scan (which also keeps the
    # highest satisfying version, monotonic clocks or not), but a
    # recent-ts probe on a 10⁵-commit streaming table opens a handful
    # of manifests instead of all of them
    for v in range(cur, 0, -1):
        mp = _manifest_path(path, v)
        if not os.path.isfile(mp):
            continue  # vacuumed
        with open(mp) as fh:
            committed = json.load(fh).get("committed_at") or os.path.getmtime(mp)
        if committed <= ts:
            return read_version(spark, path, v)
    raise ValueError(
        f"no snapshot of {path} existed at {ts} (earliest retained is newer)"
    )


def _empty_snapshot(spark: SparkSession, manifest: dict) -> DataFrame:
    """A zero-row frame with the committed schema (partitioned
    commits of empty frames have no data files to read)."""
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    return spark.createDataFrame([], schema)


def upsert_version(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    meta: dict | None = None,
) -> int:
    """Last-write-wins MERGE as a new snapshot: current rows not
    matched by an update key carry over, update rows win. One
    anti-join on the key; the commit is the same atomic publish."""
    base = read_version(spark, path)
    merged = updates.unionByName(
        base.join(updates.select(keys).distinct(), on=keys, how="left_anti")
    )
    return commit_version(spark, path, merged, meta=meta)


def _occ_check(path: str, expected_current: int | None) -> None:
    """commit_version's optimistic-concurrency re-check, shared by the
    metadata-only DDL commits: re-run before every shared-name write
    (manifest, pointer) so a losing writer never clobbers the winner's
    manifest for the contested version number."""
    if expected_current is not None and current_version(path) != expected_current:
        raise ConcurrentCommitError(
            f"expected v{expected_current}, found v{current_version(path)}"
        )


def evolve_schema(
    spark: SparkSession,
    path: str,
    added_cols: list[tuple[str, str]],
    expected_current: int | None = None,
) -> int:
    """ALTER TABLE ADD COLUMN as a METADATA-ONLY commit — the
    lakehouse schema-evolution contract (Delta/Iceberg add-column
    touches no data file): the new manifest references every current
    data file UNCHANGED and records only a widened schema; readers
    project old files through it, null-filling the added columns
    (`read_version`'s project_schema path). Cost is O(manifest), zero
    data movement — at 100 TB this is the difference between an
    instant DDL and a full-table rewrite. Columns must be new names;
    added columns are always nullable (the only widening that needs
    no rewrite). Returns the new version. `expected_current` enables
    the same optimistic-concurrency protocol as commit_version: the
    DDL aborts before any shared-name write if another writer
    published meanwhile.
    """
    from pyspark.sql import types as T

    _occ_check(path, expected_current)
    cur = current_version(path)
    if cur == 0:
        raise ValueError("cannot evolve an empty table")
    m = _manifest(path, cur)
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    existing = {f.name for f in schema.fields}
    retired = set(_retired_cols(path))
    for name, dtype in added_cols:
        if name in existing:
            raise ValueError(f"column {name} already exists")
        if name in retired:
            # name-based column mapping: pre-drop files still hold the
            # old physical column under this name, and re-adding it
            # would resurrect those values into the "new" column
            raise ValueError(
                f"column name {name!r} was dropped and is retired "
                "(name-mapped format; reusing it would resurrect "
                "pre-drop values) — pick a fresh name"
            )
        schema = schema.add(name, dtype, nullable=True)
    v = cur + 1
    _publish_manifest(
        path,
        v,
        {
            "version": v,
            "files": m["files"],  # by reference — no data write
            **({"partitions": m["partitions"]} if "partitions" in m else {}),
            **(
                {"partition_col": m["partition_col"]}
                if "partition_col" in m
                else {}
            ),
            "schema": schema.json(),
            "project_schema": True,
            "committed_at": time.time(),
            **({"dv": m["dv"]} if m.get("dv") else {}),
            "meta": {"evolved": [c for c, _ in added_cols]},
        },
        expected_current,
        prev=m,
    )
    return v


RETIRED_COLS_FILE = "_RETIRED_COLS.json"


def _retired_cols(path: str) -> list[str]:
    try:
        with open(os.path.join(path, RETIRED_COLS_FILE)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return []


def unretire_column(path: str, col: str, force: bool = False) -> None:
    """Operator escape hatch for ABORTED-DDL retirement residue
    (ADVICE r15): rename/drop retire the old name BEFORE publishing
    (crash-ordering: retired-but-live is harmless, live-DDL-but-
    unretired resurrects data), so a publish that loses its OCC race
    (ConcurrentCommitError) and is never retried leaves the name
    retired while the column stays live — unversioned residue from a
    commit that officially aborted.

    Safe by construction when the column is STILL IN the current
    schema: that is exactly the aborted-DDL signature, and a live
    name needs no resurrection protection (nothing to re-add). When
    the column is NOT live, unretiring genuinely re-opens the
    name-mapped resurrection hazard — pre-DDL files physically carry
    the old name and a later evolve_schema add would serve their
    stale values — so it is refused unless ``force=True`` (for
    operators who have purged/rewritten every pre-DDL file and
    verified no live file carries the physical column)."""
    retired = _retired_cols(path)
    if col not in retired:
        return
    if not force:
        from pyspark.sql import types as T

        live: set[str] = set()
        cur = current_version(path)
        if cur:
            m = _manifest(path, cur)
            schema = T.StructType.fromJson(json.loads(m["schema"]))
            live = {f.name for f in schema.fields}
        if col not in live:
            raise ValueError(
                f"column {col!r} is retired and NOT in the current "
                "schema — unretiring would let evolve_schema re-add "
                "the name and resurrect its physical values from "
                "pre-DDL files; pass force=True only after rewriting "
                "every file that still carries it"
            )
    _atomic_json(
        os.path.join(path, RETIRED_COLS_FILE),
        [c for c in retired if c != col],
    )


def drop_column(
    spark: SparkSession,
    path: str,
    col: str,
    expected_current: int | None = None,
) -> int:
    """ALTER TABLE DROP COLUMN as a METADATA-ONLY commit: the new
    manifest references every data file unchanged and records a
    NARROWER schema — readers project through it, so the parquet
    reader never even decodes the dropped column's pages (columnar
    pruning makes the logical drop also an I/O drop). Time travel to
    pre-drop versions still serves the column; physical bytes remain
    in the immutable files (like Delta, DROP is logical — a
    compaction/purge-style rewrite is the physical-erasure path).

    The name-mapping hazard, handled: this format maps logical to
    physical columns BY NAME (Delta needs column-mapping IDs to allow
    DROP; we are name-mapped), so re-adding a dropped name would
    silently RESURRECT the old physical values from pre-drop files.
    Dropped names are therefore retired in `_RETIRED_COLS.json`
    (atomically-swapped table property, same pattern as CHECK
    constraints) and evolve_schema refuses them forever. Also
    refused: partition/cluster columns (their values live in the
    directory layout), columns referenced by a live CHECK constraint,
    and dropping the last column. Index pointers on the column are
    removed (they self-invalidate on version bump anyway)."""
    import re as _re

    from pyspark.sql import types as T

    _occ_check(path, expected_current)
    cur = current_version(path)
    if cur == 0:
        raise ValueError("cannot evolve an empty table")
    m = _manifest(path, cur)
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    if col not in {f.name for f in schema.fields}:
        raise ValueError(f"no such column {col!r}")
    if len(schema.fields) == 1:
        raise ValueError("cannot drop the last column")
    pc = m.get("partition_col") or ("partitions" in m and PART_COL)
    if pc and col == pc:
        raise ValueError(
            f"{col!r} is the partition/cluster column; its values live "
            "in the directory layout — repartition the table instead"
        )
    if "partitions" in m and not m.get("partition_col"):
        # day-partitioned tables strip PART_COL before recording the
        # schema, so the column the layout actually DERIVES from is
        # the manifest's ts_col (recorded at commit since r14) — and
        # dropping it would retire the name and permanently brick
        # every subsequent COW/MERGE write (ADVICE r13 medium).
        # Legacy manifests without ts_col: conservatively refuse any
        # timestamp-typed column.
        derives = m.get("ts_col")
        field_type = {f.name: f.dataType.typeName() for f in schema.fields}
        if (derives and col == derives) or (
            not derives and field_type.get(col) == "timestamp"
        ):
            raise ValueError(
                f"{col!r} derives the table's day-partition layout "
                "(with_partition_col); dropping it would break every "
                "subsequent partitioned write and the retired name "
                "could never be re-added — repartition the table "
                "instead"
            )
    for name, expr in table_constraints(path).items():
        if _re.search(rf"\b{_re.escape(col)}\b", expr):
            raise ValueError(
                f"column {col!r} is referenced by CHECK constraint "
                f"{name!r} ({expr}); drop the constraint first"
            )
    new_schema = T.StructType([f for f in schema.fields if f.name != col])
    v = cur + 1
    # Retire BEFORE publish — same crash-window ordering as
    # rename_column: retired-but-still-live is harmless (retirement
    # only gates ADDING a name), dropped-but-unretired lets a later
    # evolve_schema re-add the name and resurrect pre-drop physical
    # values (ADVICE r14). Residue note (ADVICE r15): if the publish
    # below ABORTS (ConcurrentCommitError) and is never retried, the
    # retirement persists while the column stays live — unversioned
    # state from an aborted commit. Deliberate trade against the
    # resurrection hazard; unretire_column is the audited escape hatch.
    retired = _retired_cols(path)
    if col not in retired:
        _atomic_json(
            os.path.join(path, RETIRED_COLS_FILE), retired + [col]
        )
    _publish_manifest(
        path,
        v,
        {
            "version": v,
            "files": m["files"],  # by reference — no data write
            **({"partitions": m["partitions"]} if "partitions" in m else {}),
            **(
                {"partition_col": m["partition_col"]}
                if "partition_col" in m
                else {}
            ),
            "schema": new_schema.json(),
            "project_schema": True,
            "committed_at": time.time(),
            **({"dv": m["dv"]} if m.get("dv") else {}),
            "meta": {"dropped": [col]},
        },
        expected_current,
        prev=m,
    )
    for pointer in (f"_BLOOM_{col}.json", f"_STATS_{col}.json"):
        try:
            os.remove(os.path.join(path, pointer))
        except FileNotFoundError:
            pass
    return v


RENAMES_DIR = "_renames"

# ALTER COLUMN TYPE widening lattice — exactly the promotions Spark's
# parquet reader performs losslessly at scan time under an explicit
# wider schema (probed: int32 pages under bigint/double, float under
# double, decimal precision growth), which is what makes the DDL
# metadata-only. Delta's "type widening" table feature is the analog
# (it also gates on reader-side upcast support).
_WIDENINGS: set[tuple[str, str]] = {
    ("byte", "short"), ("byte", "integer"), ("byte", "long"),
    ("short", "integer"), ("short", "long"),
    ("integer", "long"),
    ("byte", "double"), ("short", "double"), ("integer", "double"),
    ("float", "double"),
}


def _is_widening(frm, to) -> bool:
    a, b = frm.typeName(), to.typeName()
    if (a, b) in _WIDENINGS:
        return True
    if a == "decimal" and b == "decimal":
        return (
            to.scale == frm.scale and to.precision > frm.precision
        ) or (
            to.scale > frm.scale
            and to.precision - to.scale >= frm.precision - frm.scale
        )
    return False


def widen_column_type(
    spark: SparkSession,
    path: str,
    col: str,
    new_type: str,
    expected_current: int | None = None,
) -> int:
    """ALTER TABLE ALTER COLUMN TYPE (widening only) as a
    METADATA-ONLY commit — Delta's type-widening table feature on
    this format: the new manifest references every data file
    unchanged and records the WIDER type; every read path already
    scans under the manifest's explicit schema, and Spark's parquet
    reader upcasts narrow physical pages losslessly at the scan
    (int→long, int→double, float→double, decimal precision growth —
    the _WIDENINGS lattice). Zero data movement at any table size;
    files written after the DDL carry the wide type physically, and
    mixed-generation snapshots need no extra machinery (unlike
    RENAME, the reader's upcast does the mapping). Narrowing and
    non-lossless changes are refused — they would need a full
    rewrite, which is a different operation (COW rewrite), not a
    footgun this DDL should hide. Composes with RENAME: the
    physical-name groups read old-name columns under the wide type.

    CDF caveat (documented, Delta shares it): table_changes ACROSS a
    float→double widening boundary may emit representation-only
    update pairs (the row fingerprint renders float 0.1 and its exact
    double image differently); integer and decimal widenings are
    render-stable."""
    from pyspark.sql import types as T

    _occ_check(path, expected_current)
    cur = current_version(path)
    if cur == 0:
        raise ValueError("cannot evolve an empty table")
    m = _manifest(path, cur)
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    by_name = {f.name: f for f in schema.fields}
    if col not in by_name:
        raise ValueError(f"no such column {col!r}")
    target = getattr(T, "_parse_datatype_string")(new_type)
    frm = by_name[col].dataType
    if frm == target:
        return cur  # nothing to do: no churn commit
    if not _is_widening(frm, target):
        raise ValueError(
            f"cannot change {col!r} from {frm.simpleString()} to "
            f"{target.simpleString()}: only lossless widenings are "
            "metadata-only (rewrite the table for anything else)"
        )
    pc = m.get("partition_col")
    if pc and col == pc:
        raise ValueError(
            f"{col!r} is the partition/cluster column; its values live "
            "in the directory layout"
        )
    new_fields = [
        T.StructField(
            f.name, target if f.name == col else f.dataType, f.nullable,
            f.metadata,
        )
        for f in schema.fields
    ]
    v = cur + 1
    _publish_manifest(
        path,
        v,
        {
            "version": v,
            "files": m["files"],  # by reference — no data write
            **({"partitions": m["partitions"]} if "partitions" in m else {}),
            **({"partition_col": pc} if pc else {}),
            "schema": T.StructType(new_fields).json(),
            **({"project_schema": True} if m.get("project_schema") else {}),
            "committed_at": time.time(),
            **({"dv": m["dv"]} if m.get("dv") else {}),
            "meta": {
                "widened": {
                    "col": col,
                    "from": frm.simpleString(),
                    "to": target.simpleString(),
                }
            },
        },
        expected_current,
        prev=m,
    )
    return v


def rename_column(
    spark: SparkSession,
    path: str,
    old: str,
    new: str,
    expected_current: int | None = None,
) -> int:
    """ALTER TABLE RENAME COLUMN as a METADATA-ONLY commit. Delta
    gates RENAME behind column-mapping IDs; this name-mapped format
    gets the same effect with a PER-FILE PHYSICAL-NAME MAP: data
    files are immutable and store the column under the name it had
    when they were written, so the rename commit records — in one
    immutable sidecar list (`_renames/`) referenced from the
    manifest — exactly which files physically carry the old name.
    Readers (_scan_with_renames) group files by physical-name
    signature and alias physical→logical at the scan; files written
    AFTER the rename carry the new name and need no entry, and
    rewrite maintenance (compaction) normalizes physical names on
    output (_normalize_renamed), so the map only ever shrinks as the
    table churns. Manifests carry O(#renames) pointer bytes, never
    the file list itself — the DDL is O(current file count) once, and
    every later commit is unaffected (the 100 TB requirement).

    Time travel serves BOTH names correctly: pre-rename manifests
    record the old schema and no map entry for the new name, so old
    versions read the old name straight from the files; renames
    CHAIN (a→b→c) because the new entry list carries the prior
    entries forward under the new logical name. The old name is
    retired (`_RETIRED_COLS.json`) — re-adding it via evolve_schema
    refuses forever, since pre-rename files would resurrect the old
    physical values into the "new" column (the DROP COLUMN hazard,
    same mechanism). Refused: partition/cluster columns, the
    day-partition-deriving ts_col, and columns referenced by a live
    CHECK constraint (drop the constraint first — rewriting its SQL
    by regex is not a contract). Index pointers follow the rename
    (pointer file + recorded col name); their sidecar rows are
    column-agnostic (file/min/max), so incremental refresh keeps
    working across the rename. Reference analog: column ownership in
    migrations/db.sql:5-15 (the reference alters its schema with SQL
    DDL; this format's DDL story needed the same verb)."""
    import re as _re

    from pyspark.sql import types as T

    _occ_check(path, expected_current)
    cur = current_version(path)
    if cur == 0:
        raise ValueError("cannot evolve an empty table")
    m = _manifest(path, cur)
    schema = T.StructType.fromJson(json.loads(m["schema"]))
    names = {f.name for f in schema.fields}
    if old not in names:
        raise ValueError(f"no such column {old!r}")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    if new in _retired_cols(path):
        raise ValueError(
            f"column name {new!r} was dropped or renamed away and is "
            "retired (name-mapped format; reusing it would resurrect "
            "old physical values) — pick a fresh name"
        )
    pc = m.get("partition_col")
    if pc and old == pc:
        raise ValueError(
            f"{old!r} is the partition/cluster column; its values live "
            "in the directory layout — repartition the table instead"
        )
    if "partitions" in m and not m.get("partition_col"):
        derives = m.get("ts_col")
        field_type = {f.name: f.dataType.typeName() for f in schema.fields}
        if (derives and old == derives) or (
            not derives and field_type.get(old) == "timestamp"
        ):
            raise ValueError(
                f"{old!r} derives the table's day-partition layout and "
                "writers name it explicitly (ts_col) — renaming it "
                "would break every subsequent partitioned write"
            )
    for cname, expr in table_constraints(path).items():
        if _re.search(rf"\b{_re.escape(old)}\b", expr):
            raise ValueError(
                f"column {old!r} is referenced by CHECK constraint "
                f"{cname!r} ({expr}); drop the constraint first"
            )

    prev_ren = dict(m.get("renames") or {})
    chain = list(prev_ren.pop(old, []))
    already: set[str] = set()
    for e in chain:
        already |= _load_rename_files(path, e["files_ref"])
    # every current file not mapped by a PRIOR rename of this column
    # physically carries `old` (it was written while `old` was the
    # logical name)
    carry_old = sorted(f for f in m["files"] if f not in already)
    v = cur + 1
    entries = chain
    if carry_old:
        os.makedirs(os.path.join(path, RENAMES_DIR), exist_ok=True)
        ref = os.path.join(RENAMES_DIR, f"v{v}-{old}-to-{new}.json")
        _atomic_json(os.path.join(path, ref), carry_old)
        entries = chain + [{"from": old, "files_ref": ref}]
    new_fields = [
        T.StructField(
            new if f.name == old else f.name,
            f.dataType,
            f.nullable,
            f.metadata,
        )
        for f in schema.fields
    ]
    renames = {**prev_ren, **({new: entries} if entries else {})}
    # Retire the old name BEFORE publishing the rename manifest: a
    # crash between the two must err on the side of the name being
    # retired-but-still-live (harmless — evolve_schema only consults
    # retirement when ADDING a name, and a live column is never
    # re-added), never rename-live-but-unretired, where a later
    # evolve_schema could re-add `old` and pre-rename files would
    # serve a physical read schema with duplicate field names — the
    # resurrection hazard retirement exists to block (ADVICE r14).
    # Residue note (ADVICE r15): an ABORTED publish
    # (ConcurrentCommitError, never retried) leaves `old` retired but
    # still live — unretire_column is the audited escape hatch.
    retired = _retired_cols(path)
    if old not in retired:
        _atomic_json(os.path.join(path, RETIRED_COLS_FILE), retired + [old])
    _publish_manifest(
        path,
        v,
        {
            "version": v,
            "files": m["files"],  # by reference — no data write
            **({"partitions": m["partitions"]} if "partitions" in m else {}),
            **(
                {"partition_col": m["partition_col"]}
                if "partition_col" in m
                else {}
            ),
            "schema": T.StructType(new_fields).json(),
            **({"project_schema": True} if m.get("project_schema") else {}),
            **({"renames": renames} if renames else {}),
            "committed_at": time.time(),
            **({"dv": m["dv"]} if m.get("dv") else {}),
            "meta": {"renamed": {"from": old, "to": new}},
        },
        expected_current,
        prev=m,
    )
    for kind in ("_BLOOM_", "_STATS_"):
        src = os.path.join(path, f"{kind}{old}.json")
        if os.path.isfile(src):
            try:
                with open(src) as fh:
                    payload = json.load(fh)
                # stats pointers record the column as 'col', bloom
                # pointers as 'key_col' — migrate whichever is
                # present, else _incremental_prior's require check
                # never matches again and the advertised pointer-
                # follow silently degrades to a full rebuild on every
                # refresh (ADVICE r14).
                if payload.get("col") == old:
                    payload["col"] = new
                if payload.get("key_col") == old:
                    payload["key_col"] = new
                _atomic_json(
                    os.path.join(path, f"{kind}{new}.json"), payload
                )
                os.remove(src)
            except (OSError, json.JSONDecodeError):
                pass
    # identity high-water follows the rename (r15: the property is
    # keyed by column name; a stranded key would read as hwm 0 under
    # the new name and the next append would reuse assigned ids).
    # Whole read-modify-write under the identity flock — the same
    # lost-update argument as advance_identity.
    import fcntl as _fcntl

    with open(os.path.join(path, IDENTITY_FILE + ".lock"), "a") as lf:
        _fcntl.flock(lf, _fcntl.LOCK_EX)
        try:
            try:
                with open(os.path.join(path, IDENTITY_FILE)) as fh:
                    ident = json.load(fh)
            except FileNotFoundError:
                ident = {}
            if old in ident:
                ident[new] = max(int(ident.get(new, 0)), int(ident.pop(old)))
                _atomic_json(os.path.join(path, IDENTITY_FILE), ident)
        finally:
            _fcntl.flock(lf, _fcntl.LOCK_UN)
    return v


# --- deletion vectors: O(deleted rows) row-level DELETE ------------
# The Delta Lake deletion-vector / Iceberg positional-delete
# construction: a DELETE commit writes only a parquet sidecar of
# (file relpath, row ordinal) keys plus a metadata-only manifest that
# references every data file UNCHANGED — no rewrite, no position
# shift. Readers anti-join the DV during the scan. At 100 TB this is
# the difference between deleting k rows in O(k) and rewriting every
# touched file (upsert_version_cow's COW path) — the write/read
# trade both formats ship: reads pay one small anti-join until
# materialize_deletes() folds the DV into a fresh snapshot.
DV_DIR = "_dv"


def _tagged_scan(spark: SparkSession, path: str, m: dict) -> DataFrame:
    """The manifest's files with (__dv_file, __dv_pos) row identity
    attached from the scan's `_metadata` struct — relpath via the same
    anchored strip the bloom index uses, position from
    `_metadata.row_index` (scan bookkeeping, zero extra I/O). Tagging
    happens inside _scan_with_renames, per physical-name group."""
    return _scan_with_renames(
        spark,
        m,
        [os.path.join(path, f) for f in m["files"]],
        path=path,
        tag=True,
    )


def delete_rows_dv(
    spark: SparkSession,
    path: str,
    predicate,
    expected_current: int | None = None,
    meta: dict | None = None,
) -> int:
    """Row-level DELETE as a deletion-vector commit: rows matching
    `predicate` (a Column or SQL string) are soft-deleted by position.
    The commit writes ONE parquet sidecar (`_dv/v{N}-…`: file, pos)
    holding the cumulative deleted set — prior DV rows carry in, the
    new matches append — and publishes a manifest that references the
    SAME data files (delta-encoded: O(1) manifest bytes). Matching
    runs over the DV-filtered snapshot, so re-deleting an
    already-deleted row is a no-op and the sidecar never holds
    duplicates. Cost: one predicate scan + O(total deleted) sidecar
    write; zero data-file writes. Deletes are snapshot-isolated:
    time travel to an earlier version still sees the rows
    (tests/test_versioned.py). Same OCC protocol as commit_version.

    Rewrite-maintenance interplay: compact_files and purge_rows
    REFUSE a DV-bearing snapshot (their rewrites shift row ordinals,
    which would corrupt position-keyed deletes) — run
    materialize_deletes first. upsert_version_cow, evolve_schema,
    append_version_clustered and drop_partitions_before carry the DV
    pointer by reference, which is always sound: DV rows naming files
    a later commit rewrote or dropped can never match a scan of that
    commit's files (see _read_files_as_snapshot).

    DV-AWARE INDEX MAINTENANCE (VERDICT r12 task 7): when the table
    has bloom/stats index pointers, the commit also computes
    `dead_files` — files whose EVERY row the cumulative DV now masks
    (per-file DV counts vs parquet footer row counts) — and records
    the list in the dv pointer. Probes and read_version skip dead
    files, so candidate lists stop growing on delete-heavy tables
    instead of serving dead files forever until materialize_deletes;
    index sidecar rows for dead files become inert, never stale
    (reads of the remaining files are unchanged). Without index
    pointers the commit is METADATA-ONLY after the sidecar write: the
    cumulative row count comes from the sidecar's parquet footers
    (driver-side, no Spark job — VERDICT r12 finding d)."""
    _occ_check(path, expected_current)
    m = _manifest(path)
    _refuse_external(m, "delete_rows_dv")
    if m["version"] == 0:
        raise ValueError("cannot delete from an empty table")
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    abs_root = os.path.abspath(path)
    v = m["version"] + 1
    sidecar_rel = os.path.join(DV_DIR, f"v{v}-{uuid.uuid4().hex[:8]}")
    sidecar_dir = os.path.join(abs_root, sidecar_rel)

    # prior dead files have no live rows: skip their scan entirely
    prior_dead = set(m.get("dv", {}).get("dead_files", []))
    live_files = [f for f in m["files"] if f not in prior_dead]
    tagged = (
        _tagged_scan(spark, path, {**m, "files": live_files})
        if live_files
        else None
    )
    prior_dv = (
        spark.read.schema("file string, pos bigint").parquet(
            os.path.join(path, m["dv"]["sidecar"])
        )
        if m.get("dv")
        else None
    )
    if tagged is not None and prior_dv is not None:
        tagged = tagged.join(
            prior_dv.select(
                F.col("file").alias("__dv_file"),
                F.col("pos").alias("__dv_pos"),
            ),
            ["__dv_file", "__dv_pos"],
            "left_anti",
        )
    matched = (
        tagged.filter(cond).select(
            F.col("__dv_file").alias("file"),
            F.col("__dv_pos").cast("bigint").alias("pos"),
        )
        if tagged is not None
        else spark.createDataFrame([], "file string, pos bigint")
    )
    out = matched if prior_dv is None else prior_dv.unionByName(matched)
    out.repartition(_index_shards(max(1, len(m["files"])))).write.mode(
        "overwrite"
    ).parquet(sidecar_dir)
    n_dv, dead_files = _dv_sidecar_stats(spark, path, sidecar_dir, m)
    if n_dv == 0:
        # nothing was ever deleted: commit WITHOUT a dv key so readers
        # never pay the anti-join for an empty sidecar (the orphan dir
        # is vacuum-reclaimable); still a real commit — the caller
        # observed "delete ran, matched nothing" at a new version
        manifest = {
            "version": v,
            "files": m["files"],
            **({"partitions": m["partitions"]} if "partitions" in m else {}),
            **(
                {"partition_col": m["partition_col"]}
                if "partition_col" in m
                else {}
            ),
            "schema": m["schema"],
            **({"project_schema": True} if m.get("project_schema") else {}),
            "committed_at": time.time(),
            "meta": {**(meta or {}), "dv_rows": 0},
        }
        _publish_manifest(path, v, manifest, expected_current, prev=m)
        return v
    manifest = {
        "version": v,
        "files": m["files"],
        **({"partitions": m["partitions"]} if "partitions" in m else {}),
        **({"partition_col": m["partition_col"]} if "partition_col" in m else {}),
        "schema": m["schema"],
        **({"project_schema": True} if m.get("project_schema") else {}),
        "committed_at": time.time(),
        "meta": {**(meta or {}), "dv_rows": n_dv},
        "dv": {
            "sidecar": sidecar_rel,
            "rows": n_dv,
            **({"dead_files": dead_files} if dead_files else {}),
        },
    }
    _publish_manifest(path, v, manifest, expected_current, prev=m)
    return v


def _dv_sidecar_stats(
    spark: SparkSession, path: str, sidecar_dir: str, m: dict
) -> tuple[int, list[str]]:
    """(cumulative DV row count, fully-dead file relpaths) for a
    just-written DV sidecar. The count comes from the sidecar's
    parquet FOOTERS — driver-side metadata, no Spark job (the r12
    spark.read.count() here was VERDICT finding d). Dead-file
    detection (per-file DV counts vs data-file footer row counts)
    costs one small aggregation job over the sidecar, so it runs ONLY
    when the table has index pointers to serve from — the tables
    where unbounded dead-candidate growth actually hurts. Both
    footer passes touch O(sidecar shards) + O(DV-touched files)
    metadata, never data pages."""
    import glob as _glob

    import pyarrow.parquet as _pq

    parts = sorted(_glob.glob(os.path.join(sidecar_dir, "*.parquet")))
    n_dv = sum(_pq.ParquetFile(f).metadata.num_rows for f in parts)
    if n_dv == 0:
        return 0, []
    has_index = bool(
        _glob.glob(os.path.join(path, "_BLOOM_*.json"))
        or _glob.glob(os.path.join(path, "_STATS_*.json"))
    )
    if not has_index:
        return n_dv, []
    counts = {
        r.file: r.cnt
        for r in spark.read.schema("file string, pos bigint")
        .parquet(sidecar_dir)
        .groupBy("file")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    abs_root = os.path.abspath(path)
    manifest_files = set(m["files"])
    dead = []
    for rel, cnt in counts.items():
        if rel not in manifest_files:
            continue  # names a file a later commit rewrote — inert
        if cnt >= _pq.ParquetFile(os.path.join(abs_root, rel)).metadata.num_rows:
            dead.append(rel)
    return n_dv, sorted(dead)


def materialize_deletes(
    spark: SparkSession, path: str, meta: dict | None = None
) -> int:
    """Fold the current deletion vector into a fresh DV-free snapshot
    (Delta's REORG TABLE ... APPLY (PURGE)): one full read through the
    anti-join, one rewrite commit. Run before compact_files /
    purge_rows, or when accumulated DVs make the per-read anti-join
    tax noticeable. No-op (returns the current version) when no DV is
    present. Note: the rewrite commits unpartitioned — re-cluster with
    commit_version_clustered / upsert-time partitioning as a separate
    maintenance step if the table was partitioned (reading an explicit
    file list does not recover partition-directory columns)."""
    m = _manifest(path)
    if not m.get("dv"):
        return m["version"]
    df = read_version(spark, path)
    return commit_version(
        spark,
        path,
        df,
        meta={**(meta or {}), "materialized_dv_rows": m["dv"]["rows"]},
    )


def update_rows_mor(
    spark: SparkSession,
    path: str,
    predicate,
    assignments: dict,
    expected_current: int | None = None,
    meta: dict | None = None,
) -> int:
    """Row-level UPDATE as a MERGE-ON-READ commit — the Delta
    deletion-vector UPDATE / Iceberg MOR construction: ONE atomic
    commit that (a) extends the cumulative DV with the positions of
    every LIVE row matching `predicate` (their old images go dark)
    and (b) appends fresh data files holding those rows' UPDATED
    images (`assignments`: column → Column/SQL-string expression
    evaluated against the old row). Cost is O(matched rows + DV), and
    ZERO existing files are rewritten — at 100 TB, updating one key's
    rows costs those rows, not their files (upsert_version_cow's COW
    path rewrites touched partitions; plain upsert_version rewrites
    the table). Readers need no new machinery: appended files carry
    no DV entries by construction and old images anti-join out
    through the one shared read path.

    Publish order inside the commit: updated-image files land first,
    then the DV sidecar, then the manifest naming both — a crash
    between any two leaves the prior snapshot intact and only
    vacuum-reclaimable orphans behind. Schema is invariant
    (assignments replace values, never add columns — this engine's
    evolve_schema is the metadata-only DDL for that). Repeated
    updates are plain UPDATE semantics: a second run re-matches rows
    whose updated image still satisfies the predicate. Partitioned /
    clustered snapshots are refused (appended files would lack
    partition tags and silently vanish from pruned reads —
    upsert_version_cow is the partitioned-table update path). Same
    OCC protocol, same maintenance interplay as delete_rows_dv
    (compact/purge refuse until materialize_deletes folds the DV)."""
    _occ_check(path, expected_current)
    m = _manifest(path)
    _refuse_external(m, "update_rows_mor")
    if m["version"] == 0:
        raise ValueError("cannot update an empty table")
    if "partitions" in m or "partition_col" in m:
        raise ValueError(
            "update_rows_mor supports unpartitioned snapshots; use "
            "upsert_version_cow for partition-granular updates"
        )
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    abs_root = os.path.abspath(path)
    v = m["version"] + 1

    prior_dead = set(m.get("dv", {}).get("dead_files", []))
    live_files = [f for f in m["files"] if f not in prior_dead]
    prior_dv = (
        spark.read.schema("file string, pos bigint").parquet(
            os.path.join(path, m["dv"]["sidecar"])
        )
        if m.get("dv")
        else None
    )
    tagged = (
        _tagged_scan(spark, path, {**m, "files": live_files})
        if live_files
        else None
    )
    if tagged is not None and prior_dv is not None:
        tagged = tagged.join(
            prior_dv.select(
                F.col("file").alias("__dv_file"),
                F.col("pos").alias("__dv_pos"),
            ),
            ["__dv_file", "__dv_pos"],
            "left_anti",
        )
    if tagged is None:
        return m["version"]  # empty table: nothing to update
    # matched feeds TWO writes (updated images + DV extension); the
    # barrier stops the predicate scan from running twice and pins
    # one consistent match set under both
    matched = tagged.filter(cond).localCheckpoint(eager=True)
    n_matched = matched.count()  # over checkpointed blocks: metadata-cheap
    if n_matched == 0:
        # nothing matched: still a real commit (the caller observed
        # "update ran, matched nothing" at a new version), carrying
        # files AND the prior DV pointer untouched — no sidecar, no
        # data write, no orphans
        _publish_manifest(
            path,
            v,
            {
                "version": v,
                "files": m["files"],
                "schema": m["schema"],
                **({"project_schema": True} if m.get("project_schema") else {}),
                "committed_at": time.time(),
                "meta": {**(meta or {}), "updated_rows": 0},
                **({"dv": m["dv"]} if m.get("dv") else {}),
            },
            expected_current,
            prev=m,
        )
        return v

    data_cols = [c for c in matched.columns if not c.startswith("__dv_")]
    for col_name in assignments:
        if col_name not in data_cols:
            raise ValueError(f"assignment to unknown column {col_name!r}")
    updated = matched.select(
        *[
            (
                (
                    F.expr(assignments[c])
                    if isinstance(assignments[c], str)
                    else assignments[c]
                ).alias(c)
                if c in assignments
                else F.col(c)
            )
            for c in data_cols
        ]
    )
    data_dir = _attempt_data_dir(path, v)
    _guarded_write(
        updated, path, lambda g: g.write.mode("overwrite").parquet(data_dir)
    )
    rel_dir = os.path.relpath(data_dir, path)
    new_files = sorted(
        os.path.join(rel_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )

    sidecar_rel = os.path.join(DV_DIR, f"v{v}-{uuid.uuid4().hex[:8]}")
    sidecar_dir = os.path.join(abs_root, sidecar_rel)
    masked = matched.select(
        F.col("__dv_file").alias("file"),
        F.col("__dv_pos").cast("bigint").alias("pos"),
    )
    out = masked if prior_dv is None else prior_dv.unionByName(masked)
    out.repartition(_index_shards(max(1, len(m["files"])))).write.mode(
        "overwrite"
    ).parquet(sidecar_dir)
    files = sorted(list(m["files"]) + new_files)
    n_dv, dead_files = _dv_sidecar_stats(
        spark, path, sidecar_dir, {**m, "files": files}
    )
    manifest = {
        "version": v,
        "files": files,
        "schema": m["schema"],
        **({"project_schema": True} if m.get("project_schema") else {}),
        "committed_at": time.time(),
        "meta": {**(meta or {}), "updated_rows": n_matched},
        "dv": {
            "sidecar": sidecar_rel,
            "rows": n_dv,
            **({"dead_files": dead_files} if dead_files else {}),
        },
    }
    _publish_manifest(path, v, manifest, expected_current, prev=m)
    return v


def update_mor_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: commit events, then merge-on-read UPDATE every
    'error' event's value (+1000) — one commit, zero rewritten files
    (file-reuse, time travel and double-update semantics pinned in
    tests/test_versioned.py). The current snapshot must equal the
    CASE-expression scan of the source (DuckDB oracle)."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("update_mor", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev.repartition(8))
    update_rows_mor(
        spark,
        path,
        F.col("event_type") == "error",
        {"value": F.col("value") + 1000.0},
    )
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


class MergeCardinalityError(RuntimeError):
    """Multiple source rows matched (and tried to modify) the same
    target row — the merge is non-deterministic, refuse (the same
    contract Delta's MERGE enforces)."""


def _validate_merge_spec(
    target_schema, when_matched, insert_not_matched
) -> tuple[list[str], dict]:
    """Shared clause validation for the MOR and COW merge paths:
    clause ops, assignment targets, insert-column completeness.
    Returns (data_cols, col→type)."""
    data_cols = [f.name for f in target_schema.fields]
    col_type = {f.name: f.dataType for f in target_schema.fields}
    for op, assigns, _cond in when_matched:
        if op not in ("update", "delete"):
            raise ValueError(f"unknown matched clause {op!r}")
        if op == "delete" and assigns:
            raise ValueError("delete clause takes no assignments")
        for c in assigns or {}:
            if c not in col_type:
                raise ValueError(f"assignment to unknown column {c!r}")
    if isinstance(insert_not_matched, dict):
        missing = set(data_cols) - set(insert_not_matched)
        if missing:
            raise ValueError(f"insert clause missing columns {sorted(missing)}")
    return data_cols, col_type


def _merge_action_col(when_matched, matched_flag):
    """The first-matching-clause-wins routing column (NULL = matched
    row satisfying no clause, or unmatched row)."""
    chain = None
    for i, (_op, _assigns, ccond) in enumerate(when_matched):
        c = F.expr(ccond) if ccond else F.lit(True)
        chain = F.when(c, F.lit(i)) if chain is None else chain.when(c, F.lit(i))
    if chain is None:
        return F.lit(None).cast("int")
    return F.when(matched_flag, chain)


def merge_into_mor(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    when_matched: list[tuple] = (),
    insert_not_matched: bool | dict = False,
    insert_not_matched_cond: str | None = None,
    expected_current: int | None = None,
    meta: dict | None = None,
    prune_on: str | None = None,
) -> int:
    """Three-clause MERGE INTO as ONE merge-on-read commit — the full
    Delta `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED [AND c]
    THEN UPDATE/DELETE WHEN NOT MATCHED THEN INSERT` statement over
    this table format (reference analog: the consumer's per-key
    upsert, services/consumer/main.py:225-249, generalized to
    conditional update/delete/insert in one atomic commit).

    `when_matched` is an ORDERED list of clauses, each
    ``("update", {col: sql_expr}, cond_sql_or_None)`` or
    ``("delete", None, cond_sql_or_None)``; per matched row the FIRST
    clause whose condition holds applies (Delta clause-order
    semantics), and a matched row satisfying no clause is untouched.
    Expressions and conditions are SQL strings referencing the target
    as ``t.<col>`` and the source as ``s.<col>``.
    `insert_not_matched`: True inserts source columns by target
    column name; a dict gives per-target-column ``s.``-expressions.
    `insert_not_matched_cond` is the WHEN NOT MATCHED **AND cond**
    guard (SQL over ``s.``): an unmatched source row failing it is
    dropped, not inserted — load-bearing for CDC application, where a
    replayed `delete` change row must not resurrect as an insert
    (apply_changes_mor).

    Physical shape (the 100 TB story): ONE INNER equi-join of the
    live snapshot against the source — broadcast-eligible for a small
    source on either join side (the CDC-batch case; a right-outer
    formulation would have pinned the broadcast to the huge target
    side and forced a full target shuffle) — feeding (a) a DV
    extension with every updated or deleted row's position, and (b)
    appended files holding updated images + inserts. The NOT MATCHED
    set is source − matched-keys via a broadcast anti-join against
    the checkpointed (source-bounded) matched key set — no second
    target scan; a null-keyed source row never matches and therefore
    INSERTS under the clause guard, Delta's null-merge-key
    semantics. Zero existing files are rewritten: cost is
    O(live-scan + matched + inserts), exactly update_rows_mor /
    delete_rows_dv composed, and a merge that matches one key costs
    that key's rows, not their files. Source cardinality is enforced:
    two source rows modifying the same target row raise
    MergeCardinalityError (checked over the pinned match set before
    any write). Publish order: image files → DV sidecar → manifest,
    so a crash leaves the prior snapshot intact and only
    vacuum-reclaimable orphans. Unpartitioned snapshots only, same
    rule and reason as update_rows_mor.

    ``prune_on=<merge key>`` (r16) removes the last O(table) term —
    the full live-file SCAN feeding the match join (measured as the
    dominant merge cost once the write side went O(emitted):
    SESSION_SINK_GROWTH.json). The stats index on that key is
    refreshed incrementally (O(files added since last refresh) footer
    reads — build_column_stats carries surviving rows by reference),
    the source's [min, max] on the key is taken in one pass, and only
    files whose footer interval overlaps it are scanned: a file the
    probe prunes provably contains NO row equal to any source key
    (the no-false-negative contract tests/test_properties.py pins),
    and an unmatched target row is untouched by MERGE semantics, so
    the result is bit-identical to the unpruned merge
    (tests/test_versioned.py::test_merge_prune_matches_unpruned_exactly).
    Per-batch cost becomes O(new footers + candidate files + emitted)
    — on a time-keyed stream-maintained table (session windows keyed
    by session_start), candidates are the recent files, so the merge
    sink stays flat while the table grows: Delta's write-time stats +
    MERGE file-pruning shape. The column must be one of `keys`
    (pruning reasons about key equality); an all-NULL-key source
    skips the scan outright (NULL never equals). Telemetry lands in
    the commit meta (`merge.files_pruned` / `merge.files_scanned`)."""
    _occ_check(path, expected_current)
    m = _manifest(path)
    _refuse_external(m, "merge_into_mor")
    if m["version"] == 0:
        raise ValueError("cannot merge into an empty table")
    if "partitions" in m or "partition_col" in m:
        raise ValueError(
            "merge_into_mor supports unpartitioned snapshots; use "
            "upsert_version_cow for partition-granular upserts"
        )
    target_schema = _manifest_read_schema(m)
    data_cols, col_type = _validate_merge_spec(
        target_schema, when_matched, insert_not_matched
    )
    abs_root = os.path.abspath(path)
    v = m["version"] + 1

    prior_dead = set(m.get("dv", {}).get("dead_files", []))
    live_files = [f for f in m["files"] if f not in prior_dead]
    n_live_before_prune = len(live_files)
    if prune_on is not None and live_files:
        if prune_on not in keys:
            raise ValueError(
                f"prune_on={prune_on!r} must be one of the merge keys "
                f"{keys}: pruning is sound only for columns the match "
                "join equates"
            )
        # refresh is incremental: O(files added since the index's base
        # version) footer reads, surviving rows carried by reference
        build_column_stats(spark, path, prune_on)
        bounds = source.agg(
            F.min(prune_on).alias("lo"), F.max(prune_on).alias("hi")
        ).collect()[0]
        if bounds["lo"] is None:
            # every source key is NULL: NULL never equals, so no
            # target row can match — skip the scan outright
            live_files = []
        else:
            cand = set(
                stats_candidate_files(
                    spark, path, prune_on, bounds["lo"], bounds["hi"],
                    manifest=m,
                )
            )
            live_files = [f for f in live_files if f in cand]
    n_files_scanned = len(live_files)
    prior_dv = (
        spark.read.schema("file string, pos bigint").parquet(
            os.path.join(path, m["dv"]["sidecar"])
        )
        if m.get("dv")
        else None
    )
    tagged = (
        _tagged_scan(spark, path, {**m, "files": live_files})
        if live_files
        else None
    )
    if tagged is not None and prior_dv is not None:
        tagged = tagged.join(
            prior_dv.select(
                F.col("file").alias("__dv_file"),
                F.col("pos").alias("__dv_pos"),
            ),
            ["__dv_file", "__dv_pos"],
            "left_anti",
        )

    def _ins_expr(c: str) -> F.Column:
        e = (
            F.expr(insert_not_matched[c])
            if isinstance(insert_not_matched, dict)
            else F.col(f"s.{c}")
        )
        return e.cast(col_type[c]).alias(f"__i_{c}")

    if tagged is None:
        # every prior file is DV-dead: no row can match — the merge
        # degenerates to the insert clause over the whole source
        if not insert_not_matched:
            # nothing to update, delete, or insert: publishing would
            # be a pure no-op version bump churning history/retention
            # for zero effect (ADVICE r13 low) — return the current
            # version unchanged, matching zorder_cluster_incremental's
            # nothing-to-do behavior
            return m["version"]
        ins_src = source.alias("s")
        if insert_not_matched_cond:
            ins_src = ins_src.filter(F.expr(insert_not_matched_cond))
        images = (
            ins_src
            .select(*[_ins_expr(c) for c in data_cols])
            .select(*[F.col(f"__i_{c}").alias(c) for c in data_cols])
            .localCheckpoint(eager=True)
        )
        flat = None
        counts: dict = {}
        n_ins = images.count()  # over checkpointed blocks: metadata-cheap
    else:
        t = tagged.alias("t")
        s = source.alias("s")
        cond = None
        for k in keys:
            eq = F.col(f"t.{k}") == F.col(f"s.{k}")
            cond = eq if cond is None else (cond & eq)
        # INNER join only — the matched set. An earlier revision used
        # one right_outer join to also carry unmatched-source rows,
        # but right-outer can only broadcast its LEFT side, i.e. the
        # 100 TB target: a small CDC source was forced through a full
        # target shuffle. Inner keeps the broadcast-the-source plan;
        # the unmatched-source set is recovered below with a
        # broadcast anti-join against the (source-bounded) matched
        # key set — zero extra target scans.
        joined = t.join(s, cond, "inner")
        action = _merge_action_col(when_matched, F.lit(True))

        proj = [F.col(f"t.{c}").alias(c) for c in data_cols]
        proj += [
            F.col("t.__dv_file").alias("__dv_file"),
            F.col("t.__dv_pos").alias("__dv_pos"),
            F.lit(True).alias("__matched"),
            action.alias("__action"),
        ]
        for i, (op, assigns, _c) in enumerate(when_matched):
            if op == "update":
                for c, e in assigns.items():
                    proj.append(F.expr(e).cast(col_type[c]).alias(f"__u{i}_{c}"))
        # one target scan + one source pass pinned under EVERY
        # downstream write (images, DV, counts) — same barrier
        # rationale as update_rows_mor
        flat = joined.select(*proj).localCheckpoint(eager=True)

        # ONE global aggregation replaces the former two jobs (the
        # per-action counts collect and a separate per-position
        # cardinality shuffle): conditional sums give every clause
        # count, and modifying-row vs distinct-(file,pos) counts
        # detect source-cardinality violations in the same pass.
        modp = F.col("__action").isNotNull()
        st = flat.agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("__action") == i, 1)), F.lit(0)
                ).alias(f"__n_a{i}")
                for i in range(len(when_matched))
            ],
            F.coalesce(F.sum(F.when(modp, 1)), F.lit(0)).alias(
                "__n_mod_rows"
            ),
            F.count_distinct(
                F.when(modp, F.struct("__dv_file", "__dv_pos"))
            ).alias("__n_mod_rids"),
        ).collect()[0]
        counts = {
            (True, i): st[f"__n_a{i}"]
            for i in range(len(when_matched))
            if st[f"__n_a{i}"]
        }
        if st["__n_mod_rows"] > st["__n_mod_rids"]:
            raise MergeCardinalityError(
                "multiple source rows matched and attempted to modify "
                "the same target row; deduplicate the source on the "
                "merge keys first"
            )
        image_parts = []
        for i, (op, assigns, _c) in enumerate(when_matched):
            if op != "update" or not counts.get((True, i)):
                continue
            image_parts.append(
                flat.filter(F.col("__action") == i).select(
                    *[
                        (
                            F.col(f"__u{i}_{c}")
                            if c in assigns
                            else F.col(c)
                        ).alias(c)
                        for c in data_cols
                    ]
                )
            )
        n_ins = 0
        if insert_not_matched:
            # NOT MATCHED = source minus the matched KEY set (bounded
            # by the source, checkpointed → broadcast anti-join; no
            # second target scan). A null-keyed source row never
            # equals anything, so it stays unmatched and INSERTS —
            # Delta's NOT MATCHED semantics for null merge keys.
            matched_keys = flat.select(
                *[F.col(k) for k in keys]
            ).distinct()
            unmatched = source.join(
                F.broadcast(matched_keys), on=keys, how="left_anti"
            ).alias("s")
            if insert_not_matched_cond:
                unmatched = unmatched.filter(F.expr(insert_not_matched_cond))
            ins_df = (
                unmatched.select(*[_ins_expr(c) for c in data_cols])
                .select(*[F.col(f"__i_{c}").alias(c) for c in data_cols])
                .localCheckpoint(eager=True)
            )
            n_ins = ins_df.count()
            if n_ins:
                image_parts.append(ins_df)
        images = image_parts[0] if image_parts else None
        for p in image_parts[1:]:
            images = images.unionByName(p)

    new_files: list[str] = []
    if images is not None:
        data_dir = _attempt_data_dir(path, v)
        _guarded_write(
            images,
            path,
            lambda g: g.write.mode("overwrite").parquet(data_dir),
        )
        rel_dir = os.path.relpath(data_dir, path)
        new_files = sorted(
            os.path.join(rel_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )

    delete_idx = [
        i for i, (op, _a, _c) in enumerate(when_matched) if op == "delete"
    ]
    update_idx = [
        i for i, (op, _a, _c) in enumerate(when_matched) if op == "update"
    ]
    n_upd = sum(counts.get((True, i), 0) for i in update_idx)
    n_del = sum(counts.get((True, i), 0) for i in delete_idx)
    files = sorted(list(m["files"]) + new_files)

    dv_pointer = m.get("dv")
    if flat is not None and (n_upd or n_del):
        sidecar_rel = os.path.join(DV_DIR, f"v{v}-{uuid.uuid4().hex[:8]}")
        sidecar_dir = os.path.join(abs_root, sidecar_rel)
        masked = flat.filter(
            F.col("__matched") & F.col("__action").isNotNull()
        ).select(
            F.col("__dv_file").alias("file"),
            F.col("__dv_pos").cast("bigint").alias("pos"),
        )
        out = masked if prior_dv is None else prior_dv.unionByName(masked)
        out.repartition(_index_shards(max(1, len(m["files"])))).write.mode(
            "overwrite"
        ).parquet(sidecar_dir)
        n_dv, dead_files = _dv_sidecar_stats(
            spark, path, sidecar_dir, {**m, "files": files}
        )
        dv_pointer = {
            "sidecar": sidecar_rel,
            "rows": n_dv,
            **({"dead_files": dead_files} if dead_files else {}),
        }

    manifest = {
        "version": v,
        "files": files,
        "schema": m["schema"],
        **({"project_schema": True} if m.get("project_schema") else {}),
        "committed_at": time.time(),
        "meta": {
            **(meta or {}),
            "merge": {
                "updated": n_upd,
                "deleted": n_del,
                "inserted": n_ins,
                **(
                    {
                        "files_scanned": n_files_scanned,
                        "files_pruned": n_live_before_prune
                        - n_files_scanned,
                    }
                    if prune_on is not None
                    else {}
                ),
            },
        },
        **({"dv": dv_pointer} if dv_pointer else {}),
    }
    _publish_manifest(path, v, manifest, expected_current, prev=m)
    return v


def merge_mor_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: commit events, then ONE three-clause MERGE —
    source rows derived from the table itself: event_id % 10 == 0 →
    conditional UPDATE (value doubled, event_type 'merged'),
    % 10 == 1 → conditional DELETE, % 10 == 2 shifted by +10⁷ →
    NOT-MATCHED INSERT. The final snapshot must equal the oracle's
    LEFT-JOIN/CASE reconstruction; clause ordering, cardinality
    enforcement, file reuse and time travel are pinned in
    tests/test_versioned.py."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("merge_mor", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev.repartition(8))
    bucket = F.col("event_id") % 10
    source = (
        ev.filter(bucket == 0)
        .select(
            "event_id", "ts", "user_id", "event_type",
            (F.col("value") * 2).alias("value"),
            F.lit("update").alias("op"),
        )
        .unionByName(
            ev.filter(bucket == 1).select(
                "event_id", "ts", "user_id", "event_type", "value",
                F.lit("delete").alias("op"),
            )
        )
        .unionByName(
            ev.filter(bucket == 2).select(
                (F.col("event_id") + 10000000).alias("event_id"),
                "ts", "user_id",
                F.lit("inserted").alias("event_type"),
                F.lit(-1.0).alias("value"),
                F.lit("insert").alias("op"),
            )
        )
    )
    merge_into_mor(
        spark,
        path,
        source,
        ["event_id"],
        when_matched=[
            ("update", {"value": "s.value", "event_type": "'merged'"}, "s.op = 'update'"),
            ("delete", None, "s.op = 'delete'"),
        ],
        insert_not_matched=True,
    )
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def merge_mor_oracle_sql() -> str:
    return """
        WITH src AS (
            SELECT event_id, ts, user_id, event_type,
                   value * 2 AS value, 'update' AS op
            FROM events WHERE event_id % 10 = 0
            UNION ALL
            SELECT event_id, ts, user_id, event_type, value, 'delete'
            FROM events WHERE event_id % 10 = 1
            UNION ALL
            SELECT event_id + 10000000, ts, user_id, 'inserted',
                   CAST(-1.0 AS DOUBLE), 'insert'
            FROM events WHERE event_id % 10 = 2
        )
        SELECT t.event_id, t.ts, t.user_id,
               CASE WHEN s.op = 'update' THEN 'merged'
                    ELSE t.event_type END AS event_type,
               CASE WHEN s.op = 'update' THEN s.value
                    ELSE t.value END AS value
        FROM events t LEFT JOIN src s ON t.event_id = s.event_id
        WHERE s.op IS NULL OR s.op = 'update'
        UNION ALL
        SELECT event_id, ts, user_id, event_type, value
        FROM src WHERE op = 'insert'
    """


def merge_pruned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (r16): the stats-pruned three-clause MERGE on a
    range-clustered table whose source touches only the TOP QUARTILE
    of the key range — the continuous-ingest shape (recent keys hot,
    old files cold). commit events range-clustered by event_id, then
    ONE merge with prune_on='event_id': updates (top-quartile even
    ids, value+100 → 'merged'), deletes (odd ids divisible by 7),
    inserts (ids ≡ 2 mod 5 shifted +5·10⁷). The stats probe must
    actually prune (a zero-prune run means the clustering or the
    footer stats broke — guarded here, not just in pytest); the final
    snapshot equals the oracle's LEFT-JOIN/CASE reconstruction, which
    is pruning-blind — so a hash match IS the proof that pruning
    never changed the answer."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("merge_pruned", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev.repartitionByRange(8, "event_id"))
    mx = ev.agg(F.max("event_id")).collect()[0][0]
    if mx is None:
        # empty events table: nothing to merge, nothing to prune
        return read_version(spark, path)
    thr = (3 * int(mx)) // 4
    top = ev.filter(F.col("event_id") >= F.lit(thr))
    source = (
        top.filter(F.col("event_id") % 2 == 0)
        .select(
            "event_id", "ts", "user_id", "event_type",
            (F.col("value") + 100.0).alias("value"),
            F.lit("update").alias("op"),
        )
        .unionByName(
            top.filter(
                (F.col("event_id") % 2 == 1) & (F.col("event_id") % 7 == 0)
            ).select(
                "event_id", "ts", "user_id", "event_type", "value",
                F.lit("delete").alias("op"),
            )
        )
        .unionByName(
            top.filter(F.col("event_id") % 5 == 2).select(
                (F.col("event_id") + 50_000_000).alias("event_id"),
                "ts", "user_id",
                F.lit("ins").alias("event_type"),
                F.lit(-1.0).alias("value"),
                F.lit("insert").alias("op"),
            )
        )
    )
    merge_into_mor(
        spark,
        path,
        source,
        ["event_id"],
        when_matched=[
            ("update", {"value": "s.value", "event_type": "'merged'"},
             "s.op = 'update'"),
            ("delete", None, "s.op = 'delete'"),
        ],
        insert_not_matched=True,
        prune_on="event_id",
    )
    mm = _manifest(path)["meta"]["merge"]
    if not mm.get("files_pruned"):
        raise RuntimeError(
            f"stats pruning did not engage on the range-clustered "
            f"table: {mm} — footer stats or clustering regressed"
        )
    return read_version(spark, path)


def merge_pruned_oracle_sql() -> str:
    return """
        WITH thr AS (
            SELECT (3 * MAX(event_id)) // 4 AS t FROM events
        ),
        src AS (
            SELECT event_id, ts, user_id, event_type,
                   value + 100.0 AS value, 'update' AS op
            FROM events, thr WHERE event_id >= t AND event_id % 2 = 0
            UNION ALL
            SELECT event_id, ts, user_id, event_type, value, 'delete'
            FROM events, thr
            WHERE event_id >= t AND event_id % 2 = 1 AND event_id % 7 = 0
            UNION ALL
            SELECT event_id + 50000000, ts, user_id, 'ins',
                   CAST(-1.0 AS DOUBLE), 'insert'
            FROM events, thr WHERE event_id >= t AND event_id % 5 = 2
        )
        SELECT t.event_id, t.ts, t.user_id,
               CASE WHEN s.op = 'update' THEN 'merged'
                    ELSE t.event_type END AS event_type,
               CASE WHEN s.op = 'update' THEN s.value
                    ELSE t.value END AS value
        FROM events t LEFT JOIN src s ON t.event_id = s.event_id
        WHERE s.op IS NULL OR s.op = 'update'
        UNION ALL
        SELECT event_id, ts, user_id, event_type, value
        FROM src WHERE op = 'insert'
    """


# --- per-file bloom index: point-lookup pruning on a NON-partition,
# NON-clustered key. Partition pruning needs the partition key and
# min/max stats need clustering (Z-order); a bloom filter per data
# file prunes point lookups on any key with NO data reorganization —
# Iceberg/Parquet expose the same structure as column bloom filters.
BLOOM_BITS = 1 << 16  # 8 KiB bitmap per file
BLOOM_HASHES = 2


def _bloom_positions(value) -> list[int]:
    """Driver-side twin of the Spark bit expression — identical md5
    arithmetic, so index build (cluster) and probe (driver) agree."""
    import hashlib

    return [
        int(
            hashlib.md5(f"bloom{s}:{value}".encode()).hexdigest()[:8], 16
        )
        % BLOOM_BITS
        for s in range(BLOOM_HASHES)
    ]


def _atomic_json(file_path: str, obj: dict) -> None:
    """Write-then-rename so a concurrent reader never sees a torn
    pointer file — the same primitive as the _CURRENT swap."""
    tmp = file_path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, file_path)


def _index_shards(n_files: int) -> int:
    """Sidecar write parallelism: one shard per ~64 Ki indexed files
    (a shard row is ≤ ~8 KiB, so shards stay well under task-output
    limits at any table size). Applied with repartition, NOT coalesce:
    coalesce would merge the upstream harvest/reduce stage down to
    shard-many tasks (one task reading every footer at <64 Ki files —
    the serial bottleneck this build exists to avoid); the shuffle it
    costs moves only the tiny index rows."""
    import math as _math

    return max(1, _math.ceil(n_files / 65536))


def _harvest_tasks(n_files: int) -> int:
    """Footer-harvest fan-out: ~256 footer reads per task, floored at
    32 (local-mode width) and capped only far above any real cluster.
    A constant 32 here (the r11 shape) recreates a serial bottleneck
    on a wide cluster — 10⁶ files would put 31 K footer reads in each
    of 32 tasks while 968 executors idle; n/256 gives ~4 K tasks at
    that size, each a sub-second metadata read."""
    import math as _math

    return min(n_files, max(32, _math.ceil(n_files / 256)), 1 << 16)


def _incremental_prior(
    path: str, pointer_name: str, current: dict, require: dict
) -> tuple[dict, dict] | None:
    """Resolve the state an INCREMENTAL index build can extend:
    (prior pointer dict, prior manifest) when the existing pointer is
    layout-compatible (`require` pairs all match), its sidecar still
    exists, and the manifest it was built against is still resolvable
    (not vacuumed past the horizon) — else None, meaning full rebuild.
    The prior manifest is what makes incrementality SOUND: added and
    removed files are computed as exact set differences between the
    two snapshots' file lists, and every carried sidecar row describes
    an immutable data file (the format is copy-on-write — no file is
    ever modified in place), so carried rows can never go stale."""
    try:
        with open(os.path.join(path, pointer_name)) as fh:
            prior = json.load(fh)
    except FileNotFoundError:
        return None
    if any(prior.get(k) != v for k, v in require.items()):
        return None
    if "sidecar" not in prior or not os.path.isdir(
        os.path.join(path, prior["sidecar"])
    ):
        return None
    pv = prior.get("version")
    if not isinstance(pv, int) or pv < 1 or pv > current["version"]:
        return None
    try:
        prior_m, _ = _resolve_chain(path, pv)
    except (FileNotFoundError, KeyError):
        return None  # vacuumed past the horizon — rebuild from scratch
    return prior, prior_m


def _carry_rows(
    spark: SparkSession,
    sidecar_df: DataFrame,
    removed: set,
    cur_files: list[str],
) -> DataFrame:
    """Prior-sidecar rows still describing current files. Nothing
    removed → the whole sidecar carries by reference (map-only read);
    a small removal set (the common append/upsert delta) is a map-only
    NOT-IN filter; a large one (compaction rewrote most of the table)
    flips to a semi-join against the current file list so the plan
    never builds a million-literal IN expression."""
    if not removed:
        return sidecar_df
    if len(removed) <= 4096:
        return sidecar_df.filter(~F.col("file").isin(sorted(removed)))
    keep = spark.createDataFrame([(f,) for f in cur_files], "file string")
    return sidecar_df.join(keep, "file", "left_semi")


def build_bloom_index(spark: SparkSession, path: str, key_col: str) -> dict:
    """ONE Spark job over the snapshot DELTA: every file's distinct
    bloom bit positions (k salted md5 hashes per key), aggregated and
    PACKED INTO AN 8 KiB BITMAP IN THE EXECUTORS (Arrow-batched pandas
    UDF), then written as a parquet SIDECAR TABLE
    (`_index/bloom_{key}/v{N}-…`, one row per data file: file relpath
    + binary bitmap). The pointer file `_BLOOM_{key}.json` beside the
    manifests records only {version, params, sidecar relpath} — a
    POINTER, never a payload: nothing data-proportional touches the
    driver or the JSON metadata, so the build holds at 10⁵-10⁶ files
    where the previous driver-collected-bitmap design (r10 VERDICT
    finding a) was O(files) driver memory.

    INCREMENTAL MAINTENANCE (the Delta/Iceberg write-time contract):
    when a layout-compatible prior index exists and its base manifest
    is still resolvable, only files ADDED since that version are
    scanned — prior bitmap rows for surviving files carry over via a
    metadata-only filter/semi-join, removed files' rows are dropped,
    and the union lands in a fresh immutable sidecar dir. An append of
    k files to a 10⁶-file table costs O(k) data scan + O(index rows)
    shuffle, not a full-table rescan (the r11 shape — VERDICT r11
    finding a). Data files are immutable (copy-on-write format), so a
    carried row can never be stale. A fresh same-version compatible
    index is returned as-is (sidecars are immutable). The pointer
    records {harvested_files, carried_files} telemetry. The scan is
    column-pruned to the key; index size is files × 8 KiB regardless
    of row count. A file with zero rows (or an all-NULL key) gets no
    row and is correctly never a candidate."""
    from pyspark.sql import types as T

    m = _manifest(path)
    _refuse_external(m, "build_bloom_index")
    abs_root = os.path.abspath(path)
    # The bitmap hashes the key's STRING RENDER (cast to string), so
    # the index is only valid for the data type it was built under: a
    # float→double widening changes the render ('0.1' vs
    # '0.10000000149011612'), and carrying float-rendered bitmaps
    # across the widen would make carried files test FALSE-NEGATIVE
    # for values they contain (ADVICE r14 — violates the no-false-
    # negative guarantee). Recording the type in the pointer and
    # requiring it for incrementality forces ONE full rebuild after
    # any type-changing DDL; pre-fix pointers lack the key and rebuild
    # once too (self-healing).
    try:
        key_type = next(
            f.dataType.simpleString()
            for f in T.StructType.fromJson(json.loads(m["schema"])).fields
            if f.name == key_col
        )
    except StopIteration:
        raise ValueError(
            f"no such column {key_col!r} in the current snapshot schema"
        ) from None
    prior = _incremental_prior(
        path,
        f"_BLOOM_{key_col}.json",
        m,
        {
            "key_col": key_col,
            "key_type": key_type,
            "format": BLOOM_FORMAT,
            "bits": BLOOM_BITS,
            "hashes": BLOOM_HASHES,
        },
    )
    if prior is not None and prior[0]["version"] == m["version"]:
        return prior[0]
    sidecar_rel = os.path.join(
        "_index", f"bloom_{key_col}", f"v{m['version']}-{uuid.uuid4().hex[:8]}"
    )
    sidecar_dir = os.path.join(abs_root, sidecar_rel)

    def pack(batches):
        def one(bs) -> bytes:
            buf = bytearray(BLOOM_BITS // 8)
            for b in bs:
                buf[b >> 3] |= 1 << (b & 7)
            return bytes(buf)

        for pdf in batches:
            # drift sentinel (purge_rows' __HIVE_DEFAULT_PARTITION__
            # discipline): if the prefix strip missed — input path
            # normalization diverged from the driver's abs root — the
            # derived name is still absolute/URI-shaped, and a silent
            # no-op here would store non-manifest names the probes
            # would then serve as garbage candidates. Fail the build
            # loudly instead.
            bad = [
                f for f in pdf["file"]
                if f.startswith(("/", "file:")) or "://" in f
            ]
            if bad:
                raise RuntimeError(
                    "bloom index file-name derivation missed the table "
                    f"root (path normalization drift): {bad[:3]}"
                )
            pdf = pdf.assign(bitmap=pdf["bits"].map(one))
            yield pdf[["file", "bitmap"]]

    def bloom_rows(scan_rel: list[str]) -> DataFrame:
        salts = F.explode(
            F.array([F.lit(s) for s in range(BLOOM_HASHES)])
        ).alias("salt")
        digest = F.md5(
            F.concat(
                F.lit("bloom"),
                F.col("salt").cast("string"),
                F.lit(":"),
                F.col(key_col).cast("string"),
            )
        )
        bit = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % BLOOM_BITS
        # file identity stays the manifest RELPATH end to end: derived
        # per row from the decoded input path (no driver-side map).
        # The strip is ANCHORED at the start of the string — an
        # unanchored replace would also rewrite a later occurrence of
        # the root string inside the relative remainder, mis-keying
        # the row into a name the probes would prune as a false
        # negative.
        import re as _re

        rel = F.regexp_replace(
            _norm_input_path(), "^" + _re.escape(abs_root + os.sep), ""
        ).alias("file")
        return (
            _read_files_raw(
                spark, m, [os.path.join(abs_root, r) for r in scan_rel],
                path=path,
            )
            .select(rel, F.col(key_col))
            .select("file", key_col, salts)
            .select("file", bit.alias("bit"))
            .groupBy("file")
            .agg(F.collect_set("bit").alias("bits"))
            .mapInPandas(pack, "file string, bitmap binary")
        )

    if prior is None:
        scan = list(m["files"])
        out = bloom_rows(scan) if scan else None
    else:
        prior_files = set(prior[1]["files"])
        cur_set = set(m["files"])
        scan = sorted(cur_set - prior_files)
        carry = _carry_rows(
            spark,
            spark.read.schema("file string, bitmap binary").parquet(
                os.path.join(path, prior[0]["sidecar"])
            ),
            prior_files - cur_set,
            m["files"],
        )
        out = carry.unionByName(bloom_rows(scan)) if scan else carry
    if out is None:
        spark.createDataFrame([], "file string, bitmap binary").write.mode(
            "overwrite"
        ).parquet(sidecar_dir)
    else:
        out.repartition(_index_shards(max(1, len(m["files"])))).write.mode(
            "overwrite"
        ).parquet(sidecar_dir)
    index = {
        "key_col": key_col,
        "key_type": key_type,
        "version": m["version"],
        "format": BLOOM_FORMAT,
        "bits": BLOOM_BITS,
        "hashes": BLOOM_HASHES,
        "sidecar": sidecar_rel,
        "harvested_files": len(scan),
        "carried_files": len(m["files"]) - len(scan),
    }
    _atomic_json(os.path.join(path, f"_BLOOM_{key_col}.json"), index)
    return index


class StaleBloomIndexError(RuntimeError):
    """The bloom index was built against a superseded snapshot."""


def bloom_candidate_files(
    spark: SparkSession,
    path: str,
    key_col: str,
    values: list,
    manifest: dict | None = None,
) -> list[str]:
    """Metadata-only probe: relpaths whose bitmap has every bit set
    for AT LEAST ONE probed value (bloom guarantees no false
    negatives, so the pruned files provably contain no match). The
    bit tests run DISTRIBUTED over the parquet sidecar (one Spark job;
    vectorized over Arrow batches) and only the candidate NAMES come
    back to the driver — the driver holds O(candidates) strings, never
    O(files) bitmaps, which is the bound a planner needs anyway to
    enumerate the scan.

    Validates the index against `manifest` when the caller passes the
    snapshot it already resolved (lookups MUST, or a commit landing
    between validation and the file read pairs an old candidate list
    with a new snapshot — the TOCTOU `_read_files_as_snapshot`'s
    docstring warns about); standalone metadata callers omit it and
    the current pointer is resolved here. Raises StaleBloomIndexError
    when the index predates that version: serving it would miss rows
    committed since the build and may reference files purge/vacuum
    already removed. bloom_lookup rebuilds transparently;
    metadata-only callers must rebuild."""
    index = _load_bloom_index(path, key_col, manifest)
    pos = [_bloom_positions(v) for v in values]
    return _probe_bloom_sidecar(spark, path, index, pos, manifest)


def _load_bloom_index(
    path: str, key_col: str, manifest: dict | None
) -> dict:
    """Read + validate the bloom pointer JSON (shared by the value-
    list and DataFrame probes)."""
    with open(os.path.join(path, f"_BLOOM_{key_col}.json")) as fh:
        index = json.load(fh)
    # version only — never resolve the chain (current_version is the
    # O(1) pointer read; a passed manifest is already resolved)
    cur = manifest["version"] if manifest else current_version(path)
    if index["version"] != cur:
        raise StaleBloomIndexError(
            f"bloom index on {key_col!r} built at v{index['version']}, "
            f"table is at v{cur}; rebuild with build_bloom_index"
        )
    if index.get("format") != BLOOM_FORMAT or "sidecar" not in index:
        # e.g. a pre-sidecar pointer carrying inline payloads: treat a
        # layout mismatch as stale, never KeyError past the rebuild
        raise StaleBloomIndexError(
            f"bloom index on {key_col!r} uses layout format "
            f"{index.get('format')}, engine is at {BLOOM_FORMAT}; "
            "rebuild with build_bloom_index"
        )
    return index


def _probe_bloom_sidecar(
    spark: SparkSession,
    path: str,
    index: dict,
    pos: list[list[int]],
    manifest: dict | None,
) -> list[str]:
    """The distributed bit-test core: files whose bitmap has every
    bit of AT LEAST ONE probed position-tuple set. Runs over the
    parquet sidecar in Arrow batches; only candidate NAMES return."""
    if not pos:
        return []

    def probe(batches):
        def one(buf: bytes) -> bool:
            return any(
                all(buf[p >> 3] & (1 << (p & 7)) for p in ps) for ps in pos
            )

        for pdf in batches:
            out = pdf.loc[pdf["bitmap"].map(one), ["file"]]
            if len(out):
                yield out

    sidecar = spark.read.schema("file string, bitmap binary").parquet(
        os.path.join(path, index["sidecar"])
    )
    cand = sorted(
        r.file for r in sidecar.mapInPandas(probe, "file string").collect()
    )
    return _drop_dead_candidates(cand, manifest)


def _bloom_bit_col(col: F.Column, salt: int) -> F.Column:
    """JVM twin of one _bloom_positions hash — identical md5
    arithmetic to the index build's bloom_rows expression, so
    DataFrame-computed probe bits agree bit-for-bit with driver-
    computed ones (property: _bloom_positions is the shared spec)."""
    digest = F.md5(
        F.concat(F.lit(f"bloom{salt}:"), col.cast("string"))
    )
    return (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % BLOOM_BITS
    )


# A probe set near the bitmap's bit count saturates it — with ~2^16
# distinct probed positions per salt essentially every bitmap tests
# positive and pruning has no power, so collecting MORE than this many
# distinct bit-pairs buys nothing. The cap is what makes the driver
# transfer O(1): ≤ 65 536 int pairs (~1 MB) regardless of batch size.
BLOOM_PROBE_PAIRS_MAX = 1 << 16


def bloom_candidate_files_df(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys_df: DataFrame,
    manifest: dict | None = None,
    max_pairs: int = BLOOM_PROBE_PAIRS_MAX,
) -> list[str] | None:
    """bloom_candidate_files for a DISTRIBUTED key set: the probe
    bits are computed DataFrame-side (same salted-md5 expression as
    the index build) and only their DISTINCT bit-tuples come to the
    driver — bounded by `max_pairs` (~1 MB), never O(batch keys). The
    r12 streaming sink collected every micro-batch's raw keys to feed
    the value-list probe, an O(batch) driver list that stalls at 10⁷
    rows per batch (VERDICT r12 finding c); this keeps key VALUES
    executor-side end to end.

    Returns None when the distinct tuple count exceeds `max_pairs`:
    at that point the probe set saturates the 2^16-bit bitmaps and
    bloom pruning has no power — the caller should scan the full file
    list (which is what the probe would have returned anyway, minus
    the wasted metadata pass). Exactness is preserved: per-key bit
    TUPLES are probed (conjunction per key, union over keys),
    identical to the value-list probe, so no false negatives; callers
    keep their exact post-join."""
    index = _load_bloom_index(path, key_col, manifest)
    col = F.col(key_col) if key_col in keys_df.columns else F.col(
        keys_df.columns[0]
    )
    pairs = (
        keys_df.select(
            *[
                _bloom_bit_col(col, s).alias(f"b{s}")
                for s in range(BLOOM_HASHES)
            ]
        )
        .distinct()
        .limit(max_pairs + 1)
        .collect()
    )
    if len(pairs) > max_pairs:
        return None
    pos = [[r[f"b{s}"] for s in range(BLOOM_HASHES)] for r in pairs]
    return _probe_bloom_sidecar(spark, path, index, pos, manifest)


def _drop_dead_candidates(cand: list[str], manifest: dict | None) -> list[str]:
    """Filter fully-dead files (see delete_rows_dv) out of a
    candidate list: their index rows describe only DV-masked rows, so
    serving them wastes a scan per probe forever on delete-heavy
    tables (VERDICT r12 task 7). Only possible when the caller passed
    its resolved manifest; standalone metadata callers get the
    over-approximate list, which is always correct."""
    if manifest is None:
        return cand
    dead = set(manifest.get("dv", {}).get("dead_files", []))
    return [f for f in cand if f not in dead] if dead else cand


def bloom_lookup(
    spark: SparkSession,
    path: str,
    key_col: str,
    values: list,
    max_rebuilds: int = 3,
) -> DataFrame:
    """Point lookup through the bloom index: read ONLY candidate
    files, then the exact filter (bloom false positives are removed
    here; false negatives cannot exist). Lookup I/O ∝ matching files
    + fp rate, not table size. A stale or absent index is rebuilt
    transparently before probing — serving it would miss newly
    committed rows or read purged files. The manifest is resolved ONCE
    per attempt and the SAME snapshot both validates the index and
    serves the read (no validate/read TOCTOU); rebuild-and-retry loops
    a bounded number of times so a hot writer can't wedge the lookup
    on its first conflict."""
    last: Exception | None = None
    for _ in range(max_rebuilds + 1):
        m = _manifest(path)
        try:
            cand = bloom_candidate_files(
                spark, path, key_col, values, manifest=m
            )
        except (StaleBloomIndexError, FileNotFoundError) as e:
            last = e
            build_bloom_index(spark, path, key_col)
            continue
        if not cand:
            return _empty_snapshot(spark, m)
        vals = [str(v) for v in values]
        return _read_files_as_snapshot(
            spark, m, [os.path.join(path, rel) for rel in cand], path=path
        ).filter(F.col(key_col).cast("string").isin(vals))
    raise last  # commits outran every rebuild attempt


class StaleStatsIndexError(RuntimeError):
    """The column-stats index was built against a superseded snapshot
    or under a superseded encoding format."""


# Bump with _stats_encode's canonical forms OR the sidecar layout
# (v2 = dates as midnight ISO datetimes; v3 = parquet sidecar with
# exact-string values replacing the inline-JSON payload).
STATS_FORMAT = 3
# The bloom pointer's layout stamp (v2 = parquet bitmap sidecar
# replacing inline base64 payloads). A pre-sidecar pointer (no stamp,
# no "sidecar" key) must read as STALE — the probe rebuilds instead of
# crashing on the missing key.
BLOOM_FORMAT = 2


def _stats_encode(v):
    """JSON-portable (kind, value) encoding of a footer statistic.
    Numerics stay native; timestamps AND dates canonicalize to the one
    fixed-width ISO datetime form (dates as midnight) so a date-typed
    file compared against a datetime probe bound can never produce a
    false negative — lexicographic order on the canonical form ==
    chronological order. Naive everywhere: footer timestamp stats are
    UTC instants and this engine pins the session to UTC
    (apply_session_conf), so probe datetimes are the same clock; a
    non-UTC caller must convert bounds to UTC first. Bytes decode as
    UTF-8 strings (parquet string stats)."""
    import datetime as _dt

    if isinstance(v, bool):
        return ["num", int(v)]
    if isinstance(v, (int, float)):
        return ["num", v]
    if isinstance(v, _dt.datetime):
        return ["ts", v.replace(tzinfo=None).isoformat(timespec="microseconds")]
    if isinstance(v, _dt.date):
        return [
            "ts",
            _dt.datetime(v.year, v.month, v.day).isoformat(
                timespec="microseconds"
            ),
        ]
    if isinstance(v, bytes):
        return ["str", v.decode("utf-8", "replace")]
    return ["str", str(v)]


def _footer_minmax(abs_file: str, col: str):
    """(lo, hi, ok) for one parquet footer — pure metadata, no data
    pages. ok=False (file lacks the column, has no row groups, or any
    row group lacks min/max) means 'no usable stats': the file must
    always be a candidate."""
    import pyarrow.parquet as _pq

    md = _pq.ParquetFile(abs_file).metadata
    idx = next(
        (i for i in range(len(md.schema)) if md.schema.column(i).path == col),
        None,
    )
    lo = hi = None
    ok = idx is not None and md.num_row_groups > 0
    if ok:
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return lo, hi, ok


# Values ride as EXACT strings: "num" kinds as repr(int)/repr(float)
# (parsed back by _stats_decode_num — a double column would round
# bigints above 2^53 and could prune a file that contains the probed
# value, the false negative the contract forbids), "ts"/"str" kinds as
# the canonical _stats_encode strings compared lexicographically.
_STATS_SIDECAR_SCHEMA = (
    "file string, has_stats boolean, kind string, "
    "min_val string, max_val string"
)


def _stats_decode_num(s: str):
    """Exact inverse of repr() for the "num" kind: int when integral
    (arbitrary precision), float otherwise (inf/nan included)."""
    try:
        return int(s)
    except ValueError:
        return float(s)


def build_column_stats(spark: SparkSession, path: str, col: str) -> dict:
    """Per-file [min, max] for `col`, harvested from parquet FOOTERS —
    metadata only, no data pages read — as a DISTRIBUTED job: the
    manifest's file list fans out over executors (mapInPandas), each
    task reads its files' footers and emits one encoded stats row per
    file, written as a parquet SIDECAR TABLE (`_index/stats_{col}/
    v{N}-…`). The pointer file `_STATS_{col}.json` records only
    {version, format, sidecar relpath}: driver cost is O(1), not one
    footer read per file — the previous driver loop (r10 VERDICT
    finding a) stalled at 10⁵-10⁶ files. This is the data-skipping
    index Delta/Iceberg collect at write time: a range predicate then
    reads only files whose [min, max] interval overlaps it, which on
    a column the table is clustered by (repartitionByRange / Z-order)
    turns a full scan into a few-file read. Complements the bloom
    index (equality probes): stats answer RANGE probes bloom cannot.

    A file whose footer lacks min/max for the column (e.g. a file
    predating a schema evolution) records has_stats=false and is
    always a candidate — skipping must never create false negatives.
    Probes against a superseded snapshot raise StaleStatsIndexError
    (stats_lookup rebuilds transparently).

    INCREMENTAL MAINTENANCE: when a layout-compatible prior index
    exists and its base manifest is still resolvable, only footers of
    files ADDED since that version are read — surviving files' rows
    carry over from the prior sidecar (metadata-only filter/semi-join),
    removed files' rows are dropped, and the union lands in a fresh
    immutable sidecar dir. This is what Delta/Iceberg do at write
    time: a `stats_cols=` commit of k files to a 10⁶-file table costs
    O(k) footer reads, not O(table) (VERDICT r11 finding a). Carried
    rows can never be stale — data files are immutable under the
    copy-on-write format. A fresh same-version compatible index is
    returned as-is; the pointer records {harvested_files,
    carried_files} telemetry."""
    import pandas as pd

    m = _manifest(path)
    _refuse_external(m, "build_column_stats")
    abs_root = os.path.abspath(path)
    prior = _incremental_prior(
        path, f"_STATS_{col}.json", m, {"col": col, "format": STATS_FORMAT}
    )
    if prior is not None and prior[0]["version"] == m["version"]:
        return prior[0]
    sidecar_rel = os.path.join(
        "_index", f"stats_{col}", f"v{m['version']}-{uuid.uuid4().hex[:8]}"
    )
    sidecar_dir = os.path.join(abs_root, sidecar_rel)
    cols = ["file", "has_stats", "kind", "min_val", "max_val"]

    def harvest(batches):
        for pdf in batches:
            recs = []
            for rel in pdf["file"]:
                lo, hi, ok = _footer_minmax(os.path.join(abs_root, rel), col)
                if ok:
                    klo, vlo = _stats_encode(lo)
                    _khi, vhi = _stats_encode(hi)
                    num = klo == "num"
                    recs.append((
                        rel, True, klo,
                        repr(vlo) if num else str(vlo),
                        repr(vhi) if num else str(vhi),
                    ))
                else:
                    recs.append((rel, False, None, None, None))
            if recs:
                yield pd.DataFrame(recs, columns=cols)

    def stats_rows(scan_rel: list[str]) -> DataFrame:
        return (
            spark.createDataFrame([(rel,) for rel in scan_rel], "file string")
            .repartition(_harvest_tasks(len(scan_rel)))
            .mapInPandas(harvest, _STATS_SIDECAR_SCHEMA)
        )

    if prior is None:
        scan = list(m["files"])
        out = stats_rows(scan) if scan else None
    else:
        prior_files = set(prior[1]["files"])
        cur_set = set(m["files"])
        scan = sorted(cur_set - prior_files)
        carry = _carry_rows(
            spark,
            spark.read.schema(_STATS_SIDECAR_SCHEMA).parquet(
                os.path.join(path, prior[0]["sidecar"])
            ),
            prior_files - cur_set,
            m["files"],
        )
        out = carry.unionByName(stats_rows(scan)) if scan else carry
    if out is None:
        spark.createDataFrame([], _STATS_SIDECAR_SCHEMA).write.mode(
            "overwrite"
        ).parquet(sidecar_dir)
    else:
        out.repartition(_index_shards(max(1, len(m["files"])))).write.mode(
            "overwrite"
        ).parquet(sidecar_dir)
    index = {
        "col": col,
        "version": m["version"],
        # encoding-format stamp: bumped whenever _stats_encode's
        # canonical forms change (v2 = dates as midnight ISO
        # datetimes). An index written under an older format passes
        # the version check but its stored strings no longer compare
        # against freshly-encoded probe bounds — the probe treats a
        # format mismatch as stale and rebuilds, never serving silent
        # false negatives.
        "format": STATS_FORMAT,
        "sidecar": sidecar_rel,
        "harvested_files": len(scan),
        "carried_files": len(m["files"]) - len(scan),
    }
    _atomic_json(os.path.join(path, f"_STATS_{col}.json"), index)
    return index


def stats_candidate_files(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
    manifest: dict | None = None,
) -> list[str]:
    """Metadata-only range probe: relpaths whose [min, max] interval
    overlaps [lo, hi] (None bound = unbounded), plus every file with
    no usable stats — pruned files provably contain no match. The
    overlap tests run DISTRIBUTED over the parquet sidecar, applying
    the SAME `_stats_overlaps` predicate the property suite pins
    (tests/test_properties.py) to each row; only candidate NAMES
    return to the driver. Validates against the caller's
    already-resolved `manifest` when given (see
    bloom_candidate_files); raises StaleStatsIndexError when the
    index predates that version or uses a superseded encoding."""
    with open(os.path.join(path, f"_STATS_{col}.json")) as fh:
        index = json.load(fh)
    cur = manifest["version"] if manifest else current_version(path)
    if index["version"] != cur:
        raise StaleStatsIndexError(
            f"stats index on {col!r} built at v{index['version']}, "
            f"table is at v{cur}; rebuild with build_column_stats"
        )
    if index.get("format") != STATS_FORMAT or "sidecar" not in index:
        raise StaleStatsIndexError(
            f"stats index on {col!r} uses encoding format "
            f"{index.get('format')}, engine is at {STATS_FORMAT}; "
            "rebuild with build_column_stats"
        )

    def probe(batches):
        for pdf in batches:
            keep = []
            for r in pdf.itertuples(index=False):
                mm = None
                if r.has_stats:
                    if r.kind == "num":
                        vmin = _stats_decode_num(r.min_val)
                        vmax = _stats_decode_num(r.max_val)
                    else:
                        vmin, vmax = r.min_val, r.max_val
                    mm = [[r.kind, vmin], [r.kind, vmax]]
                keep.append(_stats_overlaps(mm, lo, hi))
            out = pdf.loc[keep, ["file"]]
            if len(out):
                yield out

    sidecar = spark.read.schema(_STATS_SIDECAR_SCHEMA).parquet(
        os.path.join(path, index["sidecar"])
    )
    cand = sorted(
        r.file for r in sidecar.mapInPandas(probe, "file string").collect()
    )
    return _drop_dead_candidates(cand, manifest)


def _stats_overlaps(mm, lo, hi) -> bool:
    """Pure candidacy predicate: does a file with encoded stats `mm`
    ([encoded_min, encoded_max], or None for no-usable-stats)
    possibly contain values in [lo, hi] (None bound = unbounded)?
    Statless files are always candidates. The NO-FALSE-NEGATIVE
    contract (a pruned file provably contains no matching value,
    including across date/datetime kind mixing) is property-tested in
    tests/test_properties.py."""
    if mm is None:
        return True
    qlo = _stats_encode(lo)[1] if lo is not None else None
    qhi = _stats_encode(hi)[1] if hi is not None else None
    fmin, fmax = mm[0][1], mm[1][1]
    return (qhi is None or fmin <= qhi) and (qlo is None or fmax >= qlo)


def stats_lookup(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
    max_rebuilds: int = 3,
) -> DataFrame:
    """Range query through the stats index: read ONLY overlapping
    files, then the exact predicate (interval overlap admits false
    positives; false negatives cannot exist). A stale or absent index
    is rebuilt transparently — serving it would miss newly committed
    rows or reference vacuumed files. The manifest is resolved ONCE
    per attempt and that same snapshot validates the index AND serves
    the read (no validate/read TOCTOU); rebuild-and-retry loops a
    bounded number of times so a hot writer can't wedge the lookup on
    its first conflict."""
    last: Exception | None = None
    for _ in range(max_rebuilds + 1):
        m = _manifest(path)
        try:
            cand = stats_candidate_files(spark, path, col, lo, hi, manifest=m)
        except (StaleStatsIndexError, FileNotFoundError) as e:
            last = e
            build_column_stats(spark, path, col)
            continue
        if not cand:
            return _empty_snapshot(spark, m)
        df = _read_files_as_snapshot(
            spark, m, [os.path.join(path, rel) for rel in cand], path=path
        )
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
        return df
    raise last  # commits outran every rebuild attempt


def _manifest_read_schema(m: dict):
    """The explicit schema a leaf-file read of this snapshot must use:
    the manifest's recorded schema, minus the cluster column for
    `partition_col` manifests (partitionBy strips it from the data
    files, and leaf-file reads never re-infer partition columns — the
    recorded commit_version_clustered schema includes it while the
    files do not). Passing this to every spark.read skips parquet
    schema INFERENCE — one whole Spark job per read site that r12's
    read paths paid at plan time (VERDICT r12 finding b: the
    versioned commit/read constant), and at 10⁶ files it is also the
    difference between an O(1) plan and a footer-sampling pass. The
    manifest schema is authoritative by construction: every commit
    records df.schema at write time, and files are immutable."""
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(json.loads(m["schema"]))
    pc = m.get("partition_col")
    if pc and any(f.name == pc for f in schema.fields):
        schema = T.StructType([f for f in schema.fields if f.name != pc])
    return schema


def _read_files_raw(
    spark: SparkSession, m: dict, files: list[str], path: str | None = None
) -> DataFrame:
    """Schema-contract file read WITHOUT deletion-vector filtering —
    for index builds only: indexing soft-deleted rows makes the index
    a superset (bloom/stats admit extra candidates, the exact
    post-filter runs on DV-filtered reads), never a false negative,
    and it keeps the build independent of DV churn. `path` is needed
    only when the manifest carries renamed columns (physical-name
    resolution)."""
    return _scan_with_renames(spark, m, files, path=path)


# rename sidecar file lists are immutable except under purge_rows'
# whole-table relink — cache by (abspath, mtime_ns, size)
_RENAME_SIDECAR_CACHE: dict[tuple, frozenset] = {}


def _load_rename_files(path: str, ref: str) -> frozenset:
    ap = os.path.join(path, ref)
    st = os.stat(ap)
    key = (os.path.abspath(ap), st.st_mtime_ns, st.st_size)
    got = _RENAME_SIDECAR_CACHE.get(key)
    if got is None:
        with open(ap) as fh:
            got = frozenset(json.load(fh))
        _RENAME_SIDECAR_CACHE[key] = got
    return got


def _rename_groups(
    path: str, m: dict, rel_files: list[str]
) -> list[tuple[dict, list[str]]]:
    """Partition a file subset by PHYSICAL-NAME signature: under
    RENAME COLUMN, files written before the rename physically carry
    the old column name (files are immutable; this format maps
    columns by name). The manifest's `renames` entries point at
    immutable sidecar lists of those files; a file in no list carries
    the current logical names. Returns [(mapping {logical→physical},
    files)] — one leaf read per group, group count bounded by the
    number of rename DDLs ever run, 1 for never-renamed tables."""
    ren = m.get("renames") or {}
    if not ren:
        return [({}, list(rel_files))]
    per_file: dict[str, dict] = {}
    for to, entries in ren.items():
        for e in entries:
            for f in _load_rename_files(path, e["files_ref"]):
                per_file.setdefault(f, {})[to] = e["from"]
    groups: dict[tuple, list[str]] = {}
    for f in rel_files:
        sig = tuple(sorted(per_file.get(f, {}).items()))
        groups.setdefault(sig, []).append(f)
    return [(dict(sig), fs) for sig, fs in sorted(groups.items())]


def _scan_with_renames(
    spark: SparkSession,
    m: dict,
    files: list[str],
    path: str | None = None,
    tag: bool = False,
) -> DataFrame:
    """The ONE leaf-file scan builder under the snapshot contract:
    groups `files` (absolute paths) by physical-name signature
    (_rename_groups), reads each group under its PHYSICAL schema
    (same explicit-schema discipline as _manifest_read_schema — no
    inference), aliases physical→logical, and unions. `tag=True`
    attaches (__dv_file, __dv_pos) row identity PER GROUP — the
    `_metadata` struct is a per-scan pseudo-column and cannot be
    referenced above a union. Never-renamed tables take the exact
    single-scan path the format always had."""
    import re as _re

    from pyspark.sql import types as T

    schema = _manifest_read_schema(m)
    has_ren = bool(m.get("renames"))
    if path is None and (tag or has_ren):
        raise ValueError(
            "table path is required for tagged or renamed-column scans"
        )

    def _one(fs: list[str], mapping: dict) -> DataFrame:
        if mapping:
            phys = T.StructType(
                [
                    T.StructField(
                        mapping.get(f.name, f.name), f.dataType, f.nullable
                    )
                    for f in schema.fields
                ]
            )
            df = spark.read.schema(phys).parquet(*fs)
        else:
            df = spark.read.schema(schema).parquet(*fs)
        if not tag and not mapping:
            return df
        cols = [
            F.col(mapping.get(f.name, f.name)).alias(f.name)
            for f in schema.fields
        ]
        if tag:
            abs_root = os.path.abspath(path)
            rel = F.regexp_replace(
                _norm_input_path(), "^" + _re.escape(abs_root + os.sep), ""
            )
            return df.select(
                *cols,
                rel.alias("__dv_file"),
                F.col("_metadata.row_index").alias("__dv_pos"),
            )
        return df.select(*cols)

    if not has_ren:
        return _one(files, {})
    abs_root = os.path.abspath(path)
    rel_to_abs = {
        os.path.relpath(os.path.abspath(f), abs_root): f for f in files
    }
    parts = [
        _one([rel_to_abs[r] for r in rels], mapping)
        for mapping, rels in _rename_groups(path, m, list(rel_to_abs))
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _read_files_as_snapshot(
    spark: SparkSession, m: dict, files: list[str], path: str | None = None
) -> DataFrame:
    """Read a file SUBSET under the snapshot's schema contract: every
    read uses the manifest's EXPLICIT schema (no parquet schema
    inference — see _manifest_read_schema), which is also what makes
    metadata-only evolution work: a pre-evolution candidate file
    projects through the widened manifest schema, null-filling the
    added columns, instead of Spark taking the schema from one file's
    footer and silently dropping them; renamed columns resolve to
    their per-file physical names (_scan_with_renames). Takes the
    CALLER's already-resolved manifest (readers resolve the pointer
    once — a second read here could apply a concurrent commit's
    schema to candidate files selected under the previous version).
    When the manifest carries a DELETION VECTOR (`path` required
    then), the soft-deleted (file, pos) rows are anti-joined out —
    every file subset a DV table serves must flow through here or
    read_version, or deletes would silently resurrect. The DV is
    O(deleted rows) and AQE broadcasts it when small, so the read
    costs one map-side join over the scan, never a rewrite; DV rows
    naming files absent from this manifest simply never match."""
    if not m.get("dv"):
        return _scan_with_renames(spark, m, files, path=path)
    if path is None:
        raise ValueError(
            "manifest carries a deletion vector; the table path is "
            "required to resolve its sidecar"
        )
    tagged = _scan_with_renames(spark, m, files, path=path, tag=True)
    dv = (
        spark.read.schema("file string, pos bigint")
        .parquet(os.path.join(path, m["dv"]["sidecar"]))
        .select(
            F.col("file").alias("__dv_file"), F.col("pos").alias("__dv_pos")
        )
    )
    return tagged.join(dv, ["__dv_file", "__dv_pos"], "left_anti").drop(
        "__dv_file", "__dv_pos"
    )


def stats_skipping_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: commit events RANGE-CLUSTERED by event_id (8
    range partitions → files with near-disjoint event_id intervals —
    the layout Z-order/clustering maintenance produces), harvest
    footer min/max into the stats index, and serve an event_id range
    query through it. The result must equal the plain filtered scan
    (hash-matched against the DuckDB oracle); the probe reading only
    interval-overlapping files is pinned in tests/test_versioned.py."""
    import shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("stats_skip", sf_name, "table")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev.repartitionByRange(8, "event_id"))
    build_column_stats(spark, path, "event_id")
    return stats_lookup(spark, path, "event_id", 2500, 4999).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def vacuum(
    path: str,
    keep_from: int,
    sidecar_grace_sec: float = 0.0,
    dry_run: bool = False,
) -> list[str]:
    """Drop manifests of versions < keep_from (the time-travel
    horizon) unless a TAG pins them, then delete only data files no
    RETAINED manifest references. Returns what was removed.

    `dry_run=True` (Delta's VACUUM DRY RUN) computes and returns the
    same removal list WITHOUT deleting anything or rewriting any
    manifest — the audit-before-reclaim step every retention runbook
    wants; a subsequent real vacuum removes exactly that list (plus
    anything that became unreferenced in between).

    `sidecar_grace_sec` is the Delta-VACUUM-style age window for
    UNREFERENCED index/DV sidecars: a delete_rows_dv in flight writes
    its sidecar BEFORE publishing the manifest that references it, so
    a concurrent vacuum seeing the sidecar as an orphan would reclaim
    it and the delete would publish a manifest pointing at nothing
    (ADVICE r12). With a grace window, sidecar dirs younger than the
    window (mtime) survive even when unreferenced. The default 0
    keeps the no-concurrent-writer contract this docstring already
    imposes on data files (and keeps reclamation deterministic for
    tests); a deployment running maintenance alongside writers sets
    it to its retention window, same as the data-file `mtime > N
    hours` guard described below.

    Reference-counting, not directory sweeping, is load-bearing for
    correctness twice over: COW manifests carry files from OLDER
    version directories by reference (removing `data/v1` wholesale
    would corrupt every later snapshot that carried a v1 partition),
    and tagged snapshots are release pins that must survive any
    horizon. Safe order: unreachable manifests first (no reader can
    resolve those versions anymore), then the now-unreferenced
    files. Orphans from torn/aborted commits are reclaimed the same
    way — they appear in no retained manifest.

    Do not run concurrently with an in-flight commit: its data files
    are unreferenced until the pointer swap and would be reclaimed
    (the table formats gate this with a file-age retention window;
    the same `mtime > N hours` guard drops in here unchanged). The
    same window guards the one reader race deltas introduce: a reader
    that resolved a retained delta's base chain just as vacuum drops
    those base manifests sees FileNotFoundError mid-resolve — the
    materialize-then-remove order below closes it for every read that
    STARTS after vacuum begins, and the retention window covers reads
    already in flight. Manifest rewrites here are atomic
    (write-tmp-then-rename), so no reader can observe a torn file.
    """
    try:
        with open(os.path.join(path, "_TAGS.json")) as fh:
            pinned = set(json.load(fh).values())
    except FileNotFoundError:
        pinned = set()

    removed = []
    keep_versions = set()
    drop_versions = set()
    cur = current_version(path)
    for v in range(1, cur + 1):
        if not os.path.isfile(_manifest_path(path, v)):
            continue
        if v >= keep_from or v in pinned:
            keep_versions.add(v)
        else:
            drop_versions.add(v)
    # A retained DELTA manifest whose resolution chain crosses a
    # to-be-removed version would become unresolvable: materialize it
    # to checkpoint form first (only the retained versions nearest the
    # horizon ever need this — chains are ≤ CHECKPOINT_EVERY long).
    # Self-contained manifests ("files" inline or a files_ref pointer)
    # are skipped by a raw peek — no chain walk, no sidecar inflation —
    # and the resolutions done here are cached for the referenced-file
    # sweep below so no version resolves twice. Rewrites go through
    # write-tmp-then-rename: a concurrent reader can never see a torn
    # manifest.
    resolved: dict[int, dict] = {}
    for v in sorted(keep_versions):
        with open(_manifest_path(path, v)) as fh:
            raw = json.load(fh)
        if "files" in raw or "files_ref" in raw:
            continue  # self-contained; inflate lazily below if needed
        full, chain = _resolve_chain(path, v)
        resolved[v] = full
        if any(c in drop_versions for c in chain) and not dry_run:
            _atomic_json(_manifest_path(path, v), _checkpoint_form(path, full))
    for v in sorted(drop_versions):
        if not dry_run:
            os.remove(_manifest_path(path, v))
        removed.append(_manifest_path(path, v))
    # Torn commits leave manifest_v{>cur}.json files the pointer never
    # reached — unreachable by any reader, but if left behind while
    # their data files are reclaimed below, read_version(path, v)
    # would resolve them to missing files. Sweep them with the data.
    v = cur + 1
    while os.path.isfile(_manifest_path(path, v)):
        if not dry_run:
            os.remove(_manifest_path(path, v))
        removed.append(_manifest_path(path, v))
        v += 1

    referenced = set()
    for v in keep_versions:
        m = resolved.get(v) or _manifest(path, v)
        referenced.update(m["files"])
    data_root = os.path.join(path, "data")
    for rel in _walk_rel_parquet(data_root, path) if os.path.isdir(data_root) else []:
        if rel not in referenced:
            if not dry_run:
                os.remove(os.path.join(path, rel))
            removed.append(os.path.join(path, rel))
    # index sidecars: every rebuild writes a fresh uuid'd dir and swaps
    # the pointer JSON, orphaning the previous one — reclaim any
    # sidecar dir no pointer references (same commit-concurrency
    # caveat as data files: an in-flight build's sidecar is
    # unreferenced until its pointer swap)
    import glob as _glob
    import shutil as _shutil

    active = set()
    for pj in _glob.glob(os.path.join(path, "_BLOOM_*.json")) + _glob.glob(
        os.path.join(path, "_STATS_*.json")
    ):
        try:
            with open(pj) as fh:
                sc = json.load(fh).get("sidecar")
            if sc:
                active.add(os.path.normpath(sc))
        except (OSError, json.JSONDecodeError):
            continue
    def _in_grace(abs_dir: str) -> bool:
        # young unreferenced sidecar: possibly an in-flight build or
        # delete that has not published its pointer yet — spare it
        if sidecar_grace_sec <= 0:
            return False
        try:
            return time.time() - os.path.getmtime(abs_dir) < sidecar_grace_sec
        except OSError:
            return False

    idx_root = os.path.join(path, "_index")
    if os.path.isdir(idx_root):
        for name in sorted(os.listdir(idx_root)):
            sub = os.path.join(idx_root, name)
            for vd in sorted(os.listdir(sub)) if os.path.isdir(sub) else []:
                rel = os.path.normpath(os.path.join("_index", name, vd))
                if rel not in active and not _in_grace(os.path.join(path, rel)):
                    if not dry_run:
                        _shutil.rmtree(os.path.join(path, rel), ignore_errors=True)
                    removed.append(os.path.join(path, rel))
    # deletion-vector sidecars: keep those some RETAINED manifest
    # references (resolved manifests carry the dv key); torn
    # delete_rows_dv attempts and superseded-then-vacuumed DV
    # versions orphan theirs
    dv_root = os.path.join(path, DV_DIR)
    if os.path.isdir(dv_root):
        live_dv = set()
        for v in keep_versions:
            mm = resolved.get(v) or _manifest(path, v)
            if mm.get("dv"):
                live_dv.add(os.path.normpath(mm["dv"]["sidecar"]))
        for fn in sorted(os.listdir(dv_root)):
            rel = os.path.normpath(os.path.join(DV_DIR, fn))
            if rel not in live_dv and not _in_grace(os.path.join(path, rel)):
                if not dry_run:
                    _shutil.rmtree(os.path.join(path, rel), ignore_errors=True)
                removed.append(os.path.join(path, rel))
    # parquet-checkpoint sidecars: keep exactly those a retained
    # manifest still points at (rebuilds/purge repoints orphan the
    # previous sidecar; removed manifests orphan theirs)
    mf_root = os.path.join(path, "_manifest_files")
    if os.path.isdir(mf_root):
        live_refs = set()
        for v in keep_versions:
            with open(_manifest_path(path, v)) as fh:
                ref = json.load(fh).get("files_ref")
            if ref:
                live_refs.add(os.path.normpath(ref))
        for fn in sorted(os.listdir(mf_root)):
            rel = os.path.normpath(os.path.join("_manifest_files", fn))
            if rel not in live_refs:
                if not dry_run:
                    os.remove(os.path.join(path, rel))
                removed.append(os.path.join(path, rel))
    # rename-map sidecars: keep exactly those some retained
    # manifest's renames entries still point at (vacuuming past the
    # last manifest that referenced a rename orphans its sidecar)
    ren_root = os.path.join(path, RENAMES_DIR)
    if os.path.isdir(ren_root):
        live_ren = set()
        for v in keep_versions:
            mm = resolved.get(v) or _manifest(path, v)
            for entries in (mm.get("renames") or {}).values():
                for e in entries:
                    live_ren.add(os.path.normpath(e["files_ref"]))
        for fn in sorted(os.listdir(ren_root)):
            rel = os.path.normpath(os.path.join(RENAMES_DIR, fn))
            if rel not in live_ren and not _in_grace(os.path.join(path, rel)):
                if not dry_run:
                    os.remove(os.path.join(path, rel))
                removed.append(os.path.join(path, rel))
    # a crash between _atomic_json's tmp write and its rename leaves a
    # *.tmp-XXXX orphan beside the metadata — never referenced, safe
    # to sweep (vacuum already forbids concurrent writers)
    for fn in sorted(os.listdir(path)):
        if ".tmp-" in fn and os.path.isfile(os.path.join(path, fn)):
            if not dry_run:
                os.remove(os.path.join(path, fn))
            removed.append(os.path.join(path, fn))
    return removed


def versioned_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: commit the events table as v1, upsert a
    deterministic update batch (every 10th event's value +1000) as
    v2, then TIME-TRAVEL back to v1 and return it — which must be
    byte-identical to the source (identity oracle) despite the later
    commit. Snapshot isolation is exactly this assertion; the v2
    merge semantics and the crash-window atomicity are pinned in
    tests/test_versioned.py."""
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("versioned", sf_name, "table")
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev)
    updates = ev.filter(F.col("event_id") % 10 == 0).withColumn(
        "value", F.col("value") + 1000.0
    )
    upsert_version(spark, path, updates, ["event_id"])
    return read_version(spark, path, version=1)


def deletion_vector_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: commit events as v1, row-level DELETE twice
    through deletion vectors (every 'error' event, then every
    value < 10 among survivors — cumulative, position-keyed,
    metadata-only commits that rewrite NO data file: the manifests'
    file lists stay identical across v1→v3, pinned in
    tests/test_versioned.py), and return the current snapshot. The
    DuckDB oracle is the equivalent anti-filter over the source —
    proving the scan-side anti-join drops exactly the soft-deleted
    rows. Time travel to v1 still serves every row (same test)."""
    import shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("dv", sf_name, "table")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev.repartition(8))
    delete_rows_dv(spark, path, F.col("event_type") == "error")
    delete_rows_dv(spark, path, F.col("value") < 10.0)
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def deletion_vector_maintenance_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Registry entry: the DV MAINTENANCE lifecycle a production table
    cycles through — soft-delete via deletion vector (metadata-only),
    materialize_deletes (fold the DV into a DV-free snapshot: Delta's
    REORG APPLY PURGE), then compact_files (which REFUSES DV-bearing
    snapshots and is unblocked exactly by the materialize). The final
    snapshot must still equal the anti-filtered source after all three
    maintenance commits — same oracle as the pure-DV entry's first
    delete. Guard behavior and vacuum reclamation pinned in
    tests/test_versioned.py."""
    import shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("dvmaint", sf_name, "table")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev.repartition(8))
    delete_rows_dv(spark, path, F.col("event_type") == "error")
    materialize_deletes(spark, path)
    compact_files(spark, path, target_bytes=1 << 30)
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


# ---- partition-granular copy-on-write (the 100 TB refinement) ------

PART_COL = "p_date"


def _walk_rel_parquet(root: str, base: str) -> list[str]:
    out = []
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            if n.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(dirpath, n), base))
    return sorted(out)


def _norm_input_path() -> F.Column:
    """Decoded, scheme-stripped per-row file path — byte-identical
    to `os.path.abspath(unquote(urlparse(uri).path))` on the driver
    for any path (spaces, '%', non-ASCII included). Sourced from the
    `_metadata.file_path` pseudo-column, NOT `input_file_name()`:
    both return the same percent-encoded URI (verified byte-equal
    across space/%/'+'/non-ASCII paths and over a 40M-row table), but
    input_file_name() is a NONDETERMINISTIC expression — it fences
    whole-stage codegen around every tagged scan, which measured 5×
    on the scan+join leg of a 40M-row merge (10.2 s → 2.8 s warm,
    scripts/session_sink_growth.py r16) and taxes every DV-table
    read the same way. The URI is percent-encoded; pre-escape '+'
    (the one char url_decode mishandles — it decodes to space),
    url-decode, strip the scheme. Shared by purge_rows and
    compact_files: the two file-rewrite passes key broadcast maps on
    this normalization, and drift between them is exactly the
    silent-row-loss their __HIVE_DEFAULT_PARTITION__ sentinels guard
    against."""
    decoded = F.url_decode(
        F.regexp_replace(F.col("_metadata.file_path"), r"\+", "%2B")
    )
    return F.regexp_replace(decoded, "^file:/+", "/")


def _footer_schema_groups(
    rels: list[str], abs_of: dict[str, str]
) -> dict[tuple, list[str]]:
    """Group file relpaths by their parquet FOOTER schema (driver-side
    metadata reads, no Spark job) so each rewrite job reads only
    same-schema files — a mergeSchema union write would force evolved
    snapshots through one widened schema, silently null-filling or
    dropping committed columns."""
    import pyarrow.parquet as _pq

    groups: dict[tuple, list[str]] = {}
    for rel in rels:
        sig = tuple(str(f) for f in _pq.read_schema(abs_of[rel]))
        groups.setdefault(sig, []).append(rel)
    return groups


def _partition_of(relpath: str, col: str = PART_COL) -> str | None:
    for seg in relpath.split(os.sep):
        if seg.startswith(col + "="):
            return seg.split("=", 1)[1]
    return None


_distribute_for_write = distribute_for_write


def commit_version_clustered(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    partition_col: str,
    meta: dict | None = None,
    expected_current: int | None = None,
) -> int:
    """commit_version_partitioned generalized to an arbitrary EXISTING
    cluster column (e.g. an ANN index's cell id) instead of the
    derived day column: data lands partitionBy(partition_col) in a
    fresh immutable data/v{N} directory, every file is tagged with its
    partition value in the manifest, and the same OCC-guarded
    atomic pointer swap publishes it. read_version_pruned then serves
    metadata-pruned partition reads against it unchanged."""

    _occ_check(path, expected_current)
    v = current_version(path) + 1
    data_dir = _attempt_data_dir(path, v)
    _guarded_write(
        _distribute_for_write(df, partition_col),
        path,
        lambda g: g.write.partitionBy(partition_col)
        .mode("overwrite")
        .parquet(data_dir),
    )
    files = _walk_rel_parquet(data_dir, path)
    partitions = {f: _partition_of(f, partition_col) for f in files}
    _publish_manifest(
        path,
        v,
        {"version": v, "files": files, "partitions": partitions,
         "partition_col": partition_col,
         "schema": df.schema.json(),
         "committed_at": time.time(),
         "meta": meta or {}},
        expected_current,
    )
    return v


# "dv not passed" sentinel: None must stay expressible as an EXPLICIT
# "this snapshot has no DV" (upsert_version_cow resolved the manifest
# already and threads m.get("dv") verbatim — re-resolving would cost a
# chain walk per commit for nothing)
_DV_UNSET = object()


def commit_version_partitioned(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    ts_col: str = "ts",
    carried: list[str] | None = None,
    meta: dict | None = None,
    expected_current: int | None = None,
    dv=_DV_UNSET,
) -> int:
    """Commit df day-partitioned, carrying over untouched files from
    an earlier snapshot BY REFERENCE: the manifest lists `carried`
    relpaths (files that already exist under data/v{M<N}, never
    rewritten or copied) plus the new version's files, each tagged
    with its partition. Data files stay immutable; only the manifest
    knows which version contributed which partition — exactly how
    Iceberg manifests span snapshots. Same OCC-guarded atomic
    publish as commit_version.

    Deletion-vector safety: when `carried` is non-empty and the
    caller did not thread `dv`, the prior manifest's DV pointer is
    INHERITED — carried files keep whatever soft-deletes they had.
    Dropping it silently would resurrect deleted rows in every
    carried file (ADVICE r12: stream_versioned_append_ingest carried
    files without threading dv). A caller that already resolved the
    prior manifest threads dv=m.get("dv") explicitly (possibly None —
    that is an answer, not an omission, hence the sentinel default);
    a caller that really wants the DV gone materializes first
    (materialize_deletes) or commits without carried files. DV rows
    naming rewritten files never match (see _read_files_as_snapshot), so
    inheriting is always sound."""
    from data_ingestion_pipeline_spark.operators.upsert import with_partition_col

    _occ_check(path, expected_current)
    if dv is _DV_UNSET:
        dv = (
            _manifest(path).get("dv")
            if carried and current_version(path) > 0
            else None
        )
    v = current_version(path) + 1
    data_dir = _attempt_data_dir(path, v)
    _guarded_write(
        _distribute_for_write(with_partition_col(df, ts_col), PART_COL),
        path,
        lambda g: g.write.partitionBy(PART_COL)
        .mode("overwrite")
        .parquet(data_dir),
    )
    new_files = _walk_rel_parquet(data_dir, path)
    files = sorted(list(carried or []) + new_files)
    partitions = {f: _partition_of(f) for f in files}
    _publish_manifest(
        path,
        v,
        {"version": v, "files": files, "partitions": partitions,
         # a partitionBy write of ZERO rows emits no data files
         # (the write_time_partitioned issue); the recorded schema
         # lets read_version serve the empty snapshot correctly
         "schema": df.schema.json(),
         # the column the directory layout DERIVES from (PART_COL is
         # stripped before the schema is recorded, so this — not
         # PART_COL — is what DDL must protect from DROP/RENAME)
         "ts_col": ts_col,
         "committed_at": time.time(),
         # deletion-vector pointer a carried-files caller threads
         # through (upsert_version_cow); rows naming rewritten files
         # never match (see _read_files_as_snapshot)
         **({"dv": dv} if dv else {}),
         "meta": meta or {}},
        expected_current,
    )
    return v


_APPEND_MAX_REBASE = 16  # bounded retries; each is metadata-only


def append_version_clustered(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    partition_col: str,
    meta: dict | None = None,
    expected_current: int | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    rebase: bool = True,
) -> int:
    """APPEND-only clustered commit: the new rows land as fresh files
    in data/v{N+1} (partitioned by partition_col), and EVERY file of
    the current snapshot carries into the new manifest by reference —
    cost is O(new data) regardless of table size, the manifests-span-
    snapshots shape Iceberg appends have. Multiple files per partition
    are normal; readers union them and pruned reads match on the
    per-file partition tag. Prior manifest meta carries forward under
    the new commit's keys (so a model artifact riding in meta — the
    IVF-PQ index's centroids/codebooks — survives appends).

    `stats_cols` / `bloom_cols` request write-time index maintenance —
    THE path where the incremental build earns its keep: the refresh
    harvests only this append's files (O(appended), see
    build_column_stats) instead of the stale-rebuild full-table pass a
    later lookup would otherwise pay. Same post-publish failure
    contract as commit_version (IndexMaintenanceError, commit already
    durable).

    CONCURRENT-APPEND CONFLICT RESOLUTION (Delta's commutative-commit
    logic): blind appends commute — losing the version race does NOT
    invalidate an append the way it invalidates an upsert, because
    the data files are already written under a private dir and only
    ADD to any snapshot. On ConcurrentCommitError the commit REBASES:
    re-resolve the new current, re-stack this append's (already
    written) files on top, and republish — zero data rewrite per
    retry, so N writers appending concurrently all succeed with total
    write cost O(their own data). Rebase is refused (the conflict
    surfaces) when the winner changed what appends are validated
    against: a different schema (rename/widen/drop landed — this
    append's physical files predate it), a different CHECK-constraint
    set (rows were validated under the old contract), or a different
    partition_col. `expected_current` still pins the FIRST attempt;
    set rebase=False for strict single-writer semantics."""

    _occ_check(path, expected_current)
    prior = _manifest(path) if current_version(path) > 0 else {"files": [], "partitions": {}}
    v = prior.get("version", 0) + 1
    data_dir = _attempt_data_dir(path, v)
    cons_at_write = table_constraints(path)
    _guarded_write(
        _distribute_for_write(df, partition_col),
        path,
        lambda g: g.write.partitionBy(partition_col)
        .mode("overwrite")
        .parquet(data_dir),
    )
    new_files = _walk_rel_parquet(data_dir, path)
    new_parts = {f: _partition_of(f, partition_col) for f in new_files}

    base = prior
    exp = expected_current
    for attempt in range(_APPEND_MAX_REBASE + 1):
        v = base.get("version", 0) + 1
        files = sorted(list(base["files"]) + new_files)
        partitions = dict(base.get("partitions", {}))
        partitions.update(new_parts)
        try:
            _publish_manifest(
                path,
                v,
                {"version": v, "files": files, "partitions": partitions,
                 "partition_col": partition_col,
                 "schema": df.schema.json(),
                 "committed_at": time.time(),
                 # deletion vector carries BY REFERENCE: appended files
                 # have no DV rows, carried files keep theirs
                 **({"dv": base["dv"]} if base.get("dv") else {}),
                 "meta": {**base.get("meta", {}), **(meta or {})}},
                exp,
                prev=base if base.get("version") else None,
            )
            break
        except ConcurrentCommitError:
            if not rebase or attempt == _APPEND_MAX_REBASE:
                raise
            cur = _manifest(path)
            if (
                cur.get("schema") != prior.get("schema", df.schema.json())
                and cur.get("schema") != df.schema.json()
            ):
                raise ConcurrentCommitError(
                    "concurrent commit changed the table schema; this "
                    "append's files predate it — re-run the append "
                    "against the new schema"
                )
            if cur.get("partition_col") != partition_col:
                raise ConcurrentCommitError(
                    "concurrent commit changed the partition layout; "
                    "append cannot rebase across it"
                )
            if table_constraints(path) != cons_at_write:
                raise ConcurrentCommitError(
                    "concurrent commit changed the CHECK-constraint "
                    "set; this append was validated under the old one "
                    "— re-run the append"
                )
            base = cur
            exp = None  # the rebase races again under the lock's guard
    for col in stats_cols or ():
        try:
            build_column_stats(spark, path, col)
        except Exception as e:  # noqa: BLE001 — commit already durable
            raise IndexMaintenanceError(v, e) from e
    for col in bloom_cols or ():
        try:
            build_bloom_index(spark, path, col)
        except Exception as e:  # noqa: BLE001 — commit already durable
            raise IndexMaintenanceError(v, e) from e
    return v


def _manifest(path: str, version: int | None = None) -> dict:
    """The MATERIALIZED manifest for a version (default current):
    delta chains resolve to the same full shape a checkpoint has, so
    no reader ever sees the on-disk encoding."""
    v = current_version(path) if version is None else version
    return _resolve_chain(path, v)[0]


def compact_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    meta: dict | None = None,
    expected_current: int | None = None,
) -> dict:
    """Small-file compaction — Delta OPTIMIZE / Iceberg rewrite_data_files
    for this table format. Streaming sinks and frequent small commits
    leave partitions holding many sub-target files; at 100 TB that is
    the classic scan killer (per-file open/footer/seek costs dominate,
    and task counts explode). Compaction bin-packs each partition's
    files into ~target_bytes outputs and commits the result as version
    N+1 whose ROWS ARE IDENTICAL — only the file layout changes.

    Shape (the purge_rows discipline — never a per-file driver loop):
    - PLAN: driver-side manifest + file-size metadata only. A partition
      is selected iff it has ≥ min_files files and bin-packing would
      REDUCE its file count (planned outputs = ceil(total/target)).
    - REWRITE: one Spark job per distinct footer schema (1 for an
      unevolved table): read that group's files, tag each row with its
      partition via a broadcast literal file→partition map (decoded
      input_file_name), salt rows inside each partition to its planned
      output count (row-content xxhash64 — deterministic), and write
      everything in a single partitionBy action into a UNIQUE
      per-attempt data dir (never clobbers a concurrent OCC writer's
      in-flight v{N+1}; torn-attempt debris is unreferenced orphans
      vacuum reclaims).
    - VERIFY + PUBLISH: before the pointer swap, parquet footer
      row-counts (driver-side metadata, no job) must show rewritten ==
      selected — a lost-rows rewrite aborts unpublished. Untouched
      partitions' files carry into the new manifest BY REFERENCE;
      original files stay on disk for older versions until `vacuum`.

    Returns {"version", "files_in", "files_out", "partitions"} — the
    telemetry an OPTIMIZE scheduler keys retries/alerts off. A no-gain
    table returns the current version unchanged (no empty commit).
    """
    import math as _math
    import shutil as _shutil
    from urllib.parse import unquote

    import pyarrow.parquet as _pq

    _occ_check(path, expected_current)
    if current_version(path) == 0:
        # nothing committed yet (e.g. a drained-empty streaming table)
        return {"version": 0, "files_in": 0, "files_out": 0, "partitions": []}
    m = _manifest(path)
    if m.get("dv"):
        raise ValueError(
            "compact_files on a snapshot with a deletion vector: the "
            "bin-pack rewrite shifts row ordinals, which would corrupt "
            "the position-keyed DV; run materialize_deletes first"
        )
    if "partitions" not in m:
        # UNPARTITIONED table (plain commit_version chain — e.g. the
        # streaming sinks' per-micro-batch commits): the whole table is
        # one bin-pack group; no per-row tagging needed
        return _compact_unpartitioned(
            spark, path, m, target_bytes, min_files, meta, expected_current
        )
    parts = m.get("partitions", {})
    part_col = m.get("partition_col", PART_COL)
    by_part: dict[str, list[str]] = {}
    for f in m["files"]:
        pval = parts.get(f)
        if pval is not None:
            by_part.setdefault(pval, []).append(f)

    plan: dict[str, tuple[list[str], int]] = {}
    for pval, fs in sorted(by_part.items()):
        if len(fs) < min_files:
            continue
        total = sum(os.path.getsize(os.path.join(path, f)) for f in fs)
        n_out = max(1, _math.ceil(total / target_bytes))
        if n_out < len(fs):
            plan[pval] = (sorted(fs), n_out)
    if not plan:
        return {
            "version": m["version"],
            "files_in": 0,
            "files_out": 0,
            "partitions": [],
        }

    selected = [f for fs, _ in plan.values() for f in fs]
    sel_set = set(selected)
    carried = [f for f in m["files"] if f not in sel_set]
    abs_of = {rel: os.path.abspath(os.path.join(path, rel)) for rel in selected}
    v = m["version"] + 1
    # UNIQUE output dir per attempt (manifests reference arbitrary
    # relpaths, so outputs need not live at data/v{N}): a torn earlier
    # attempt's debris is simply never referenced (vacuum reclaims it),
    # and — unlike clearing data/v{N+1} in place — this can never
    # delete a concurrent OCC writer's in-flight files for the
    # contested version number; the loser of the race leaves only
    # harmless orphans, the protocol's standing guarantee
    data_dir = os.path.join(path, "data", f"v{v}-compact-{uuid.uuid4().hex[:8]}")

    # manifest partition tags are the Hive-ESCAPED directory strings
    # (_partition_of parses dir names); partitionBy re-escapes its
    # column values, so tag rows with the UNESCAPED value — the write
    # round-trips it back to the identical directory name (idempotent
    # for the digit-only p_date/cell values, load-bearing for values
    # with escaped characters)
    raw_of_tag = {pval: unquote(pval) for pval in plan}

    # one job per footer schema (evolved tables must not be forced
    # through a mergeSchema union — purge_rows' reasoning); append mode
    # lets multiple groups land in the same version directory
    groups = _footer_schema_groups(selected, abs_of)
    part_of_file = {abs_of[rel]: raw_of_tag[parts[rel]] for rel in selected}
    n_out_of_raw = {raw_of_tag[pval]: n for pval, (_, n) in plan.items()}
    try:
        for rels in groups.values():
            pf_pairs, no_pairs = [], []
            for rel in rels:
                pf_pairs.extend(
                    [F.lit(abs_of[rel]), F.lit(part_of_file[abs_of[rel]])]
                )
            for pval, n in n_out_of_raw.items():
                no_pairs.extend([F.lit(pval), F.lit(n)])
            df = _normalize_renamed(
                spark.read.parquet(*[abs_of[r] for r in rels]), m
            )
            cols = df.columns
            tagged = df.withColumn(
                part_col, F.create_map(*pf_pairs)[_norm_input_path()]
            ).withColumn(
                "_salt",
                F.pmod(
                    F.xxhash64(*cols), F.create_map(*no_pairs)[F.col(part_col)]
                ),
            )
            # planned outputs for THIS group = sum of n_out over the
            # DISTINCT partitions represented (summing per file would
            # count a 6-file partition's n_out six times, spawning
            # empty shuffle tasks — output count stays bounded by the
            # salt either way, but the task inflation is waste)
            total_out = sum(
                n_out_of_raw[p]
                for p in {part_of_file[abs_of[r]] for r in rels}
            )
            (
                tagged.repartition(
                    max(total_out, 1), F.col(part_col), F.col("_salt")
                )
                .drop("_salt")
                .write.partitionBy(part_col)
                .mode("append")
                .parquet(data_dir)
            )

        new_files = _walk_rel_parquet(data_dir, path)
        # sentinel (purge_rows' discipline): a NULL partition tag means
        # the URI→partition map missed — rows landed in the Hive default
        # partition and the layout is garbage; abort unpublished
        if any("__HIVE_DEFAULT_PARTITION__" in f for f in new_files):
            raise RuntimeError(
                "compaction file→partition map missed (URI decode drift); aborted unpublished"
            )
        # row-preservation guard (footer metadata, no Spark job): a
        # rewrite that lost rows must never publish
        rows_in = sum(
            _pq.ParquetFile(abs_of[rel]).metadata.num_rows for rel in selected
        )
        rows_out = sum(
            _pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in new_files
        )
        if rows_in != rows_out:
            raise RuntimeError(
                f"compaction would lose rows ({rows_in} in, {rows_out} out); aborted unpublished"
            )
    except BaseException:
        # abort cleanly: the unpublished version dir must not poison a
        # retry (and is invisible to every reader — pointer still at N)
        _shutil.rmtree(data_dir, ignore_errors=True)
        raise

    files = sorted(carried + new_files)
    manifest = {
        "version": v,
        "files": files,
        "partitions": {f: _partition_of(f, part_col) for f in files},
        "schema": m["schema"],
        "committed_at": time.time(),
        # prior meta carries forward (append_version_clustered's
        # contract): a compaction is a rows-identical rewrite, so the
        # streaming sinks' replay batch_id and the IVF-PQ index's
        # model/fingerprint must survive it
        "meta": {
            **m.get("meta", {}),
            **(meta or {}),
            "compaction": {
                "partitions": sorted(plan),
                "files_in": len(selected),
                "files_out": len(new_files),
            },
        },
    }
    if "partition_col" in m:
        manifest["partition_col"] = m["partition_col"]
    if m.get("project_schema"):
        manifest["project_schema"] = m["project_schema"]
    _publish_manifest(path, v, manifest, expected_current, prev=m)
    return {
        "version": v,
        "files_in": len(selected),
        "files_out": len(new_files),
        "partitions": sorted(plan),
    }


def _publish_manifest(
    path: str,
    v: int,
    manifest: dict,
    expected_current: int | None,
    prev: dict | None = None,
) -> None:
    """Shared publish tail for EVERY manifest writer: delta-vs-
    checkpoint encoding (_encode_manifest), OCC-checked manifest
    write, OCC re-check, atomic pointer swap. Any future
    publish-protocol hardening (e.g. fsync before the replace) lands
    once here instead of drifting between writers. `manifest` is
    always the writer's FULL intent (complete file list); the
    encoding choice is invisible to readers (_manifest resolves).
    `prev` is the writer's already-resolved previous snapshot, when it
    has one — the delta encoder then skips its own resolution (at a
    files_ref checkpoint base that second resolution re-read the whole
    parquet sidecar per commit). The JSON write is atomic
    (tmp + rename): a crash mid-publish leaves no torn manifest.

    The whole publish runs under an EXCLUSIVE advisory lock
    (`_COMMIT.lock`, flock): on a local FS the check-then-replace
    sequence alone had a TOCTOU window where two writers could both
    pass the OCC check and both swap the pointer for the same version
    number — the lock serializes [check → manifest write → swap], so
    EXACTLY ONE writer wins a contested version and the loser aborts
    with ConcurrentCommitError before touching any shared name
    (pinned cross-process in tests/test_versioned.py). The section is
    O(manifest JSON) — data files were written before entering, under
    per-attempt unique dirs. On a real object store the lock's job is
    done by conditional-put on the pointer object; same protocol,
    different primitive — the primitive is PLUGGABLE via
    set_pointer_cas (LocalPointerCAS below is the flock default)."""
    with _POINTER_CAS.publish_lock(path):
        _publish_manifest_locked(path, v, manifest, expected_current, prev)


class LocalPointerCAS:
    """The commit protocol's serialization primitive, pluggable
    (VERDICT r14 task 7 — the object-store mapping as an executable
    seam, not prose). Two operations:

    - ``publish_lock(path)``: context manager serializing the whole
      [OCC check → manifest write → pointer swap] publish section.
    - ``swap(path, expected, new)``: atomically move the _CURRENT
      pointer from version ``expected`` to ``new``; raise
      ConcurrentCommitError when the pointer is no longer at
      ``expected`` (another writer's swap landed first).

    Local-FS default (this class): flock for the lock; swap re-reads
    the pointer and os.replace()s it — correct because the lock is
    held across the section, so the re-read cannot go stale.

    - ``put_if_absent(path, name, payload)``: create the version-named
      manifest object iff no object with that name exists; raise
      ConcurrentCommitError otherwise. This is the third leg of the
      protocol (ADVICE r15): without it, in the no-lock object-store
      mode a same-version loser would clobber the winner's
      ALREADY-PUBLISHED manifest with its own content before its swap
      is rejected — the swap would then correctly abort the loser, but
      the published version's manifest would already be corrupted.

    Local-FS default (this class): flock for the lock; swap re-reads
    the pointer and os.replace()s it — correct because the lock is
    held across the section, so the re-read cannot go stale.
    put_if_absent here leans on the same flock: an existing object for
    an UNPUBLISHED version (the monotonicity guard already excluded
    published ones) is provably an orphan from a crashed earlier
    attempt — no live competitor can be mid-publish while we hold the
    lock — so it is taken over with an atomic replace, preserving the
    pre-r16 crash-retry liveness.

    Object-store deployment: there is no flock — publish_lock
    degrades to a no-op and ALL serialization moves into swap() as a
    CONDITIONAL PUT of the pointer object (S3 If-Match on the read
    ETag, GCS x-goog-if-generation-match, ADLS ETag preconditions):
    the store rejects the put when another writer's landed between
    our read and our put, which is exactly swap()'s contract — the
    loser aborts with ConcurrentCommitError before any shared-name
    mutation and the caller re-reads and retries. Manifest objects
    are version-named (contested only by a writer of the SAME
    version) and put_if_absent maps to a conditional CREATE (S3
    If-None-Match:*, GCS x-goog-if-generation-match:0, ADLS
    If-None-Match:*): the precondition failure aborts the loser
    BEFORE the winner's manifest is touched. Crashed-attempt orphans
    (manifest present, pointer never advanced) need an out-of-band
    janitor in that mode (delete manifest objects above the pointer
    past a TTL) — the no-lock primitive cannot distinguish a slow
    live writer from a dead one. A swap of primitive, never of
    protocol.
    tests/test_versioned.py::test_conditional_put_loss_retries_cleanly
    and ::test_same_version_loser_cannot_clobber_published_manifest
    drive simulated conditional-put losses through this seam."""

    def publish_lock(self, path: str):
        import fcntl
        from contextlib import contextmanager

        @contextmanager
        def _lock():
            with open(os.path.join(path, "_COMMIT.lock"), "a") as fh:
                fcntl.flock(fh, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(fh, fcntl.LOCK_UN)

        return _lock()

    def swap(self, path: str, expected: int, new: int) -> None:
        cur = current_version(path)
        if cur != expected:
            raise ConcurrentCommitError(
                f"pointer moved to v{cur} (expected v{expected}) before "
                f"the swap to v{new}; re-read and retry"
            )
        tmp = os.path.join(path, POINTER + ".tmp")
        with open(tmp, "w") as fh:
            fh.write(str(new))
        os.replace(tmp, os.path.join(path, POINTER))

    def put_if_absent(self, path: str, name: str, payload: dict) -> None:
        target = os.path.join(path, name)
        if os.path.exists(target):
            # Under the publish flock no live competitor can be
            # mid-publish, and the monotonicity guard already rejected
            # published versions — the existing object is a crashed
            # attempt's orphan. Take it over atomically (retry
            # liveness); an object-store CAS raises here instead.
            _atomic_json(target, payload)
            return
        # O_EXCL-equivalent create with no torn-file window: write the
        # full payload to a unique tmp, then hard-link it into place —
        # link(2) fails with EEXIST if a competitor landed first.
        tmp = target + f".pia.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"manifest object {name} was created by a concurrent "
                f"same-version writer; re-read and retry"
            )
        finally:
            os.unlink(tmp)


_POINTER_CAS = LocalPointerCAS()


def set_pointer_cas(cas) -> object:
    """Install a deployment's pointer-CAS primitive (conditional-put
    backed on an object store); returns the previous one so tests and
    callers can restore it."""
    global _POINTER_CAS
    prev_cas = _POINTER_CAS
    _POINTER_CAS = cas
    return prev_cas


def _publish_manifest_locked(
    path: str,
    v: int,
    manifest: dict,
    expected_current: int | None,
    prev: dict | None = None,
) -> None:
    _occ_check(path, expected_current)
    # monotonicity guard — independent of expected_current: every
    # writer plans v = current+1 BEFORE its data write, so finding
    # the pointer already at >= v inside the lock means another
    # writer won this version; publishing would clobber its manifest
    cur_now = current_version(path)
    if v <= cur_now:
        raise ConcurrentCommitError(
            f"version v{v} was published by a concurrent writer "
            f"(pointer at v{cur_now}); re-read and retry"
        )
    # metadata-only commits (DDL, DV, zorder, compaction) rebuild the
    # manifest dict from scratch — inherit the partition-deriving
    # column so drop/rename DDL can keep protecting it downstream,
    # and the rename map so pre-rename files keep resolving their
    # physical column names. Writers that did not resolve prev get it
    # resolved here once (and passed on to the delta encoder, which
    # would otherwise resolve it again). Dropping the rename map
    # would make every pre-rename file read the renamed column as
    # NULL — silent data loss, hence the unconditional inheritance.
    # Resolution is NOT free (a delta-chain walk per publish), so the
    # common case must not pay it: ts_col only matters for
    # day-partitioned manifests, and renames can only exist if a
    # rename DDL ever ran on this table — observable as the _renames/
    # sidecar dir, ONE stat call (r14 bench regression: the first cut
    # resolved prev on every unpartitioned commit).
    needs = (
        "ts_col" not in manifest and "partitions" in manifest
    ) or (
        "renames" not in manifest
        and os.path.isdir(os.path.join(path, RENAMES_DIR))
    )
    if needs and prev is None and manifest.get("version", 1) > 1:
        try:
            prev = _manifest(path, manifest["version"] - 1)
        except (FileNotFoundError, ValueError, KeyError):
            prev = None
    if prev is not None:
        if "ts_col" not in manifest and "ts_col" in prev:
            manifest["ts_col"] = prev["ts_col"]
        if "renames" not in manifest and prev.get("renames"):
            manifest["renames"] = prev["renames"]
    enc = _encode_manifest(path, manifest, prev=prev)
    _occ_check(path, expected_current)
    # The version-named manifest write goes through the CAS object too
    # (ADVICE r15): in no-lock object-store mode a same-version loser
    # must fail HERE — before clobbering the winner's already-published
    # manifest — not at the later pointer swap. Third-party CAS
    # objects that predate the seam fall back to the clobbering write,
    # which is exactly their pre-r16 behavior.
    cas_put = getattr(_POINTER_CAS, "put_if_absent", None)
    rel = os.path.relpath(_manifest_path(path, v), path)
    if cas_put is not None:
        cas_put(path, rel, enc)
    else:
        _atomic_json(_manifest_path(path, v), enc)
    _occ_check(path, expected_current)
    # the serialization point: under the local flock cur_now is still
    # current (writers plan v = cur+1, so expected == v-1 == cur_now);
    # an object-store CAS implementation enforces the same contract
    # with a conditional put and no lock.
    _POINTER_CAS.swap(path, cur_now, v)


def _normalize_renamed(df: DataFrame, m: dict) -> DataFrame:
    """Footer-schema rewrites (compaction) read files under their
    PHYSICAL column names; alias any renamed physical column to its
    current logical name so rewrite OUTPUTS always carry logical
    names — rewritten files then need no rename-map entry (they are
    new relpaths, absent from every immutable sidecar list), keeping
    the map's invariant: map ∩ manifest.files = files that physically
    carry an old name."""
    ren = m.get("renames") or {}
    out = df
    for to, entries in ren.items():
        for e in entries:
            if e["from"] in out.columns and to not in out.columns:
                out = out.withColumnRenamed(e["from"], to)
    return out


def _compact_unpartitioned(
    spark: SparkSession,
    path: str,
    m: dict,
    target_bytes: int,
    min_files: int,
    meta: dict | None,
    expected_current: int | None,
) -> dict:
    """compact_files' unpartitioned branch: the table is one bin-pack
    group. Selected = every file smaller than target (full-size files
    are already optimal and carry by reference); one rewrite job per
    footer schema, each `repartition(planned outputs)` → coalesced
    files. Same publication guards as the partitioned path: unique
    per-attempt output dir (never clobbers a concurrent writer; torn
    debris is unreferenced orphans for vacuum), footer row-count check
    before the pointer swap, prior meta carried forward, abort cleans
    up its own dir."""
    import math as _math
    import shutil as _shutil

    import pyarrow.parquet as _pq

    small = sorted(
        f
        for f in m["files"]
        if os.path.getsize(os.path.join(path, f)) < target_bytes
    )
    total = sum(os.path.getsize(os.path.join(path, f)) for f in small)
    n_out = max(1, _math.ceil(total / target_bytes))
    if len(small) < min_files or n_out >= len(small):
        return {
            "version": m["version"],
            "files_in": 0,
            "files_out": 0,
            "partitions": [],
        }
    small_set = set(small)
    carried = [f for f in m["files"] if f not in small_set]
    abs_of = {rel: os.path.abspath(os.path.join(path, rel)) for rel in small}
    v = m["version"] + 1
    data_dir = os.path.join(path, "data", f"v{v}-compact-{uuid.uuid4().hex[:8]}")
    try:
        for rels in _footer_schema_groups(small, abs_of).values():
            share = sum(os.path.getsize(abs_of[r]) for r in rels) / max(total, 1)
            g_out = max(1, round(n_out * share))
            (
                _normalize_renamed(
                    spark.read.parquet(*[abs_of[r] for r in rels]), m
                )
                .repartition(g_out)
                .write.mode("append")
                .parquet(data_dir)
            )
        new_files = _walk_rel_parquet(data_dir, path)
        rows_in = sum(
            _pq.ParquetFile(abs_of[rel]).metadata.num_rows for rel in small
        )
        rows_out = sum(
            _pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in new_files
        )
        if rows_in != rows_out:
            raise RuntimeError(
                f"compaction would lose rows ({rows_in} in, {rows_out} out); aborted unpublished"
            )
    except BaseException:
        _shutil.rmtree(data_dir, ignore_errors=True)
        raise

    manifest = {
        "version": v,
        "files": sorted(carried + new_files),
        "schema": m["schema"],
        "committed_at": time.time(),
        "meta": {
            **m.get("meta", {}),
            **(meta or {}),
            "compaction": {
                "partitions": [],
                "files_in": len(small),
                "files_out": len(new_files),
            },
        },
    }
    if m.get("project_schema"):
        manifest["project_schema"] = m["project_schema"]
    _publish_manifest(path, v, manifest, expected_current, prev=m)
    return {
        "version": v,
        "files_in": len(small),
        "files_out": len(new_files),
        "partitions": [],
    }


def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: commit events day-partitioned but pre-shuffled
    into 6 tasks — every day partition lands ~6 small files, the
    streaming-sink debris pattern — then OPTIMIZE-compact (one output
    file per day at this scale) and return the CURRENT snapshot, which
    must be row-identical to the pre-compaction table (file-count
    shrinkage and carried-file reuse are pinned in
    tests/test_versioned.py)."""
    import shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("compaction", sf_name, "table")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version_partitioned(spark, path, ev.repartition(6))
    compact_files(spark, path)
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def purge_rows(
    spark: SparkSession, path: str, key_col: str, key_values: list
) -> dict:
    """HARD-DELETE rows across EVERY retained snapshot — the
    GDPR/right-to-be-forgotten maintenance pass. An ordinary delete
    commit only hides rows from the NEW version; history (time
    travel, tags, CDF) still serves them until vacuum passes the
    horizon. Purge is the deliberate immutability exception the table
    formats carve out: every retained data file containing a matching
    row is rewritten without it, and every manifest referencing that
    file (COW manifests share files across versions) is repointed to
    the rewrite — version structure, tags, and untouched files stay
    byte-identical.

    Shape: 1 + O(distinct file schemas) Spark jobs regardless of file
    count — never a per-file driver loop (the r6 version ran up to
    three blocking jobs per file; O(files) serial driver passes are a
    100 TB scale-killer).
      1. MEMBERSHIP PROBE: one scan of every referenced file at once,
         `input_file_name()` + the key column only (column pruning),
         with the key predicate expressed as `isin` so parquet
         row-group statistics skip unaffected files inside the scan;
         aggregate to the distinct affected-file set.
      2. REWRITE: affected files grouped by their parquet-footer
         schema (driver-side metadata reads, no job; one group for an
         unevolved table) so each file's survivors keep that file's
         ORIGINAL schema — a mergeSchema union write would force
         evolved snapshots through one widened schema, silently
         null-filling or dropping committed columns. Each group is
         ONE job: tag each row with its source-file index (a
         broadcast literal map keyed on the decoded file URI),
         anti-filter the purge keys (NULL keys are never purge
         targets and are kept explicitly — `~isin` alone is NULL for
         them), and write every rewrite in a single
         `partitionBy(file-index)` action; `repartition(n, idx)` puts
         each source file's survivors in one task, so each index
         directory holds exactly one part file.
    Before ANY original is deleted, a NULL-index sentinel partition
    (`__HIVE_DEFAULT_PARTITION__`) aborts the purge: it means the
    URI→file map missed (encoding drift between input_file_name and
    the driver-side paths) and proceeding would silently drop
    survivors. Driver work after that is pure metadata: one rename
    per affected file and the manifest repoint. Files rewritten to
    emptiness drop out of their manifests. Returns
    {relpath: new_relpath_or_None} for the audit log a real deletion
    workflow must keep.

    For purge sets too large for an in-filter (millions of subjects),
    swap the isin for a broadcast anti-join — that trades row-group
    pruning for predicate scalability; the job shape is unchanged.
    """
    import shutil as _shutil
    from urllib.parse import unquote, urlparse

    cur = current_version(path)
    for _v in range(1, cur + 1):
        if os.path.isfile(_manifest_path(path, _v)):
            _refuse_external(_manifest(path, _v), "purge_rows")
    # file → versions referencing it (shared COW files rewritten once)
    refs: dict[str, list[int]] = {}
    for v in range(1, cur + 1):
        if not os.path.isfile(_manifest_path(path, v)):
            continue
        # a raw peek suffices for the DV guard: delta manifests carry
        # all non-file keys of their version, so the version's own
        # JSON names "dv" iff the resolved snapshot has one
        with open(_manifest_path(path, v)) as fh:
            if "dv" in json.load(fh):
                raise ValueError(
                    f"purge_rows across a history containing deletion "
                    f"vectors (v{v}): the cross-version rewrite shifts "
                    "row ordinals under the position-keyed DV; run "
                    "materialize_deletes (then vacuum) first"
                )
        for f in _manifest(path, v)["files"]:
            refs.setdefault(f, []).append(v)
    if not refs:
        return {}

    vals = [str(x) for x in key_values]
    abs_of = {rel: os.path.abspath(os.path.join(path, rel)) for rel in refs}

    def _to_abs(uri: str) -> str:
        return os.path.abspath(unquote(urlparse(uri).path))

    # Job 1: one probe over ALL referenced files (mergeSchema tolerates
    # evolved snapshots: a file predating key_col reads as null → kept).
    probe = (
        spark.read.option("mergeSchema", "true")
        .parquet(*abs_of.values())
        .filter(F.col(key_col).cast("string").isin(vals))
        .select(F.col("_metadata.file_path").alias("_f"))
        .distinct()
    )
    hit_abs = {_to_abs(r["_f"]) for r in probe.collect()}
    rel_of_abs = {a: r for r, a in abs_of.items()}
    affected = sorted(rel_of_abs[a] for a in hit_abs)

    rewritten: dict[str, str | None] = {}
    if not affected:
        return rewritten

    # Job 2: rewrite every affected file, grouped by footer schema so
    # each file's survivors keep that file's ORIGINAL schema
    # (_footer_schema_groups — driver-side metadata reads, no Spark
    # job); job count is O(distinct schemas), 1 for an unevolved table.
    groups = _footer_schema_groups(affected, abs_of)

    tmp = os.path.join(path, "_purge_tmp")
    _shutil.rmtree(tmp, ignore_errors=True)
    staged: dict[str, str] = {}  # rel → staged rewrite part path
    for gi, rels in enumerate(groups.values()):
        idx_pairs = []
        for i, rel in enumerate(rels):
            idx_pairs.extend([F.lit(abs_of[rel]), F.lit(i)])
        idx_map = F.create_map(*idx_pairs)
        # broadcast map keyed on _norm_input_path() — byte-identical to
        # Job 1's unquote(urlparse(...).path) normalization
        kept = (
            spark.read.parquet(*[abs_of[r] for r in rels])
            .withColumn("_purge_idx", idx_map[_norm_input_path()])
            .filter(
                F.col(key_col).isNull()
                | ~F.col(key_col).cast("string").isin(vals)
            )
        )
        gdir = os.path.join(tmp, f"g{gi}")
        (
            kept.repartition(len(rels), "_purge_idx")
            .write.partitionBy("_purge_idx")
            .mode("overwrite")
            .parquet(gdir)
        )
        # Fail fast BEFORE any original is deleted: survivors with a
        # NULL index mean the URI→file map missed; aborting here loses
        # nothing, proceeding would silently drop those rows.
        if os.path.isdir(
            os.path.join(gdir, "_purge_idx=__HIVE_DEFAULT_PARTITION__")
        ):
            _shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                "purge_rows: survivors mapped to no source file "
                "(input_file_name encoding mismatch); purge aborted "
                "before deleting any original"
            )
        for i, rel in enumerate(rels):
            pdir = os.path.join(gdir, f"_purge_idx={i}")
            parts = (
                [f for f in os.listdir(pdir) if f.endswith(".parquet")]
                if os.path.isdir(pdir)
                else []
            )
            if parts:
                staged[rel] = os.path.join(pdir, parts[0])

    # all rewrites staged and validated — now the metadata swap
    for rel in affected:
        if rel in staged:
            new_rel = rel[: -len(".parquet")] + ".purged.parquet"
            os.replace(staged[rel], os.path.join(path, new_rel))
            rewritten[rel] = new_rel
        else:
            rewritten[rel] = None  # every row matched: file vanishes
        os.remove(abs_of[rel])
    _shutil.rmtree(tmp, ignore_errors=True)

    # Delta chains cannot survive a rename-based purge: a delta's
    # remove list keys on the OLD file name, so repointing its base
    # would resurrect files the delta removed. Materialize every
    # retained manifest to checkpoint form first (purge is the rare
    # compliance-weight pass; O(versions × files) JSON is its price).
    for v in range(1, cur + 1):
        mp = _manifest_path(path, v)
        if os.path.isfile(mp):
            with open(mp) as fh:
                raw = json.load(fh)
            if "files" not in raw and "files_ref" not in raw:
                full = _manifest(path, v)
                _atomic_json(mp, _checkpoint_form(path, full))

    # repoint every retained manifest, preserving partition tags
    for v in range(1, cur + 1):
        mp = _manifest_path(path, v)
        if not os.path.isfile(mp):
            continue
        m = _manifest(path, v)
        if not any(f in rewritten for f in m["files"]):
            continue
        files, parts_map = [], m.get("partitions", {})
        for f in m["files"]:
            if f not in rewritten:
                files.append(f)
            elif rewritten[f] is not None:
                files.append(rewritten[f])
                if f in parts_map:
                    parts_map[rewritten[f]] = parts_map.pop(f)
            else:
                parts_map.pop(f, None)
        m["files"] = sorted(files)
        if "partitions" in m:
            m["partitions"] = parts_map
        _atomic_json(mp, _checkpoint_form(path, m))

    # rename-map sidecars key files by relpath: follow the purge's
    # file relinks (a purged pre-rename file still physically carries
    # its old column name under the NEW relpath — the survivors keep
    # their original footer schema) and drop vanished files
    ren_root = os.path.join(path, RENAMES_DIR)
    if os.path.isdir(ren_root):
        for fn in sorted(os.listdir(ren_root)):
            sp = os.path.join(ren_root, fn)
            try:
                with open(sp) as fh:
                    lst = json.load(fh)
            except (OSError, json.JSONDecodeError):
                continue
            if not any(f in rewritten for f in lst):
                continue
            relinked = []
            for f in lst:
                if f not in rewritten:
                    relinked.append(f)
                elif rewritten[f] is not None:
                    relinked.append(rewritten[f])
            _atomic_json(sp, sorted(relinked))
    return rewritten


def read_version_pruned(
    spark: SparkSession, path: str, partitions: list[str], version: int | None = None
) -> DataFrame:
    """Partition-pruned snapshot read: file selection happens in
    MANIFEST METADATA — no directory listing, no footer reads for
    excluded partitions; the scan plan never mentions them. This is
    the Iceberg metadata-pruning contract, and why `cell/p_date as
    partition key` claims elsewhere in the repo translate to real
    skipped I/O under this table layout."""
    m = _manifest(path, version)
    keep = set(partitions)
    files = [
        os.path.join(path, f)
        for f in m["files"]
        if m.get("partitions", {}).get(f) in keep
    ]
    if not files:
        return read_version(spark, path, m["version"]).limit(0)
    return _read_files_as_snapshot(spark, m, files, path=path)


def upsert_version_cow(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    meta: dict | None = None,
) -> int:
    """Partition-granular COW MERGE: only partitions containing
    update keys are read, merged and rewritten; every other file
    carries into the new manifest by reference. Commit cost scales
    with the touched-partition slice — at 100 TB an upsert touching
    one day rewrites one day, while plain upsert_version rewrites the
    table. The touched-day list is partition METADATA (a distinct
    over the update batch, bounded by day count)."""
    from data_ingestion_pipeline_spark.operators.upsert import with_partition_col

    m = _manifest(path)
    touched = {
        str(r[0])
        for r in with_partition_col(updates, ts_col)
        .select(PART_COL)
        .distinct()
        .collect()
    }
    parts = m.get("partitions", {})
    touched_files = [f for f in m["files"] if parts.get(f) in touched]
    carried = [f for f in m["files"] if parts.get(f) not in touched]
    if touched_files:
        # DV-filtered read: rewritten partitions materialize their
        # deletes; carried files keep theirs via the carried pointer
        base = _read_files_as_snapshot(
            spark, m, [os.path.join(path, f) for f in touched_files], path=path
        )
        merged = updates.unionByName(
            base.join(updates.select(keys).distinct(), on=keys, how="left_anti")
        )
    else:
        merged = updates
    return commit_version_partitioned(
        spark, path, merged, ts_col=ts_col, carried=carried, meta=meta,
        dv=m.get("dv"),
    )


def merge_into_cow(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    when_matched: list[tuple] = (),
    insert_not_matched: bool | dict = False,
    insert_not_matched_cond: str | None = None,
    ts_col: str = "ts",
    meta: dict | None = None,
) -> int:
    """Three-clause MERGE INTO for DAY-PARTITIONED tables, COW
    granularity: merge_into_mor's exact semantics (ordered
    conditional matched-update / matched-delete, guarded
    not-matched-insert, first-clause-wins, source-cardinality
    enforcement) with the partitioned physical shape — ONLY the
    partitions the source touches are read, merged and rewritten;
    every other partition's files carry into the new manifest by
    reference. Rewrite cost ∝ touched-partition slice, the
    upsert_version_cow contract generalized to conditional
    update/delete/insert.

    Same source contract as upsert_version_cow: source rows carry the
    TARGET row's partition timestamp in `ts_col` (true for CDC feeds,
    which carry full images), so the touched-day list is one distinct
    over the source — partition METADATA, no table scan. A source row
    that matches no clause still counts its day as touched (its
    partition is rewritten unchanged — bounded waste, never an
    error). Carried partitions keep their deletion-vector rows via
    the carried pointer; rewritten partitions materialize theirs
    (DV-filtered read), identical to upsert_version_cow."""
    from data_ingestion_pipeline_spark.operators.upsert import with_partition_col

    m = _manifest(path)
    if m["version"] == 0:
        raise ValueError("cannot merge into an empty table")
    if "partitions" not in m:
        raise ValueError(
            "merge_into_cow needs a day-partitioned snapshot; "
            "merge_into_mor is the unpartitioned path"
        )
    target_schema = _manifest_read_schema(m)
    data_cols, col_type = _validate_merge_spec(
        target_schema, when_matched, insert_not_matched
    )

    touched = {
        str(r[0])
        for r in with_partition_col(source, ts_col)
        .select(PART_COL)
        .distinct()
        .collect()
    }
    parts = m.get("partitions", {})
    touched_files = [f for f in m["files"] if parts.get(f) in touched]
    carried = [f for f in m["files"] if parts.get(f) not in touched]

    base = (
        _read_files_as_snapshot(
            spark, m, [os.path.join(path, f) for f in touched_files], path=path
        )
        if touched_files
        else _empty_snapshot(spark, m)
    ).withColumn("__rid", F.monotonically_increasing_id())

    t = base.alias("t")
    # explicit source-presence marker: in the full-outer output,
    # "s.key IS NULL" cannot distinguish an unmatched TARGET row from
    # a NULL-KEYED source row — the marker can, so null-keyed source
    # rows correctly take the NOT MATCHED (insert) path, Delta's
    # null-merge-key semantics
    s = source.withColumn("__src_present", F.lit(1)).alias("s")
    cond = None
    for k in keys:
        eq = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = eq if cond is None else (cond & eq)
    joined = t.join(s, cond, "full_outer")

    has_src = F.col("s.__src_present").isNotNull()
    matched_flag = F.col("t.__rid").isNotNull() & has_src
    action = _merge_action_col(when_matched, matched_flag)

    def _ins_expr(c: str) -> F.Column:
        e = (
            F.expr(insert_not_matched[c])
            if isinstance(insert_not_matched, dict)
            else F.col(f"s.{c}")
        )
        return e.cast(col_type[c]).alias(f"__i_{c}")

    proj = [F.col(f"t.{c}").alias(c) for c in data_cols]
    proj += [
        F.col("t.__rid").alias("__rid"),
        matched_flag.alias("__matched"),
        has_src.alias("__has_src"),
        action.alias("__action"),
    ]
    for i, (op, assigns, _c) in enumerate(when_matched):
        if op == "update":
            for c, e in assigns.items():
                proj.append(F.expr(e).cast(col_type[c]).alias(f"__u{i}_{c}"))
    if insert_not_matched:
        proj += [_ins_expr(c) for c in data_cols]
        # full-outer join: unmatched TARGET rows also have
        # __matched == false, so insert eligibility must REQUIRE a
        # source side (the presence marker — a null-keyed source row
        # is still a source row and inserts) plus the optional
        # NOT MATCHED AND guard
        ins_ok = has_src
        if insert_not_matched_cond:
            ins_ok = ins_ok & F.expr(insert_not_matched_cond)
        proj.append(ins_ok.alias("__ins_ok"))
    else:
        proj.append(F.lit(False).alias("__ins_ok"))
    # one touched-slice scan + one source pass pinned under the counts,
    # the cardinality check and the rewrite
    flat = joined.select(*proj).localCheckpoint(eager=True)

    # ONE global aggregation over the checkpointed rows replaces the
    # former two jobs (the flag-grouped counts collect and a separate
    # per-__rid cardinality shuffle): conditional sums give every
    # clause count, and comparing modifying-row vs distinct-__rid
    # counts detects source-cardinality violations — and, separately,
    # whether ANY target row matched more than once, which decides
    # below if the per-__rid collapse shuffle is needed at all.
    mod = F.col("__matched") & F.col("__action").isNotNull()
    mat = F.col("__matched")
    st = flat.agg(
        *[
            F.coalesce(
                F.sum(F.when(mat & (F.col("__action") == i), 1)), F.lit(0)
            ).alias(f"__n_a{i}")
            for i in range(len(when_matched))
        ],
        F.coalesce(
            F.sum(F.when((~mat) & F.col("__ins_ok"), 1)), F.lit(0)
        ).alias("__n_ins"),
        F.coalesce(F.sum(F.when(mat, 1)), F.lit(0)).alias("__n_match_rows"),
        F.count_distinct(F.when(mat, F.col("__rid"))).alias(
            "__n_match_rids"
        ),
        F.coalesce(F.sum(F.when(mod, 1)), F.lit(0)).alias("__n_mod_rows"),
        F.count_distinct(F.when(mod, F.col("__rid"))).alias("__n_mod_rids"),
    ).collect()[0]
    counts: dict = {
        (True, i): st[f"__n_a{i}"]
        for i in range(len(when_matched))
        if st[f"__n_a{i}"]
    }
    n_ins = st["__n_ins"] if insert_not_matched else 0
    if st["__n_mod_rows"] > st["__n_mod_rids"]:
        raise MergeCardinalityError(
            "multiple source rows matched and attempted to modify "
            "the same target row; deduplicate the source on the "
            "merge keys first"
        )

    update_idx = [
        i for i, (op, _a, _c) in enumerate(when_matched) if op == "update"
    ]
    delete_idx = [
        i for i, (op, _a, _c) in enumerate(when_matched) if op == "delete"
    ]
    n_upd = sum(counts.get((True, i), 0) for i in update_idx)
    n_del = sum(counts.get((True, i), 0) for i in delete_idx)

    # the touched partitions' NEW content: untouched target rows +
    # updated images (delete-routed rows drop out) + guarded inserts.
    # A target row matched by SEVERAL source rows appears once per
    # match in `flat`; the cardinality check above only rejects >=2
    # MODIFYING matches, so copies whose clause routing is a no-op
    # (__action null) must collapse back to ONE surviving row — and to
    # ZERO rows when a sibling copy routed to update/delete (the
    # updated image is emitted by the clause branch below).  The
    # aggregation above already counted matched rows vs distinct
    # matched __rids: when they are equal (the overwhelmingly common
    # case — a deduplicated source), every target row appears exactly
    # once in `flat` and the collapse is a pure map-side filter — no
    # Exchange over the touched slice. Only a multi-matched target
    # (several no-op copies of the same __rid) pays the per-__rid
    # shuffle; target columns are identical across copies, so
    # any_value is exact.
    if st["__n_match_rows"] > st["__n_match_rids"]:
        kept = (
            flat.filter(F.col("__rid").isNotNull())
            .groupBy("__rid")
            .agg(
                F.max(F.col("__action").isNotNull().cast("int")).alias(
                    "__any_mod"
                ),
                *[F.any_value(F.col(c)).alias(c) for c in data_cols],
            )
            .filter(F.col("__any_mod") == 0)
            .select(*[F.col(c) for c in data_cols])
        )
    else:
        kept = flat.filter(
            F.col("__rid").isNotNull() & F.col("__action").isNull()
        ).select(*[F.col(c) for c in data_cols])
    parts_out = [kept]
    for i in update_idx:
        if counts.get((True, i)):
            assigns = when_matched[i][1]
            parts_out.append(
                flat.filter(F.col("__action") == i).select(
                    *[
                        (F.col(f"__u{i}_{c}") if c in assigns else F.col(c)).alias(c)
                        for c in data_cols
                    ]
                )
            )
    if insert_not_matched and n_ins:
        parts_out.append(
            flat.filter(~F.col("__matched") & F.col("__ins_ok")).select(
                *[F.col(f"__i_{c}").alias(c) for c in data_cols]
            )
        )
    merged = parts_out[0]
    for p in parts_out[1:]:
        merged = merged.unionByName(p)

    return commit_version_partitioned(
        spark,
        path,
        merged,
        ts_col=ts_col,
        carried=carried,
        meta={
            **(meta or {}),
            "merge": {"updated": n_upd, "deleted": n_del, "inserted": n_ins},
        },
        dv=m.get("dv"),
    )


def merge_cow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: merge_mor_roundtrip's exact three-clause MERGE
    run against a DAY-PARTITIONED table through the COW path — same
    oracle, different physical shape (only source-touched days
    rewritten; untouched days' files carried byte-identical, pinned
    in tests/test_versioned.py)."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("merge_cow", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version_partitioned(spark, path, ev)
    bucket = F.col("event_id") % 10
    source = (
        ev.filter(bucket == 0)
        .select(
            "event_id", "ts", "user_id", "event_type",
            (F.col("value") * 2).alias("value"),
            F.lit("update").alias("op"),
        )
        .unionByName(
            ev.filter(bucket == 1).select(
                "event_id", "ts", "user_id", "event_type", "value",
                F.lit("delete").alias("op"),
            )
        )
        .unionByName(
            ev.filter(bucket == 2).select(
                (F.col("event_id") + 10000000).alias("event_id"),
                "ts", "user_id",
                F.lit("inserted").alias("event_type"),
                F.lit(-1.0).alias("value"),
                F.lit("insert").alias("op"),
            )
        )
    )
    merge_into_cow(
        spark,
        path,
        source,
        ["event_id"],
        when_matched=[
            ("update", {"value": "s.value", "event_type": "'merged'"}, "s.op = 'update'"),
            ("delete", None, "s.op = 'delete'"),
        ],
        insert_not_matched=True,
    )
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def versioned_cow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: commit events day-partitioned as v1, COW-upsert
    one day's worth of updates (2024-01-10, value +1000.0), and
    return the CURRENT snapshot — the full merge, while v1's files
    for every other day carried over untouched (file reuse and
    pruned reads pinned in tests/test_versioned.py)."""
    import shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("versioned_cow", sf_name, "table")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version_partitioned(spark, path, ev)
    updates = ev.filter(
        F.to_date("ts") == F.lit("2024-01-10").cast("date")
    ).withColumn("value", F.col("value") + 1000.0)
    upsert_version_cow(spark, path, updates, ["event_id"])
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def table_changes(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    keys: list[str],
) -> DataFrame:
    """Change Data Feed between two snapshots — the Delta CDF /
    Iceberg changelog analog, derived from the snapshots themselves:
    rows only in v_to are inserts, rows only in v_from are deletes,
    and key-matched rows whose non-key attributes changed emit an
    update pre/post-image pair. `_change_type` uses the Delta CDF
    vocabulary so downstream consumers port unchanged.

    Shape: ONE full-outer equi-join on the key between the two
    snapshot reads (each pruned to its manifest's files), with change
    detection via a row fingerprint — the SCD2 construction pointed
    at history instead of updates. At scale the join keys on the
    table's partition/bucket key, and on a COW-PARTITIONED table the
    diff first prunes — in PURE METADATA — to partitions whose file
    sets differ between the two manifests (`_cdf_changed_files`): a
    one-day COW upsert on a year-long table diffs one day's files,
    not the year. The pruning is sound because carried files are
    byte-identical (a partition with an unchanged file set has
    unchanged content) and is DISABLED whenever either snapshot
    carries a deletion vector the other doesn't share (a DV delta can
    change rows inside untouched files).
    """
    ma = _manifest(path, v_from)
    mb = _manifest(path, v_to)
    pruned = _cdf_changed_files(ma, mb)
    if pruned is not None:
        fa, fb = pruned
        a_df = (
            _read_files_as_snapshot(
                spark, ma, [os.path.join(path, f) for f in fa], path=path
            )
            if fa
            else _empty_snapshot(spark, ma)
        )
        b_df = (
            _read_files_as_snapshot(
                spark, mb, [os.path.join(path, f) for f in fb], path=path
            )
            if fb
            else _empty_snapshot(spark, mb)
        )
        return snapshot_changes(a_df, b_df, keys)
    return snapshot_changes(
        read_version(spark, path, v_from),
        read_version(spark, path, v_to),
        keys,
    )


def _cdf_changed_files(ma: dict, mb: dict) -> tuple[list, list] | None:
    """Metadata-only CDF pruning for partitioned manifests: the two
    file lists restricted to partitions whose file SETS differ
    (including partitions present on only one side). None → no sound
    pruning available (unpartitioned manifest, or a deletion-vector
    delta that can change row content inside an unchanged file set —
    prune only when both sides reference the IDENTICAL sidecar or
    neither has one). A partition with an identical file set on both
    sides has identical content (files are immutable) and contributes
    no change rows, so dropping it from BOTH scans is exact."""
    if "partitions" not in ma or "partitions" not in mb:
        return None
    if (ma.get("dv") or {}).get("sidecar") != (mb.get("dv") or {}).get(
        "sidecar"
    ):
        return None
    by_part_a: dict = {}
    for f, p in ma["partitions"].items():
        by_part_a.setdefault(p, set()).add(f)
    by_part_b: dict = {}
    for f, p in mb["partitions"].items():
        by_part_b.setdefault(p, set()).add(f)
    changed = {
        p
        for p in set(by_part_a) | set(by_part_b)
        if by_part_a.get(p) != by_part_b.get(p)
    }
    fa = sorted(f for f, p in ma["partitions"].items() if p in changed)
    fb = sorted(f for f, p in mb["partitions"].items() if p in changed)
    return fa, fb


def table_changes_between_tables(
    spark: SparkSession, path_a: str, path_b: str, keys: list[str]
) -> DataFrame:
    """CDF between the CURRENT snapshots of two DIFFERENT tables —
    the replica-repair primitive: diff a drifted replica (a) against
    the source of truth (b) and apply_changes_mor the result to
    converge them, regardless of how the drift happened."""
    return snapshot_changes(
        read_version(spark, path_a), read_version(spark, path_b), keys
    )


def snapshot_changes(
    a_df: DataFrame, b_df: DataFrame, keys: list[str]
) -> DataFrame:
    """Core CDF diff of two snapshots (a = before, b = after): one
    keyed full-outer join + row-fingerprint change detection; emits
    Delta CDF `_change_type` rows (see table_changes)."""
    attrs = [c for c in a_df.columns if c not in keys]

    def fp(side: DataFrame):
        # null-sentineled per column: xxhash64 skips null args without
        # advancing position, so (x, NULL) vs (NULL, x) would collide
        # and the update would silently vanish from the feed
        return F.xxhash64(
            *[F.coalesce(side[c].cast("string"), F.lit("\x00NULL")) for c in attrs]
        )

    a = a_df.alias("a")
    b = b_df.alias("b")
    cond = [a[k] == b[k] for k in keys]
    j = a.join(b, cond, "full_outer").withColumn(
        "_a_exists", a[keys[0]].isNotNull()
    ).withColumn("_b_exists", b[keys[0]].isNotNull())

    deletes = j.filter(F.col("_a_exists") & ~F.col("_b_exists")).select(
        *[a[c].alias(c) for c in keys + attrs],
        F.lit("delete").alias("_change_type"),
    )
    inserts = j.filter(~F.col("_a_exists") & F.col("_b_exists")).select(
        *[b[c].alias(c) for c in keys + attrs],
        F.lit("insert").alias("_change_type"),
    )
    changed = j.filter(
        F.col("_a_exists") & F.col("_b_exists") & (fp(a) != fp(b))
    )
    pre = changed.select(
        *[a[c].alias(c) for c in keys + attrs],
        F.lit("update_preimage").alias("_change_type"),
    )
    post = changed.select(
        *[b[c].alias(c) for c in keys + attrs],
        F.lit("update_postimage").alias("_change_type"),
    )
    return deletes.unionByName(inserts).unionByName(pre).unionByName(post)


def versioned_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: CDF between the roundtrip fixture's v1 and the
    v2 upsert (every 10th event's value +1000) — all changes are
    update pairs by construction, plus nothing else; the oracle
    re-derives the same pre/post-images from the source table."""
    import shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("versioned_cdf", sf_name, "table")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev)
    updates = ev.filter(F.col("event_id") % 10 == 0).withColumn(
        "value", F.col("value") + 1000.0
    )
    upsert_version(spark, path, updates, ["event_id"])
    return table_changes(spark, path, 1, 2, ["event_id"])


def versioned_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: DROP COLUMN lifecycle — commit the 6-column
    events table (props included), drop `props` (metadata-only: files
    byte-identical, pinned), then prove the narrowed table is fully
    writable with a post-drop upsert (+1000 on every 10th event). The
    snapshot must equal the oracle's 5-column CASE scan. Retirement
    semantics (re-adding a dropped name refuses), time travel to the
    6-column version, and the refusal guards are pinned in
    tests/test_versioned.py."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("drop_col", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev6 = load_table(spark, sf_dir, "events")  # all 6 columns
    commit_version(spark, path, ev6)
    drop_column(spark, path, "props")
    upsert_version(
        spark,
        path,
        read_version(spark, path)
        .filter(F.col("event_id") % 10 == 0)
        .withColumn("value", F.col("value") + 1000.0),
        ["event_id"],
    )
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def versioned_drop_column_oracle_sql() -> str:
    return """
        SELECT event_id, ts, user_id, event_type,
               CASE WHEN event_id % 10 = 0 THEN value + 1000.0
                    ELSE value END AS value
        FROM events
    """


def versioned_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: RENAME COLUMN lifecycle — commit events, rename
    `value`→`reading` (metadata-only: files byte-identical, the
    physical-name map routes pre-rename files through the old name),
    upsert post-rename (+1000 on every 10th event, writing files that
    physically carry the NEW name — the mixed-physical-schema read
    this format must get right), then rename `reading`→`measurement`
    (the chain case: the final snapshot reads files carrying THREE
    physical generations: `value` originals, `reading` upsert files,
    and nothing yet under `measurement`). The result must equal the
    oracle's aliased CASE scan. Time travel to every generation,
    retirement of both old names, DV/merge interplay and the refusal
    guards are pinned in tests/test_versioned.py."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("rename_col", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev)
    rename_column(spark, path, "value", "reading")
    # MOR update, not a rewriting upsert: the pre-rename files stay
    # referenced (physically `value`) while the update images land in
    # NEW files physically named `reading` — the mixed-generation read
    merge_into_mor(
        spark,
        path,
        ev.filter(F.col("event_id") % 10 == 0).select("event_id"),
        ["event_id"],
        when_matched=[("update", {"reading": "t.reading + 1000.0"}, None)],
    )
    rename_column(spark, path, "reading", "measurement")
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "measurement"
    )


def versioned_rename_column_oracle_sql() -> str:
    return """
        SELECT event_id, ts, user_id, event_type,
               CASE WHEN event_id % 10 = 0 THEN value + 1000.0
                    ELSE value END AS measurement
        FROM events
    """


def constrained_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: CHECK-constraint lifecycle — declare
    `value <= 50` and `event_type IS NOT NULL` on an empty table,
    commit the conforming slice (succeeds), then attempt to commit
    the violating slice: the write job MUST refuse
    (ConstraintViolationError) and the table MUST still be at v1 with
    only conforming rows — which is what the oracle checks. Inline
    single-pass enforcement, null-passes semantics and add-time
    validation of existing data are pinned in
    tests/test_versioned.py."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("constrained", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    add_constraint(spark, path, "value_cap", "value <= 50")
    add_constraint(spark, path, "typed", "event_type IS NOT NULL")
    commit_version(spark, path, ev.filter(F.col("value") <= 50))
    bad = ev.filter(F.col("value") > 50)
    if bad.limit(1).count():  # empty-input runs have nothing to refuse
        try:
            commit_version(spark, path, bad)
        except ConstraintViolationError:
            pass
        else:  # pragma: no cover — the entry must observe the refusal
            raise RuntimeError("constraint violation was not enforced")
        if current_version(path) != 1:
            raise RuntimeError("refused write still advanced the table")
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def constrained_ingest_oracle_sql() -> str:
    return """
        SELECT event_id, ts, user_id, event_type, value
        FROM events WHERE value <= 50
    """


# ---- incremental CDF consumption: durable-cursor change reader -----


def init_changes_cursor(cursor_path: str, version: int) -> None:
    """Create/overwrite a change cursor acknowledging everything up to
    `version` — the Delta streaming-source `startingVersion` analog
    (init at current_version(path) = "new changes only")."""
    _atomic_json(cursor_path, {"acked": int(version)})


def _read_cursor(cursor_path: str) -> int:
    with open(cursor_path) as fh:
        return int(json.load(fh)["acked"])


def ack_changes(cursor_path: str, version: int) -> None:
    """Advance the cursor AFTER the consumer has durably processed the
    batch consume_changes handed out — the at-least-once commit point
    (crash between consume and ack → the next consume re-emits the
    same batch). Regressions refuse: acking backwards would silently
    re-deliver everything since."""
    acked = _read_cursor(cursor_path)
    if version < acked:
        raise ValueError(
            f"cursor already at {acked}; refusing to regress to {version}"
        )
    _atomic_json(cursor_path, {"acked": int(version)})


def consume_changes(
    spark: SparkSession,
    path: str,
    cursor_path: str,
    keys: list[str],
) -> tuple[DataFrame | None, int]:
    """One incremental read of the change feed: everything that
    changed between the cursor's acked version and the table's
    current version, as a CDF DataFrame (insert / delete /
    update_pre+postimage rows — table_changes), plus the version the
    caller must ack after processing. Returns (None, acked) when
    nothing new committed. This is the Delta streaming-source /
    Iceberg incremental-read consumption loop on this format: a
    downstream replica applies each batch then acks, and a crash
    anywhere replays the un-acked batch (at-least-once; the batch is
    deterministic for fixed versions, so an idempotent applier gets
    exactly-once). The diff is the NET change between the two
    snapshots — intermediate versions a slow consumer skipped are
    collapsed (a row updated 5 times emits one pre/post pair), which
    is exactly what a replica needs and strictly cheaper than
    replaying every commit. Cost: one keyed full-outer join of the
    two snapshot reads — at 100 TB both sides prune to the manifests'
    file lists and a COW-partitioned diff could prune further to
    partitions whose file sets differ (pure metadata)."""
    acked = _read_cursor(cursor_path)
    cur = current_version(path)
    if cur <= acked:
        return None, acked
    try:
        return table_changes(spark, path, acked, cur, keys), cur
    except FileNotFoundError as e:
        # the acked snapshot was vacuumed out from under a slow
        # consumer — the Delta streaming-source "startingVersion no
        # longer available" condition; the feed cannot reconstruct
        # the gap, so the consumer must re-seed (full resync via
        # table_changes_between_tables against its replica)
        raise ValueError(
            f"acked version v{acked} of {path} has been vacuumed; "
            "incremental consumption cannot resume — re-seed the "
            "consumer (diff your replica against the table with "
            "table_changes_between_tables, apply, then re-init the "
            "cursor at the current version)"
        ) from e


def cdf_incremental_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: a two-batch consumer lifecycle — commit events
    (v1, cursor init), UPSERT every 10th value +1000 (v2), consume →
    batch 1 (update pairs), ack; DV-DELETE the clicks (v3), consume →
    batch 2 (deletes, carrying v2 images), ack; a third consume must
    return nothing (pinned in tests). Returns both batches tagged
    `_batch`; the oracle re-derives them from the source table."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    root = scratch_path("cdf_consume", sf_name, "run")
    _shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "table")
    os.makedirs(path, exist_ok=True)
    cursor = os.path.join(root, "cursor.json")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev)
    init_changes_cursor(cursor, current_version(path))

    upsert_version(
        spark,
        path,
        ev.filter(F.col("event_id") % 10 == 0).withColumn(
            "value", F.col("value") + 1000.0
        ),
        ["event_id"],
    )
    b1, v1 = consume_changes(spark, path, cursor, ["event_id"])
    # pin the batch BEFORE acking: the cursor advance is the consumer's
    # durability point, and the returned plan must not re-resolve the
    # table at a later version
    b1 = b1.localCheckpoint(eager=True)
    ack_changes(cursor, v1)

    delete_rows_dv(spark, path, F.col("event_type") == "click")
    b2, v2 = consume_changes(spark, path, cursor, ["event_id"])
    b2 = b2.localCheckpoint(eager=True)
    ack_changes(cursor, v2)

    return b1.withColumn("_batch", F.lit(1)).unionByName(
        b2.withColumn("_batch", F.lit(2))
    )


def cdf_incremental_consume_oracle_sql() -> str:
    return """
        SELECT event_id, ts, user_id, event_type, value,
               'update_preimage' AS _change_type, 1 AS _batch
        FROM events WHERE event_id % 10 = 0
        UNION ALL
        SELECT event_id, ts, user_id, event_type, value + 1000.0,
               'update_postimage', 1
        FROM events WHERE event_id % 10 = 0
        UNION ALL
        SELECT event_id, ts, user_id, event_type,
               CASE WHEN event_id % 10 = 0 THEN value + 1000.0
                    ELSE value END,
               'delete', 2
        FROM events WHERE event_type = 'click'
    """


def cdf_replica_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: CDF → MERGE replication loop, closed — the
    composition a downstream replica actually runs. Source table:
    commit events (v1), upsert every 10th value +1000 (v2), DV-delete
    the clicks (v3). Replica: seeded at v1, then ONE
    consume_changes batch (net diff v1→v3) applied through ONE
    three-clause merge_into_mor (postimages → matched-update, deletes
    → matched-delete, inserts → not-matched-insert; preimages
    dropped). Returns the replica's current snapshot, which must
    equal the source's — the oracle recomputes that state from the
    raw events table. Content-idempotence of re-applying the same
    batch (crash-after-apply-before-ack) is pinned in
    tests/test_versioned.py."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    root = scratch_path("cdf_replica", sf_name, "run")
    _shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    src_path = os.path.join(root, "source")
    rep_path = os.path.join(root, "replica")
    os.makedirs(src_path, exist_ok=True)
    os.makedirs(rep_path, exist_ok=True)
    cursor = os.path.join(root, "cursor.json")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, src_path, ev)
    commit_version(spark, rep_path, ev)
    init_changes_cursor(cursor, current_version(src_path))

    upsert_version(
        spark,
        src_path,
        ev.filter(F.col("event_id") % 10 == 0).withColumn(
            "value", F.col("value") + 1000.0
        ),
        ["event_id"],
    )
    delete_rows_dv(spark, src_path, F.col("event_type") == "click")

    changes, v = consume_changes(spark, src_path, cursor, ["event_id"])
    apply_changes_mor(spark, rep_path, changes, ["event_id"])
    ack_changes(cursor, v)
    return read_version(spark, rep_path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def apply_changes_mor(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    keys: list[str],
    meta: dict | None = None,
) -> int:
    """Apply one CDF batch (table_changes / consume_changes shape) to
    a replica table as ONE three-clause MERGE: update_postimage rows
    update their key's attributes, delete rows delete it, and ONLY
    `insert` rows insert (the NOT MATCHED **AND** guard — without it
    a replayed `delete` row, no longer matching anything, would
    resurrect as an insert). Re-applying the same batch is therefore
    CONTENT-idempotent: postimages re-assert equal values, deletes
    re-match nothing and fail the insert guard, and an already-applied
    insert now MATCHES its key and falls through both matched clauses
    untouched — so an at-least-once consumer (consume → apply → ack)
    yields an exactly-once replica. An unmatched postimage (replica
    missed the insert that preceded the update — a repair scenario)
    is also inserted."""
    attrs = [
        c for c in changes.columns
        if c not in keys and c != "_change_type"
    ]
    src = changes.filter(F.col("_change_type") != "update_preimage")
    return merge_into_mor(
        spark,
        path,
        src,
        keys,
        when_matched=[
            (
                "update",
                {c: f"s.{c}" for c in attrs},
                "s._change_type = 'update_postimage'",
            ),
            ("delete", None, "s._change_type = 'delete'"),
        ],
        insert_not_matched={
            c: f"s.{c}" for c in list(keys) + attrs
        },
        insert_not_matched_cond="s._change_type IN ('insert', 'update_postimage')",
        meta=meta,
    )


def apply_changes(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    keys: list[str],
    meta: dict | None = None,
    ts_col: str = "ts",
) -> int:
    """apply_changes_mor, dispatching on the replica's layout: a
    day-partitioned replica applies the batch through merge_into_cow
    (rewrite ∝ touched days — the change rows carry the target row's
    ts, which is exactly the COW source contract), any other layout
    through the MOR path. Same CDC-batch semantics and
    content-idempotence either way."""
    m = _manifest(path)
    if "partitions" not in m:
        return apply_changes_mor(spark, path, changes, keys, meta=meta)
    attrs = [
        c for c in changes.columns if c not in keys and c != "_change_type"
    ]
    src = changes.filter(F.col("_change_type") != "update_preimage")
    return merge_into_cow(
        spark,
        path,
        src,
        keys,
        when_matched=[
            (
                "update",
                {c: f"s.{c}" for c in attrs},
                "s._change_type = 'update_postimage'",
            ),
            ("delete", None, "s._change_type = 'delete'"),
        ],
        insert_not_matched={c: f"s.{c}" for c in list(keys) + attrs},
        insert_not_matched_cond=(
            "s._change_type IN ('insert', 'update_postimage')"
        ),
        ts_col=ts_col,
        meta=meta,
    )


def cdf_replica_sync_oracle_sql() -> str:
    return """
        SELECT event_id, ts, user_id, event_type,
               CASE WHEN event_id % 10 = 0 THEN value + 1000.0
                    ELSE value END AS value
        FROM events WHERE event_type <> 'click'
    """


# ---- table integrity audit: order-insensitive content checksum -----


def _row_hash_col(df: DataFrame) -> F.Column:
    """Portable per-row content hash: md5 over a canonical
    NULL-sentineled, unit-separated string image of the row (explicit
    microsecond timestamp format, DECIMAL(18,6)-normalized doubles —
    the two cross-engine formatting traps), 15 hex chars → BIGINT
    (< 2⁶⁰: no sign/overflow). DuckDB replays it exactly (see the
    audit entry's oracle), so checksums are comparable across
    engines, not just across runs."""
    parts = []
    for f in df.schema.fields:
        dt = f.dataType.simpleString()
        c = F.col(f.name)
        if dt == "timestamp":
            s = F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        elif dt in ("double", "float"):
            # decimal(38,6), not (18,6): |v| >= 1e12 overflows the
            # narrow type and Spark yields NULL — two DIFFERENT large
            # values would checksum equal (ADVICE r13 low). 38,6
            # covers to ~1e32; beyond that an explicit overflow
            # sentinel carrying the raw double keeps sensitivity and
            # stays distinct from genuine NULL.
            # try_cast: ANSI mode would otherwise RAISE on overflow
            # instead of yielding the NULL the sentinel branch needs
            dec = c.try_cast("decimal(38,6)").cast("string")
            s = F.coalesce(
                dec,
                F.when(
                    c.isNotNull(),
                    F.concat(F.lit("\x00OVF:"), c.cast("string")),
                ),
            )
        else:
            s = c.cast("string")
        parts.append(F.coalesce(s, F.lit("\x00NULL")))
    canon = F.concat_ws("\x1f", *parts)
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")


def table_checksum(
    spark: SparkSession, path: str, version: int | None = None
) -> dict:
    """Order-insensitive content checksum of a snapshot: ONE scan,
    one 3-field aggregate — {rows, xor, sum} where xor/sum combine
    the per-row hashes (xor is duplicate-pair-blind, the decimal sum
    is not; together with the count they pin content for practical
    audit purposes). This is the replica-verification primitive: two
    tables with equal checksums need no row-level diff, and the
    comparison moves 3 numbers, not data — at 100 TB, verify_replica
    costs two scans and one driver equality."""
    df = read_version(spark, path, version)
    r = (
        df.select(_row_hash_col(df).alias("__h"))
        .agg(
            F.count("*").alias("rows"),
            F.expr("bit_xor(__h)").alias("xor"),
            F.sum(F.col("__h").cast("decimal(38,0)")).alias("sum"),
        )
        .collect()[0]
    )
    return {
        "rows": r["rows"],
        "xor": r["xor"] if r["xor"] is not None else 0,
        "sum": str(r["sum"]) if r["sum"] is not None else "0",
    }


def verify_replica(
    spark: SparkSession, source_path: str, replica_path: str
) -> bool:
    """True iff the two tables' CURRENT snapshots hold identical
    content (order-insensitive). The cheap converse of
    table_changes_between_tables: checksums match → skip the diff;
    mismatch → run the diff and apply_changes the result."""
    return table_checksum(spark, source_path) == table_checksum(
        spark, replica_path
    )


def table_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the audit checksum of a committed events
    snapshot, as a 1-row frame the DuckDB oracle recomputes with its
    own md5/bit_xor/sum — pinning cross-engine portability of the
    canonical row image (the property that makes the checksum an
    audit tool rather than a Spark-internal fingerprint).
    verify_replica's match/mismatch behavior is pinned in
    tests/test_versioned.py."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("checksum", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev)
    c = table_checksum(spark, path)
    return spark.createDataFrame(
        [(c["rows"], c["xor"], c["sum"])],
        "n_rows bigint, xor_checksum bigint, sum_checksum string",
    )


def table_checksum_oracle_sql() -> str:
    return """
        WITH canon AS (
            SELECT concat_ws(chr(31),
                COALESCE(CAST(event_id AS VARCHAR), chr(0) || 'NULL'),
                COALESCE(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), chr(0) || 'NULL'),
                COALESCE(CAST(user_id AS VARCHAR), chr(0) || 'NULL'),
                COALESCE(event_type, chr(0) || 'NULL'),
                COALESCE(CAST(CAST(value AS DECIMAL(38,6)) AS VARCHAR),
                         chr(0) || 'NULL')
            ) AS c FROM events
        ), hashed AS (
            SELECT CAST(CONCAT('0x', substr(md5(c), 1, 15)) AS BIGINT) AS h
            FROM canon
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               bit_xor(h) AS xor_checksum,
               CAST(CAST(SUM(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0))
                    AS VARCHAR) AS sum_checksum
        FROM hashed
    """


# ---- shallow clone: zero-copy table copies --------------------------
# Delta's `CREATE TABLE ... SHALLOW CLONE` on this format: the clone
# is an INDEPENDENT table whose v1 manifest references the source's
# data files ACROSS table roots via ../-relative paths — readers
# resolve them through the same os.path.join every local file takes,
# so the entire read/time-travel/commit machinery works unchanged.
# At 100 TB a clone is O(manifest) metadata, zero data movement: the
# branch-for-an-experiment / dev-copy-of-prod primitive. New commits
# on the clone land under the clone's own data/ dir; COW rewrites
# progressively localize; the source is NEVER written (purge is
# refused below precisely because it renames source files in place).
# Known caveat (same as Delta's): vacuuming the SOURCE past the
# cloned snapshot deletes files the clone references — pin the
# source version with tag_version to keep it vacuum-proof.


def _has_external_refs(m: dict) -> bool:
    return any(f.startswith("..") for f in m["files"])


def _refuse_external(m: dict, op: str) -> None:
    """Operations whose row/file bookkeeping assumes table-local
    relpaths (DV position keys, index sidecar file keys, purge's
    in-place renames) refuse on a still-shallow clone: silently wrong
    bookkeeping would resurrect deletes or drop index candidates.
    localize_clone() rewrites the external references locally and
    lifts the restriction; everything else (reads, time travel,
    commits, appends, COW upsert/MERGE, compaction, schema DDL,
    vacuum) works on a shallow clone as-is."""
    if _has_external_refs(m):
        raise ValueError(
            f"{op} is not supported while the table still references "
            "cloned source files (shallow clone); run localize_clone "
            "first"
        )


def clone_table(
    spark: SparkSession,
    src: str,
    dst: str,
    version: int | None = None,
    meta: dict | None = None,
) -> int:
    """SHALLOW CLONE src's snapshot (default: current; any retained
    `version` — including a tagged release — works) into dst as the
    clone's v1. Metadata-only: manifest + partition tags + schema +
    ts_col + CHECK constraints + retired names carry over; rename-map
    sidecars are re-keyed to the clone's ../-relative file names; a
    deletion vector at the clone point is re-keyed to the ABSOLUTE
    paths the clone's scan tag computes for external files (O(deleted
    rows), the only non-O(1) piece, still zero data-file movement).
    The clone then evolves independently — snapshots, DDL, upserts,
    tags, retention — without the source ever observing it."""
    m = _manifest(src, version)
    src_abs = os.path.abspath(src)
    dst_abs = os.path.abspath(dst)
    os.makedirs(dst_abs, exist_ok=True)
    if current_version(dst) > 0:
        raise ValueError(f"clone destination {dst!r} already has commits")
    rel_of = {
        f: os.path.relpath(os.path.join(src_abs, f), dst_abs)
        for f in m["files"]
    }
    manifest: dict = {
        "version": 1,
        "files": sorted(rel_of.values()),
        "schema": m["schema"],
        "committed_at": time.time(),
        "meta": {
            **(meta or {}),
            "cloned_from": src_abs,
            "source_version": m["version"],
        },
    }
    if "partitions" in m:
        manifest["partitions"] = {
            rel_of[f]: p for f, p in m["partitions"].items()
        }
    for k in ("partition_col", "ts_col"):
        if k in m:
            manifest[k] = m[k]
    if m.get("project_schema"):
        manifest["project_schema"] = True
    if m.get("renames"):
        os.makedirs(os.path.join(dst_abs, RENAMES_DIR), exist_ok=True)
        ren: dict = {}
        for to, entries in m["renames"].items():
            es = []
            for i, e in enumerate(entries):
                lst = sorted(
                    rel_of[f]
                    for f in _load_rename_files(src, e["files_ref"])
                    if f in rel_of
                )
                if not lst:
                    continue
                ref = os.path.join(
                    RENAMES_DIR,
                    f"clone-{to}-{i}-{uuid.uuid4().hex[:8]}.json",
                )
                _atomic_json(os.path.join(dst_abs, ref), lst)
                es.append({"from": e["from"], "files_ref": ref})
            if es:
                ren[to] = es
        if ren:
            manifest["renames"] = ren
    if m.get("dv"):
        # the clone's scan computes, for an external file, the
        # normalized ABSOLUTE source path (the dst-prefix strip never
        # matches) — re-key the (file, pos) rows to exactly that
        dv_src = spark.read.schema("file string, pos bigint").parquet(
            os.path.join(src_abs, m["dv"]["sidecar"])
        )
        touched = [r.file for r in dv_src.select("file").distinct().collect()]
        pairs = []
        for f in touched:
            pairs.extend(
                [
                    F.lit(f),
                    F.lit(os.path.abspath(os.path.join(src_abs, f))),
                ]
            )
        remap = F.create_map(*pairs) if pairs else F.create_map()
        dv_rel = os.path.join(DV_DIR, f"clone-{uuid.uuid4().hex[:8]}")
        dv_src.select(
            F.coalesce(remap[F.col("file")], F.col("file")).alias("file"),
            "pos",
        ).repartition(_index_shards(max(1, len(m["files"])))).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst_abs, dv_rel))
        manifest["dv"] = {
            "sidecar": dv_rel,
            "rows": m["dv"]["rows"],
            **(
                {
                    "dead_files": sorted(
                        rel_of[f]
                        for f in m["dv"].get("dead_files", [])
                        if f in rel_of
                    )
                }
                if m["dv"].get("dead_files")
                else {}
            ),
        }
    # Attaching the source's CURRENT constraint set to an OLDER
    # snapshot has the restore_version hazard: the set was validated
    # against a later state, and the cloned rows may predate it.
    # Cloning the current version stays metadata-only (the set is
    # already valid there); an explicit older version pays one
    # early-exit validation scan per constraint before the clone
    # publishes.
    cons = table_constraints(src)
    if cons and version is not None and version != current_version(src):
        snap = read_version(spark, src, version)
        for cname in sorted(cons):
            expr = cons[cname]
            ok = F.coalesce(F.expr(expr), F.lit(True))
            try:
                bad = snap.filter(~ok).limit(1).collect()
            except Exception as e:  # noqa: BLE001 — analysis failure
                raise ConstraintViolationError(
                    f"constraint {cname!r} ({expr}) cannot be evaluated "
                    f"against v{version}'s schema; drop it on the source "
                    "or clone the current version"
                ) from e
            if bad:
                raise ConstraintViolationError(
                    f"clone of v{version} would carry live constraint "
                    f"{cname!r} ({expr}) violated by row "
                    f"{bad[0].asDict()}; drop the constraint or clone "
                    "the current version"
                )
    _publish_manifest(dst_abs, 1, manifest, expected_current=0)
    if cons:
        _atomic_json(os.path.join(dst_abs, CONSTRAINTS_FILE), cons)
    retired = _retired_cols(src)
    if retired:
        _atomic_json(os.path.join(dst_abs, RETIRED_COLS_FILE), retired)
    # identity high-water carries over (table property): the clone's
    # future appends must not reuse ids the source already assigned
    # to rows the clone references
    try:
        with open(os.path.join(src_abs, IDENTITY_FILE)) as fh:
            _atomic_json(os.path.join(dst_abs, IDENTITY_FILE), json.load(fh))
    except FileNotFoundError:
        pass
    return 1


def localize_clone(
    spark: SparkSession, path: str, meta: dict | None = None
) -> int:
    """Deep-clone completion: rewrite every externally-referenced
    file into the clone's own data directory — O(external bytes)
    once, after which DV/MOR DDL, index builds and purge become
    available and the source can be vacuumed freely. Reads go through
    the full snapshot contract (deletion vector applied, renamed
    columns resolved), so soft-deleted rows do not resurrect and the
    localized files carry CURRENT logical column names; local files
    carry by reference. Partition layout is preserved by re-writing
    each external partition group under its directory tag (job count
    = external partition count — a one-time materialization pass)."""
    m = _manifest(path)
    ext = [f for f in m["files"] if f.startswith("..")]
    if not ext:
        return m["version"]
    carried = [f for f in m["files"] if not f.startswith("..")]
    v = m["version"] + 1
    data_dir = _attempt_data_dir(path, v)
    parts_map = m.get("partitions", {})
    pc = m.get("partition_col") or ("partitions" in m and PART_COL) or None
    by_tag: dict = {}
    for f in ext:
        by_tag.setdefault(parts_map.get(f), []).append(f)
    for tag, fs in sorted(by_tag.items(), key=lambda kv: (kv[0] is None, kv[0])):
        out_dir = (
            os.path.join(data_dir, f"{pc}={tag}")
            if tag is not None and pc
            else data_dir
        )
        df = _read_files_as_snapshot(
            spark, m, [os.path.join(path, f) for f in fs], path=path
        )
        _guarded_write(
            df, path, lambda g, d=out_dir: g.write.mode("append").parquet(d)
        )
    new_files = _walk_rel_parquet(data_dir, path)
    files = sorted(carried + new_files)
    manifest: dict = {
        "version": v,
        "files": files,
        "schema": m["schema"],
        "committed_at": time.time(),
        "meta": {**(meta or {}), "localized": len(ext)},
    }
    if "partitions" in m:
        new_parts = {f: _partition_of(f) for f in new_files}
        manifest["partitions"] = {
            **{f: parts_map[f] for f in carried},
            **new_parts,
        }
    for k in ("partition_col", "ts_col"):
        if k in m:
            manifest[k] = m[k]
    if m.get("project_schema"):
        # carried local files may predate schema evolution
        manifest["project_schema"] = True
    # DV rows for rewritten externals never match again (deletes were
    # materialized through the read); carried locals keep theirs
    if m.get("dv") and carried:
        dead = [
            f for f in m["dv"].get("dead_files", []) if f in set(carried)
        ]
        manifest["dv"] = {
            "sidecar": m["dv"]["sidecar"],
            "rows": m["dv"]["rows"],
            **({"dead_files": dead} if dead else {}),
        }
    _publish_manifest(path, v, manifest, None, prev=m)
    return v


# ---- snapshot tags: named dataset releases -------------------------


def tag_version(path: str, name: str, version: int | None = None) -> int:
    """Attach a named ref to a snapshot (Iceberg tag / git-tag
    analog): "corpus-v1.2" pins the exact file set a model trained
    on, surviving any number of later commits until vacuumed. Tags
    are one JSON file updated atomically; re-tagging a name moves
    it."""
    v = current_version(path) if version is None else version
    if v == 0:
        raise ValueError("cannot tag an empty table")
    tags_p = os.path.join(path, "_TAGS.json")
    try:
        with open(tags_p) as fh:
            tags = json.load(fh)
    except FileNotFoundError:
        tags = {}
    tags[name] = v
    tmp = tags_p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(tags, fh)
    os.replace(tmp, tags_p)
    return v


def read_tag(spark: SparkSession, path: str, name: str) -> DataFrame:
    """Read the snapshot a tag names."""
    with open(os.path.join(path, "_TAGS.json")) as fh:
        tags = json.load(fh)
    return read_version(spark, path, tags[name])


def purge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: seed a versioned events table (v1), COW-upsert
    one day (v2, sharing every other day's files), hard-purge two
    deterministic station ids across history, and return v1 — which
    must equal the source MINUS the purged stations on BOTH the
    carried and rewritten files (the oracle reproduces the filter).
    The audit/byte-identity invariants are pinned in
    tests/test_versioned.py::test_purge_rows_erases_across_history."""
    import shutil as _shutil

    from data_ingestion_pipeline_spark.operators.upsert import scratch_path

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("purge", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version_partitioned(spark, path, ev)
    upd = ev.filter(F.col("event_id") % 10 == 0).withColumn(
        "value", F.col("value") + 1000.0
    )
    upsert_version_cow(spark, path, upd, ["event_id"])
    purge_rows(spark, path, "user_id", [7, 11])
    return read_version(spark, path, 1).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


BLOOM_LOOKUP_IDS = [7, 123, 555, 901]  # present at every test SF


def bloom_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: seed a versioned events table spread over 8
    arbitrary-content files (round-robin repartition — deliberately
    NOT clustered on the key, so min/max stats could never prune),
    build the per-file bloom index on event_id, and point-look-up
    four ids through it. The oracle is the plain filter; the pruning
    itself (candidate files ≪ total) is pinned in
    tests/test_versioned.py::test_bloom_index_prunes_files."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("bloomidx", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev.repartition(8))
    build_bloom_index(spark, path, "event_id")
    return bloom_lookup(spark, path, "event_id", BLOOM_LOOKUP_IDS).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def versioned_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: v1 commits the events snapshot, v2 ADDs a
    `quality` column as a METADATA-ONLY commit (no data file written
    or touched — pinned in tests/test_versioned.py), v3 upserts
    quality='checked' onto every 10th event. The current read
    projects v1-era rows through the widened schema (quality NULL)
    and serves the upserted values — the oracle reproduces exactly
    that CASE."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("evolve", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev)
    evolve_schema(spark, path, [("quality", "string")])
    upd = ev.filter(F.col("event_id") % 10 == 0).withColumn(
        "quality", F.lit("checked")
    )
    upsert_version(spark, path, upd, ["event_id"])
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value", "quality"
    )


RETENTION_CUTOFF = "2024-01-12"  # drop chunks strictly before this day


def drop_partitions_before(
    spark: SparkSession,
    path: str,
    cutoff: str,
    expected_current: int | None = None,
) -> int:
    """TimescaleDB `drop_chunks` / `ALTER TABLE DROP PARTITION` as a
    METADATA-ONLY commit: the new manifest simply omits every file
    whose partition tag precedes the cutoff — zero data I/O, O(files)
    manifest work, and the dropped days stay time-travelable until
    vacuum passes the horizon (soft retention, exactly the lakehouse
    posture; purge_rows is the hard variant). The reference runs on
    TimescaleDB, where retention is chunk-level DDL
    (drop_chunks; README.md's hypertable design) — this is the same
    operation against the manifest-versioned layout. At 100 TB
    retention is THE reason day partitioning exists: expiring a
    petabyte costs one manifest write. `expected_current` runs
    commit_version's optimistic-concurrency protocol (re-checked
    before the manifest write and the pointer swap).
    """
    _occ_check(path, expected_current)
    m = _manifest(path)
    parts = m.get("partitions")
    if parts is None:
        raise ValueError("retention needs a partitioned table")
    keep = [f for f in m["files"] if (parts.get(f) is None or parts[f] >= cutoff)]
    v = m["version"] + 1
    _publish_manifest(
        path,
        v,
        {
            "version": v,
            "files": keep,
            "partitions": {f: parts[f] for f in keep if f in parts},
            "schema": m["schema"],
            **({"project_schema": True} if m.get("project_schema") else {}),
            "committed_at": time.time(),
            # dv rows for dropped partitions' files go stale-but-
            # harmless (they match nothing); carry by reference
            **({"dv": m["dv"]} if m.get("dv") else {}),
            "meta": {"retention_dropped_before": cutoff},
        },
        expected_current,
        prev=m,
    )
    return v


def retention_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: day-partitioned events table, then a retention
    pass drops every chunk before RETENTION_CUTOFF metadata-only
    (byte-identity of surviving files and time travel to v1 pinned in
    tests/test_versioned.py::test_retention_is_metadata_only). The
    current snapshot equals the batch filter on whole days."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("retention", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version_partitioned(spark, path, ev)
    drop_partitions_before(spark, path, RETENTION_CUTOFF)
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


# ---- Z-order clustering maintenance (multi-column data skipping) ----
# Delta's OPTIMIZE ... ZORDER BY / Iceberg's sort-order rewrite for
# the VERSIONED TABLE FORMAT — the committed, index-maintained sibling
# of operators/maintenance.py::zorder_cluster_table (which rewrites a
# plain parquet directory with a min-max-scaled Morton key and no
# index integration). This one buckets by QUANTILES (skew-robust where
# linear min-max scaling collapses under outliers), publishes through
# the atomic commit protocol, refreshes the stats index of every
# clustered column at write time, and is served by a multi-column
# candidate-intersection probe (stats_lookup_multi). Lay the table out
# along a space-filling curve over SEVERAL columns so per-file
# [min, max] footer stats stay narrow on EVERY clustered column at
# once — a single-column range-cluster
# (repartitionByRange) gives perfect skipping on one column and none
# on the others; bit-interleaved ordering gives ~n^(1/k) skipping on
# each of k columns. Construction (the standard one): per column,
# rank values into 2^bits quantile buckets (approxQuantile — one
# pass, driver gets 2^bits floats per column, never data), interleave
# the bucket bits into a single z-value, then range-partition + sort
# by it and commit. Everything JVM-side; the only driver payload is
# the boundary list.

ZORDER_BITS = 8  # per-column bucket resolution (256 range buckets)


def _zorder_bucket(col: F.Column, boundaries: list[float]) -> F.Column:
    """Quantile-bucket index of col: how many boundaries lie at or
    below it (a 2^bits-element JVM filter per row — constant work,
    no shuffle, no Python). NULL compares to nothing and lands in
    bucket 0: nulls cluster low, which stats skipping is indifferent
    to (footer min/max ignore nulls; range probes never match null)."""
    arr = F.array([F.lit(float(b)) for b in boundaries])
    return F.size(F.filter(arr, lambda b: b <= col.cast("double")))


def _zorder_value(bucket_cols: list[F.Column], bits: int) -> F.Column:
    """Bit-interleave k bucket indices into one long: output bit
    (bit*k + i) is input i's bit `bit` — the Morton/Z curve. A pure
    shift/or expression tree of k*bits terms (k=2-4, bits=8 → ≤32
    nodes: nowhere near expression-depth limits, cf. the BPE chain
    guard)."""
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for i, b in enumerate(bucket_cols):
            pos = bit * len(bucket_cols) + i
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b.cast("long"), bit).bitwiseAND(F.lit(1)),
                    pos,
                )
            )
    return z


def zorder_cluster(
    spark: SparkSession,
    path: str,
    cols: list[str],
    target_files: int = 16,
    bits: int = ZORDER_BITS,
    meta: dict | None = None,
) -> int:
    """Rewrite the current snapshot Z-ORDERED by `cols` and commit it
    as the next version, refreshing the stats index of every
    clustered column (write-time maintenance — the probes are the
    whole point of the layout). One full-table rewrite, like any
    OPTIMIZE: cost O(table) once, amortized over every multi-column
    range probe after it. Quantile boundaries come from ONE
    approxQuantile pass (all columns together); the z-value is a
    JVM shift/or tree; the layout lands via repartitionByRange +
    sortWithinPartitions on z, so file boundaries follow the curve.
    DV-bearing snapshots are folded first (the rewrite materializes
    deletes — positions change, so carrying the DV would corrupt it;
    the committed manifest is DV-free, pinned in
    tests/test_versioned.py). Refuses non-numeric cluster columns
    (quantile bucketing is numeric; string clustering needs a
    collation-aware curve this engine does not claim)."""
    m = _manifest(path)
    if m["version"] == 0:
        raise ValueError("cannot z-order an empty table")
    df = read_version(spark, path)  # DV-filtered: deletes materialize
    ordered = _zorder_frame(df, cols, bits, target_files)
    return commit_version(
        spark,
        path,
        ordered,
        meta={**(meta or {}), "zorder_by": cols, "zorder_bits": bits},
        stats_cols=cols,
    )


def _zorder_frame(
    df: DataFrame, cols: list[str], bits: int, target_files: int
) -> DataFrame:
    """The z-layout core: quantile-bucket each column (one
    approxQuantile pass), Morton-interleave the bucket bits (JVM
    shift/or tree), range-partition + sort by z. Shared by the full
    and incremental OPTIMIZE paths."""
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        if dt not in ("int", "bigint", "smallint", "tinyint", "float",
                      "double", "decimal", "date", "timestamp") and not (
            dt.startswith("decimal")
        ):
            raise ValueError(f"zorder_cluster: non-numeric column {c!r} ({dt})")
        if dt in ("date", "timestamp"):
            df = df.withColumn(f"__zc_{c}", F.col(c).cast("double"))
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    num_cols = [
        f"__zc_{c}" if f"__zc_{c}" in df.columns else c for c in cols
    ]
    bounds = df.stat.approxQuantile(num_cols, probs, 0.001)
    buckets = [
        _zorder_bucket(F.col(nc), bs) for nc, bs in zip(num_cols, bounds)
    ]
    z = _zorder_value(buckets, bits)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(target_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[c for c in df.columns if c.startswith("__zc_")])
    )


def zorder_cluster_incremental(
    spark: SparkSession,
    path: str,
    cols: list[str],
    target_files: int = 4,
    bits: int = ZORDER_BITS,
    expected_current: int | None = None,
    meta: dict | None = None,
) -> int:
    """Incremental OPTIMIZE ZORDER BY — cluster ONLY the files added
    since the last z-order over the same columns (Delta's
    incremental OPTIMIZE / liquid-clustering shape): the full rewrite
    is O(table) and cannot run per-ingest at 100 TB, while this costs
    O(new data) and keeps every file's min/max tight, so
    stats_lookup_multi keeps pruning (per-FILE stats don't care that
    the layout is layered — each optimize pass adds one internally
    well-clustered layer; pruning power degrades only with layer
    COUNT, and a periodic full zorder_cluster resets it).

    Baseline detection walks commit metas backward for the most
    recent `zorder_by == cols` commit (manifest_meta — scalar inline
    reads, no chain resolution) and treats its files ∩ current files
    as clustered; everything else is the unclustered tail. No such
    commit (or vacuumed history) → falls back to ONE full
    zorder_cluster. Nothing unclustered → no-op (current version
    returned, no empty commit). The unclustered subset is read
    DV-FILTERED, so its deletes materialize into the new layer, while
    the carried DV pointer stays correct for carried files (DV rows
    naming the rewritten files reference names absent from the new
    manifest — inert by the carry-safety contract). Stats refresh is
    incremental: prior sidecar rows carry, only the new layer's
    footers are harvested."""
    _occ_check(path, expected_current)
    m = _manifest(path)
    if m["version"] == 0:
        raise ValueError("cannot z-order an empty table")
    if "partitions" in m or "partition_col" in m:
        raise ValueError(
            "zorder_cluster_incremental supports unpartitioned "
            "snapshots (directory-partitioned layouts cluster within "
            "partitions at write time)"
        )
    clustered: set[str] = set()
    for v in range(m["version"], 0, -1):
        try:
            if manifest_meta(path, v).get("zorder_by") == cols:
                clustered = set(_manifest(path, v)["files"]) & set(m["files"])
                break
        except FileNotFoundError:
            break  # vacuumed history: no provable baseline below here
    else:
        v = 0
    if v == 0 or not clustered:
        return zorder_cluster(
            spark, path, cols, target_files=target_files, bits=bits, meta=meta
        )
    unclustered = [f for f in m["files"] if f not in clustered]
    if not unclustered:
        return m["version"]  # fully clustered: nothing to do
    sub = _read_files_as_snapshot(
        spark, m, [os.path.join(path, f) for f in unclustered], path=path
    )
    ordered = _zorder_frame(sub, cols, bits, target_files)
    nv = m["version"] + 1
    data_dir = os.path.join(path, "data", f"v{nv}-zinc-{uuid.uuid4().hex[:8]}")
    ordered.write.mode("overwrite").parquet(data_dir)
    new_files = _walk_rel_parquet(data_dir, path)
    files = sorted(list(clustered) + new_files)
    _publish_manifest(
        path,
        nv,
        {
            "version": nv,
            "files": files,
            "schema": m["schema"],
            **({"project_schema": True} if m.get("project_schema") else {}),
            "committed_at": time.time(),
            "meta": {
                **(meta or {}),
                "zorder_by": cols,
                "zorder_bits": bits,
                "zorder_incremental": {
                    "rewrote": len(unclustered),
                    "carried": len(clustered),
                },
            },
            **({"dv": m["dv"]} if m.get("dv") else {}),
        },
        expected_current,
        prev=m,
    )
    for c in cols:
        try:
            build_column_stats(spark, path, c)
        except Exception as e:  # noqa: BLE001 — commit already durable
            raise IndexMaintenanceError(nv, e) from e
    return nv


def stats_lookup_multi(
    spark: SparkSession,
    path: str,
    preds: list[tuple],
    max_rebuilds: int = 3,
) -> DataFrame:
    """Multi-column range query through the stats indexes: `preds` is
    [(col, lo, hi), ...]; the candidate set is the INTERSECTION of
    each column's interval-overlap probe (a file pruned by ANY
    clustered dimension provably contains no match), then ONE read of
    the surviving files with every exact predicate applied. On a
    z-ordered table each dimension prunes ~independently — the
    multi-column skipping a single-column layout cannot give. Same
    snapshot-consistent validate/read and bounded rebuild loop as
    stats_lookup."""
    last: Exception | None = None
    for _ in range(max_rebuilds + 1):
        m = _manifest(path)
        cand: set[str] | None = None
        try:
            for col, lo, hi in preds:
                c = set(
                    stats_candidate_files(spark, path, col, lo, hi, manifest=m)
                )
                cand = c if cand is None else (cand & c)
                if not cand:
                    break
        except (StaleStatsIndexError, FileNotFoundError) as e:
            last = e
            for col, _lo, _hi in preds:
                build_column_stats(spark, path, col)
            continue
        if not cand:
            return _empty_snapshot(spark, m)
        df = _read_files_as_snapshot(
            spark, m, [os.path.join(path, rel) for rel in sorted(cand)],
            path=path,
        )
        for col, lo, hi in preds:
            if lo is not None:
                df = df.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(col) <= F.lit(hi))
        return df
    raise last


def zorder_skipping_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: commit events, Z-ORDER by (event_id, value),
    then serve a 2-D range probe through the per-column stats indexes
    (candidate intersection → one pruned read → exact filters). The
    result must equal the plain doubly-filtered scan (DuckDB oracle);
    the pruning evidence — each dimension's probe admits a strict
    subset of files, something a 1-D layout gives only for its own
    sort column — is pinned in tests/test_versioned.py."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("zorder", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev.repartition(8))
    zorder_cluster(spark, path, ["event_id", "value"], target_files=16)
    return stats_lookup_multi(
        spark,
        path,
        [("event_id", 2000, 3999), ("value", 20.0, 60.0)],
    ).select("event_id", "ts", "user_id", "event_type", "value")


# ---- history + restore: the table-format introspection/rollback API --


def zorder_incremental_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: incremental OPTIMIZE lifecycle — full z-order
    over (event_id, value), append a +10⁷-shifted copy of events via
    insert-only MERGE (new unclustered files), then
    zorder_cluster_incremental rewrites ONLY those files into a
    second clustered layer (carried files byte-identical, pinned).
    The 2-D probe lands entirely inside the new layer — every
    original-layer file must prune on the event_id dimension — and
    must equal the oracle's shifted-range scan."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("zorder_inc", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev.repartition(8))
    zorder_cluster(spark, path, ["event_id", "value"], target_files=8)
    # a 20% ingest slice — the realistic OPTIMIZE cadence (cluster a
    # day's appends, not a second copy of the table)
    shifted = ev.filter(F.col("event_id") % 5 == 0).withColumn(
        "event_id", F.col("event_id") + 10_000_000
    )
    merge_into_mor(spark, path, shifted, ["event_id"], insert_not_matched=True)
    zorder_cluster_incremental(
        spark, path, ["event_id", "value"], target_files=4
    )
    return stats_lookup_multi(
        spark,
        path,
        [
            ("event_id", 10_002_000, 10_003_999),
            ("value", 20.0, 60.0),
        ],
    ).select("event_id", "ts", "user_id", "event_type", "value")


def zorder_incremental_oracle_sql() -> str:
    return """
        SELECT event_id + 10000000 AS event_id, ts, user_id,
               event_type, value
        FROM events
        WHERE event_id BETWEEN 2000 AND 3999
          AND event_id % 5 = 0
          AND value BETWEEN 20.0 AND 60.0
    """


def table_history(path: str) -> list[dict]:
    """DESCRIBE HISTORY: one dict per RETAINED version, newest first —
    {version, n_files, dv_rows, meta, committed_at}. Pure metadata
    (manifest resolution only, no data I/O, no Spark); vacuumed
    versions are absent, torn manifests beyond the pointer are never
    listed. committed_at is the audit wall clock (read_as_of's
    caveats apply)."""
    out: list[dict] = []
    for v in range(current_version(path), 0, -1):
        if not os.path.isfile(_manifest_path(path, v)):
            continue  # vacuumed past the horizon
        m = _manifest(path, v)
        out.append(
            {
                "version": v,
                "n_files": len(m["files"]),
                "dv_rows": m.get("dv", {}).get("rows", 0),
                "meta": m.get("meta", {}),
                "committed_at": m.get("committed_at"),
            }
        )
    return out


def restore_version(
    spark: SparkSession,
    path: str,
    to_version: int,
    expected_current: int | None = None,
    meta: dict | None = None,
) -> int:
    """RESTORE TABLE ... TO VERSION AS OF — as a NEW commit whose
    manifest references the target snapshot's files (and DV pointer)
    BY REFERENCE: metadata-only, zero data movement, and the
    intervening history stays time-travelable (Delta's RESTORE
    semantics — rollback is an append to history, never a pointer
    rewind, so a bad restore is itself restorable). Requires the
    target manifest to still be retained (not vacuumed); the restored
    version's files are protected from future vacuums by the same
    reference counting every carried-file commit relies on. Same OCC
    protocol as commit_version."""
    _occ_check(path, expected_current)
    cur = current_version(path)
    if to_version < 1 or to_version > cur:
        raise ValueError(f"cannot restore to v{to_version} (current v{cur})")
    if not os.path.isfile(_manifest_path(path, to_version)):
        raise ValueError(
            f"v{to_version} was vacuumed past the retention horizon; "
            "its files may no longer exist"
        )
    t = _manifest(path, to_version)
    # Live CHECK constraints were validated against the snapshot that
    # existed when they were ADDED — a restore to an earlier version
    # can resurrect rows that predate (and violate) them, leaving a
    # constrained table serving violating rows with no write ever
    # having failed (r15 audit). Validate the TARGET snapshot against
    # the live set before publishing, exactly add_constraint's
    # early-exit scan; a constraint that cannot even be evaluated
    # against the target's schema (references a column added later)
    # refuses too. Unconstrained tables pay one stat call.
    cons = table_constraints(path)
    if cons:
        snap = read_version(spark, path, to_version)
        for cname in sorted(cons):
            expr = cons[cname]
            ok = F.coalesce(F.expr(expr), F.lit(True))
            try:
                bad = snap.filter(~ok).limit(1).collect()
            except Exception as e:  # noqa: BLE001 — analysis failure
                raise ConstraintViolationError(
                    f"constraint {cname!r} ({expr}) cannot be evaluated "
                    f"against v{to_version}'s schema; drop it before "
                    "restoring"
                ) from e
            if bad:
                raise ConstraintViolationError(
                    f"restore to v{to_version} would resurrect a row "
                    f"violating live constraint {cname!r} ({expr}): "
                    f"{bad[0].asDict()}; drop the constraint first"
                )
    prev = _manifest(path, cur)
    v = cur + 1
    _publish_manifest(
        path,
        v,
        {
            "version": v,
            "files": t["files"],  # by reference — no data write
            **({"partitions": t["partitions"]} if "partitions" in t else {}),
            **(
                {"partition_col": t["partition_col"]}
                if "partition_col" in t
                else {}
            ),
            "schema": t["schema"],
            **({"project_schema": True} if t.get("project_schema") else {}),
            **({"dv": t["dv"]} if t.get("dv") else {}),
            # The restored snapshot must carry the TARGET's own rename
            # map and ts_col — they describe exactly the files/schema
            # being restored — never inherit the CURRENT version's via
            # _publish_manifest's prev-fallback: a map keyed to the
            # current logical names is inert against the restored
            # schema, and pre-rename files would then read their
            # renamed columns as NULL (ADVICE r14). When the target
            # predates every rename, an explicit EMPTY map suppresses
            # the inheritance (the _renames/ sidecar dir exists, so
            # the fallback would otherwise fire).
            **({"ts_col": t["ts_col"]} if "ts_col" in t else {}),
            **(
                {"renames": t["renames"]}
                if t.get("renames")
                else (
                    {"renames": {}}
                    if os.path.isdir(os.path.join(path, RENAMES_DIR))
                    else {}
                )
            ),
            "committed_at": time.time(),
            "meta": {**(meta or {}), "restored_from": to_version},
        },
        expected_current,
        prev=prev,
    )
    return v


def table_history_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: a four-commit lifecycle — commit events (v1),
    DV-delete the 'error' rows (v2), MOR-update values < 10 (+5.0, v3),
    RESTORE to v1 (v4) — then emit, per HISTORY version, the row count
    and DV size the snapshot serves. History listing is pure metadata;
    the per-version counts re-read each snapshot, proving time travel
    across delete/update/restore in one entry. The DuckDB oracle
    recomputes all four states from the source."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("history", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version(spark, path, ev.repartition(4))
    delete_rows_dv(spark, path, F.col("event_type") == "error")
    update_rows_mor(
        spark, path, F.col("value") < 10.0, {"value": F.col("value") + 5.0}
    )
    restore_version(spark, path, 1)
    hist = table_history(path)
    rows = [
        (h["version"], int(read_version(spark, path, h["version"]).count()),
         int(h["dv_rows"]))
        for h in hist
    ]
    return spark.createDataFrame(
        rows, "version int, n_rows bigint, dv_rows bigint"
    )


def shallow_clone_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: SHALLOW CLONE lifecycle — commit events
    day-partitioned as the source, zero-copy clone (metadata-only:
    no data file lands under the clone, pinned in tests), then on the
    CLONE upsert +1000 on every 10th event of day 2 (COW: the touched
    day localizes into the clone's own data dir; every other day is
    still served from the source's files) and rename value→reading.
    The returned snapshot reads across BOTH table roots through one
    logical schema; the source must remain byte-identical (pinned).
    Delta analog: CREATE TABLE ... SHALLOW CLONE + writes on the
    clone."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    root = scratch_path("clone", sf_name, "run")
    _shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    dst = os.path.join(root, "dst")
    os.makedirs(src, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    commit_version_partitioned(spark, src, ev)
    clone_table(spark, src, dst)
    day2 = read_version(spark, dst).filter(
        F.to_date("ts") == F.lit("2024-01-02").cast("date")
    )
    upsert_version_cow(
        spark,
        dst,
        day2.filter(F.col("event_id") % 10 == 0).withColumn(
            "value", F.col("value") + 1000.0
        ),
        ["event_id"],
    )
    rename_column(spark, dst, "value", "reading")
    return read_version(spark, dst).select(
        "event_id", "ts", "user_id", "event_type", "reading"
    )


def shallow_clone_oracle_sql() -> str:
    return """
        SELECT event_id, ts, user_id, event_type,
               CASE WHEN event_id % 10 = 0
                         AND CAST(ts AS DATE) = DATE '2024-01-02'
                    THEN value + 1000.0 ELSE value END AS reading
        FROM events
    """


def versioned_widen_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ALTER COLUMN TYPE lifecycle — commit events
    with DELIBERATELY NARROW physical types (user_id int, value
    float), widen both metadata-only (int→bigint, float→double; files
    byte-identical, pinned), then MOR-update every 10th event's value
    +1000 so the update images land as physically-WIDE files while
    the originals stay narrow: the returned snapshot reads MIXED
    physical generations through the reader's lossless upcast. The
    oracle replays the narrow-then-wide conversion in SQL
    (REAL→DOUBLE is the same IEEE widening in both engines)."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("widen_col", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.col("user_id").cast("int").alias("user_id"),
        "event_type",
        F.col("value").cast("float").alias("value"),
    )
    commit_version(spark, path, ev)
    widen_column_type(spark, path, "user_id", "bigint")
    widen_column_type(spark, path, "value", "double")
    merge_into_mor(
        spark,
        path,
        ev.filter(F.col("event_id") % 10 == 0).select("event_id"),
        ["event_id"],
        when_matched=[("update", {"value": "t.value + 1000.0"}, None)],
    )
    return read_version(spark, path).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def versioned_widen_column_oracle_sql() -> str:
    return """
        SELECT event_id, ts, CAST(user_id AS BIGINT) AS user_id,
               event_type,
               CASE WHEN event_id % 10 = 0
                    THEN CAST(CAST(value AS REAL) AS DOUBLE) + 1000.0
                    ELSE CAST(CAST(value AS REAL) AS DOUBLE)
               END AS value
        FROM events
    """


# ---- identity columns: distributed monotonic row ids ----------------

IDENTITY_FILE = "_IDENTITY.json"


def identity_high_water(path: str, id_col: str) -> int:
    """The next unassigned identity value for `id_col` (0 for a
    column that never assigned any). A TABLE PROPERTY sidecar — like
    CHECK constraints and retired names — NOT commit meta: the r15
    audit found the meta-riding design lost the high-water mark to
    ANY intervening commit that wrote its own meta (DDL, RESTORE,
    compaction), after which the next append would silently REUSE
    ids. Delta stores identity state in column metadata for the same
    reason: it is per-column table state, not per-commit payload."""
    try:
        with open(os.path.join(path, IDENTITY_FILE)) as fh:
            return int(json.load(fh).get(id_col, 0))
    except FileNotFoundError:
        return 0


def advance_identity(path: str, id_col: str, new_hwm: int) -> int:
    """Advance `id_col`'s high-water mark — MONOTONIC: a regression
    is refused, because assigned ids may already live in downstream
    systems (Delta's identity contract: values are never reused, not
    even across RESTORE — the sidecar deliberately survives restore/
    DDL untouched). Serialized under flock: the read-modify-write is
    otherwise a lost-update hazard between two concurrent appenders
    (the constraint-DDL argument; maps to conditional-put on an
    object store). Call AFTER the append commit publishes: a crash
    between the two leaves the mark low and the retry re-advances —
    at worst ids are assigned twice to the SAME rows of a commit that
    never published, never to two different commits."""
    import fcntl

    with open(os.path.join(path, IDENTITY_FILE + ".lock"), "a") as fh:
        fcntl.flock(fh, fcntl.LOCK_EX)
        try:
            try:
                with open(os.path.join(path, IDENTITY_FILE)) as f2:
                    state = json.load(f2)
            except FileNotFoundError:
                state = {}
            cur = int(state.get(id_col, 0))
            if new_hwm < cur:
                raise ValueError(
                    f"identity {id_col!r} high-water is {cur}; refusing "
                    f"to regress to {new_hwm} (assigned ids are never "
                    "reused)"
                )
            state[id_col] = int(new_hwm)
            _atomic_json(os.path.join(path, IDENTITY_FILE), state)
            return int(new_hwm)
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)


def reserve_identity(path: str, id_col: str, n: int) -> int:
    """Atomically reserve the id range [start, start+n) — the
    CONCURRENT-WRITER identity protocol: the read-and-advance runs
    under the property flock, so two appenders' ranges are disjoint
    BEFORE either commits (their blind appends then commute through
    the rebase path). A writer that crashes after reserving leaves a
    GAP in the id space, never a duplicate — exactly Delta's identity
    contract (gaps allowed, reuse never). Single-writer pipelines
    that want gap-free density call advance_identity AFTER the
    publish instead (identity_column_appends does); the two modes
    share the same monotonic property file. Returns start."""
    import fcntl

    if n < 0:
        raise ValueError(f"cannot reserve a negative range ({n})")
    with open(os.path.join(path, IDENTITY_FILE + ".lock"), "a") as fh:
        fcntl.flock(fh, fcntl.LOCK_EX)
        try:
            try:
                with open(os.path.join(path, IDENTITY_FILE)) as f2:
                    state = json.load(f2)
            except FileNotFoundError:
                state = {}
            start = int(state.get(id_col, 0))
            state[id_col] = start + int(n)
            _atomic_json(os.path.join(path, IDENTITY_FILE), state)
            return start
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)


def assign_identity(
    df: DataFrame,
    id_col: str,
    order_by: list[str],
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign a gap-free monotonically increasing identity column —
    Delta's IDENTITY columns, made DETERMINISTIC: ids are the global
    rank of a total order over `order_by` (must be a unique key),
    offset by `start`, computed WITHOUT the single-partition window
    a naive `row_number() OVER (ORDER BY ...)` plans (the classic
    scale killer: one task sorts the world). Shape: one range
    exchange + in-partition sort (pinned by localCheckpoint so the
    sampled range boundaries cannot move between passes), a
    per-partition count aggregate (driver receives O(partitions)
    rows), then one Arrow stage adding cumulative-offset + local
    position. Rank is boundary-independent: any range partitioning of
    a total order yields the same global ranks, so the ids are a pure
    function of the data — replayable by the DuckDB oracle and safe
    under retries."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [f.name for f in df.schema.fields]

    # (pid, local position) are materialized INTO the checkpoint, not
    # read from TaskContext in the consuming stage: partition ids are
    # STAGE-relative, so a downstream union/coalesce renumbers them
    # and the offset lookup silently missed — ids collapsed to
    # per-partition restarts the moment the tagged frame was composed
    # before committing (r15 audit; the eager-checkpoint job below is
    # the one stage whose partition index IS the range-partition
    # index, so capturing there makes the ids a pure function of the
    # data again, immune to the consumer's plan).
    def tag(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in batches:
            out = pdf.copy()
            out.insert(0, "__pos", range(seen, seen + len(pdf)))
            out.insert(0, "__pid", pid)
            seen += len(pdf)
            yield out

    tag_schema = ", ".join(
        ["__pid int", "__pos bigint"]
        + [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    )
    pinned = (
        df.repartitionByRange(n, *[F.col(c) for c in order_by])
        .sortWithinPartitions(*[F.col(c) for c in order_by])
        .mapInPandas(tag, tag_schema)
        .localCheckpoint(eager=True)
    )
    sizes = {
        r["__pid"]: r["n"]
        for r in pinned.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets = {}
    acc = start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    base = (
        F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        )[F.col("__pid")]
        if offsets
        else F.lit(start)
    )
    return pinned.withColumn(
        id_col, (base + F.col("__pos")).cast("bigint")
    ).select(id_col, *cols)


def identity_column_appends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: IDENTITY-column lifecycle — two appends to a
    clustered table, each assigning gap-free row ids from the
    identity high-water TABLE PROPERTY (`_IDENTITY.json`,
    identity_high_water/advance_identity — per-column table state the
    way Delta keeps it in column metadata, surviving DDL/RESTORE/
    maintenance commits that write their own meta; the r15 fix for
    the meta-riding design that lost the mark to any intervening
    commit): evens get [0, n), odds get [n, n+m). Ids are the
    deterministic global rank over event_id, so the oracle replays
    them with row_number(); uniqueness, density and hwm persistence
    across DDL + RESTORE are pinned in tests."""
    import shutil as _shutil

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path("identity", sf_name, "table")
    _shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    for parity in (0, 1):
        half = ev.filter(F.col("event_id") % 2 == parity)
        hwm = identity_high_water(path, "row_id")
        tagged = (
            assign_identity(half, "row_id", ["event_id"], start=hwm)
            .withColumn("p_shard", F.col("event_type"))
            # ids are already deterministic (pure rank of the data),
            # so re-shuffling for WRITE LAYOUT is safe: one exchange
            # on the shard key turns 32 partitions × 5 shards = 160
            # tiny files per append into 5 right-sized ones
            .repartition(F.col("p_shard"))
        )
        # partitionBy strips the cluster column from the data files —
        # shard on a DERIVED copy so event_type itself stays readable
        # (the build_ivfpq_index pattern)
        append_version_clustered(
            spark,
            path,
            tagged,
            "p_shard",
            meta={"id_hwm": hwm + half.count()},  # audit trail only
        )
        # property advance AFTER the publish: a crash between the two
        # re-assigns the same ids to the same unpublished rows on
        # retry, never to a different commit
        advance_identity(path, "row_id", hwm + half.count())
    return read_version(spark, path).select(
        "row_id", "event_id", "event_type", "value"
    )


def identity_column_oracle_sql() -> str:
    return """
        WITH e AS (
            SELECT event_id, event_type, value FROM events
            WHERE event_id % 2 = 0
        ), o AS (
            SELECT event_id, event_type, value FROM events
            WHERE event_id % 2 = 1
        )
        SELECT CAST(row_number() OVER (ORDER BY event_id) - 1 AS BIGINT)
                   AS row_id, event_id, event_type, value
        FROM e
        UNION ALL
        SELECT (SELECT COUNT(*) FROM e)
                   + row_number() OVER (ORDER BY event_id) - 1,
               event_id, event_type, value
        FROM o
    """
