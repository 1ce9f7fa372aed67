"""Snapshot-manifest lake table: the engine's exactly-once sink.

No Iceberg runtime jar ships in this environment, so the sink is a
from-scratch copy-on-write table format with Iceberg-like semantics,
implemented on parquet + JSON manifests:

* **Atomic snapshot commits** — data files are written to a new immutable
  snapshot directory, then a manifest (file inventory + schema + lineage) is
  published and the ``_current`` pointer is swapped with ``os.replace``
  (atomic on POSIX; on an object store this swap maps to a catalog/metastore
  CAS — the single point to port).
* **Exactly-once epochs** — every commit records its ``epoch_id``; a replayed
  epoch is detected in :meth:`LakeTable.merge` and skipped, upgrading the
  reference's commit-per-1000-rows at-least-once loads
  (``/root/reference/geopetl/oracle_sde.py:1050-1074``) to idempotent
  exactly-once.
* **Hash-bucket layout** — rows are bucketed by ``pmod(xxhash64(key), N)``;
  each snapshot keeps one parquet directory per touched bucket, and the
  manifest carries forward untouched buckets' directories from the parent
  snapshot. MERGE therefore costs O(changed buckets), not O(table) — the
  same copy-on-write economics as Iceberg's.

  **Regime limits, named:** a uniformly-keyed epoch touches all N buckets
  and CoW rewrites the full table per epoch. The mitigations, by table size:
  (a) raise ``n_buckets`` with the table (bucket count is a create-time
  spec, like Iceberg partition specs); (b) switch the table or the epoch to
  **merge-on-read** (``strategy='mor'``): O(batch) delta files + read-time
  ``max_by(_lsn,_seq)`` reconcile + background ``compact()`` — implemented
  below, state-equivalent to CoW by construction and test; (c) within-bucket
  key-range file stats would prune further at 10^10+ rows (future work —
  requires per-file min/max key tracking in the manifest).
* **Additive schema evolution** — the manifest schema evolves via
  :func:`geopetl_spark.schema.evolve_schema`; reads always apply the current
  manifest schema, so files written before a column existed surface NULLs
  (the reference instead *errors* on unknown fields,
  ``oracle_sde.py:923-927`` — upgraded per the north rule).

Write-path parity with the reference:

* ``write(mode='overwrite')``  ≈ ``tooraclesde(truncate=True)``
  (``oracle_sde.py:35-61``) — full refresh.
* ``write(mode='append')``     ≈ ``appendoraclesde`` (``oracle_sde.py:74-82``)
  — blind append, no key reconciliation.
* ``merge(...)``               ≈ the ``increment=True`` upsert path (W3,
  ``oracle_sde.py:987-999``) recast as LSN-ordered key-partitioned MERGE.
* ``truncate()``               ≈ W1 (``oracle_sde.py:1076-1082``) including
  "RESTART IDENTITY": committed-epoch bookkeeping resets.
* auto-create from schema document ≈ ``topostgis`` create path
  (``postgis.py:90-100, 275-333``).
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schema as schema_mod

BUCKET_COL = "_bucket"
LSN_COL = "_lsn"
DELETED_COL = "_deleted"  # tombstone flag: deletes persist so a late replay of
# an older event for the key compares against the tombstone's LSN and cannot
# resurrect it (classic log-compaction semantics). compact(drop_tombstones=
# True) reclaims them once the replay horizon has passed.
SEQ_COL = "_seq"  # commit-order tiebreak for merge-on-read: rows written by a
# later commit win _lsn ties (mirrors the CoW merge's src_lsn >= tgt_lsn rule).
# Files from before this column existed read as NULL -> sorts below any commit.
_PART_COL = "_bucket_p"  # physical partition dir column (duplicated from _bucket)
_SYSTEM_COLS = (BUCKET_COL, LSN_COL, DELETED_COL, SEQ_COL)


class CommitConflict(Exception):
    """Another writer committed the same table version first (optimistic
    concurrency loser); re-read the table state and retry the operation."""


class LakeTable:
    """A versioned, hash-bucketed, copy-on-write parquet table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.manifest_dir = os.path.join(self.path, "_manifests")
        self.current_ptr = os.path.join(self.path, "_current")

    # ------------------------------------------------------------------ DDL

    def exists(self) -> bool:
        # table-existence check, ≈ W7 (oracle_sde.py:49-51 / postgis.py:90)
        return os.path.exists(self.current_ptr)

    def create(
        self,
        schema: T.StructType,
        key_col: str = "doc_id",
        n_buckets: int = 64,
        if_not_exists: bool = False,
        properties: dict[str, Any] | None = None,
        owner: str | None = None,
    ) -> "LakeTable":
        if self.exists():
            if if_not_exists:
                return self
            raise ValueError(f"lake table already exists at {self.path}")
        if key_col not in schema.fieldNames():
            raise ValueError(f"key column {key_col!r} not in schema")
        if owner is None:
            import getpass

            try:
                owner = getpass.getuser()
            except (KeyError, OSError):
                owner = "unknown"
        user_schema = T.StructType([f for f in schema.fields if f.name not in _SYSTEM_COLS])
        manifest = {
            "format_version": 1,
            "version": 0,
            "snapshot_id": uuid.uuid4().hex,
            "parent": None,
            "epoch_id": None,
            "committed_epochs": [],
            "key_col": key_col,
            "n_buckets": int(n_buckets),
            "schema": json.loads(user_schema.json()),
            "buckets": {},  # bucket id (str) -> list of data dirs
            "summary": {"total_rows": 0, "operation": "create"},
            "lineage": [],
            "properties": properties or {},
            "owner": owner,
            # informational grants surface (C6 tail): principal -> sorted ops.
            # The owner starts with ALL; see grant()/revoke()/privileges().
            "acl": {owner: ["ALL"]},
            "created_at": time.time(),
        }
        os.makedirs(self.manifest_dir, exist_ok=True)
        self._publish(manifest)
        return self

    @classmethod
    def create_from_schema_doc(
        cls, spark: SparkSession, path: str, doc: dict, n_buckets: int = 64
    ) -> "LakeTable":
        """Auto-create from a JSON schema document (S11/topostgis analog,
        postgis.py:275-333: reference does DROP+CREATE; here create-if-absent)."""
        schema = schema_mod.doc_to_schema(doc)
        key = (doc.get("primaryKey") or [schema.fields[0].name])[0]
        return cls(spark, path).create(schema, key_col=key, if_not_exists=True, n_buckets=n_buckets)

    # ----------------------------------------------------------- manifests

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_dir, f"manifest-{version:08d}.json")

    def _publish(self, manifest: dict) -> None:
        """Optimistic-concurrency commit: the manifest version file is
        created with O_EXCL — two writers racing to publish the same next
        version see exactly one winner; the loser gets CommitConflict and
        must re-read the table and retry its operation (same contract as
        Iceberg's atomic swap). The pointer swap after that is atomic."""
        # Commit-time stamp for timestamp time travel.  Clamped to the
        # parent's stamp so committed_at is monotone in version even across
        # a wall-clock step backwards (Iceberg snapshot-log semantics:
        # version_as_of picks max version with stamp <= ts, which requires
        # stamps ordered like versions).
        parent_at = 0.0
        try:
            parent_at = float(self.manifest().get("committed_at") or 0.0)
        except FileNotFoundError:
            pass  # first commit: no current pointer yet
        manifest["committed_at"] = max(time.time(), parent_at)
        mpath = self._manifest_path(manifest["version"])
        tmp = mpath + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            os.unlink(tmp)
            raise CommitConflict(
                f"version {manifest['version']} was committed concurrently at {self.path}"
            ) from None
        os.close(fd)
        os.replace(tmp, mpath)
        ptr_tmp = self.current_ptr + f".tmp-{uuid.uuid4().hex}"
        with open(ptr_tmp, "w") as fh:
            fh.write(os.path.basename(mpath))
        os.replace(ptr_tmp, self.current_ptr)  # atomic pointer swap = commit

    def manifest(self, version: int | None = None) -> dict:
        if version is None:
            with open(self.current_ptr) as fh:
                name = fh.read().strip()
            mpath = os.path.join(self.manifest_dir, name)
        else:
            mpath = self._manifest_path(version)
        with open(mpath) as fh:
            return json.load(fh)

    def version_as_of(self, ts: float) -> int:
        """Latest version committed at or before unix timestamp ``ts`` —
        Iceberg-style timestamp time travel, resolved against the retained
        manifest window (vacuum prunes old manifests, so travel reaches
        only what retention kept; a ts before the window raises)."""
        best = None
        # Clamp to the committed pointer: _publish writes the manifest file
        # BEFORE the atomic pointer swap that defines the commit point, so a
        # writer crashed (or observed) in between leaves a complete manifest
        # for a never-committed version.  Never resolve past the pointer.
        committed = self.manifest()["version"]
        for name in sorted(os.listdir(self.manifest_dir)):
            if not (name.startswith("manifest-") and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(self.manifest_dir, name)) as fh:
                    m = json.load(fh)
            except json.JSONDecodeError:
                continue  # in-flight concurrent commit
            if m["version"] > committed:
                continue  # manifest published but pointer swap never happened
            at = m.get("committed_at")
            if at is not None and at <= ts and (best is None or m["version"] > best):
                best = m["version"]
        if best is None:
            raise ValueError(
                f"no retained snapshot committed at or before ts={ts} "
                f"(vacuum may have pruned the window, or the table predates "
                f"commit timestamps)"
            )
        return best

    def history(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.startswith("manifest-") and name.endswith(".json"):
                try:
                    with open(os.path.join(self.manifest_dir, name)) as fh:
                        m = json.load(fh)
                except json.JSONDecodeError:
                    continue  # in-flight concurrent commit (O_EXCL placeholder)
                out.append(
                    {
                        "version": m["version"],
                        "snapshot_id": m["snapshot_id"],
                        "epoch_id": m.get("epoch_id"),
                        "operation": m["summary"].get("operation"),
                        "total_rows": m["summary"].get("total_rows"),
                        "committed_at": m.get("committed_at"),
                    }
                )
        return out

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.manifest()["schema"])

    def committed_epochs(self) -> set:
        return set(self.manifest().get("committed_epochs", []))

    @property
    def key_col(self) -> str:
        return self.manifest()["key_col"]

    # ---------------------------------------------------------------- reads

    def _read_schema(self, manifest: dict) -> T.StructType:
        base = T.StructType.fromJson(manifest["schema"])
        fields = list(base.fields)
        fields.append(T.StructField(BUCKET_COL, T.IntegerType(), True))
        fields.append(T.StructField(LSN_COL, T.LongType(), True))
        fields.append(T.StructField(DELETED_COL, T.BooleanType(), True))
        fields.append(T.StructField(SEQ_COL, T.LongType(), True))
        return T.StructType(fields)

    # ------------------------------------------------------- zone pruning

    _ZONE_PRED_RE = re.compile(
        r"^\s*(\w+)\s*(<=|>=|=|<|>)\s*('([^']*)'|-?\d+(?:\.\d+)?)\s*$"
    )
    _ZONE_LIT = r"(?:'[^']*'|-?\d+(?:\.\d+)?)"
    _ZONE_BETWEEN_RE = re.compile(
        rf"(?i)\b(\w+)\s+between\s+({_ZONE_LIT})\s+and\s+({_ZONE_LIT})"
    )
    _ZONE_IN_RE = re.compile(
        rf"^\s*(\w+)\s+in\s+\(\s*({_ZONE_LIT}(?:\s*,\s*{_ZONE_LIT})*)\s*\)\s*$",
        re.IGNORECASE,
    )

    @staticmethod
    def _zone_lit(raw: str) -> object:
        if raw.startswith("'"):
            return raw[1:-1]
        return float(raw) if "." in raw else int(raw)

    @classmethod
    def _parse_zone_preds(cls, where: str) -> list[tuple[str, str, object]] | None:
        """AND-conjunctions of ``col OP literal`` (OP in =,<,<=,>,>=),
        ``col BETWEEN a AND b`` (rewritten to the two range bounds before
        the AND split, so its inner AND doesn't confuse the conjunction
        parser), and ``col IN (v1, ...)`` (pruned against the value list's
        min/max envelope). Returns None for anything richer
        (OR/NOT/LIKE/IS NULL/functions/parens beyond the IN-list) —
        pruning then stays off and the full filter still runs in the
        plan."""
        where = cls._ZONE_BETWEEN_RE.sub(r"\1 >= \2 and \1 <= \3", where)
        in_parts: list[tuple[str, str, object]] = []
        rest_parts: list[str] = []
        for part in re.split(r"(?i)\band\b", where):
            mi = cls._ZONE_IN_RE.match(part)
            if mi:
                vals = [cls._zone_lit(v.strip()) for v in re.findall(cls._ZONE_LIT, mi.group(2))]
                if len({isinstance(v, str) for v in vals}) != 1:
                    return None  # mixed-type IN list: stay off
                # a zone overlapping [min(vals), max(vals)] MAY contain a
                # member; outside the envelope it provably cannot
                in_parts.append((mi.group(1), ">=", min(vals)))
                in_parts.append((mi.group(1), "<=", max(vals)))
            else:
                rest_parts.append(part)
        rest = " and ".join(rest_parts)
        if rest.strip() and re.search(r"(?i)\b(or|not|in|like|between|is|null)\b|[()]", rest):
            return None
        preds: list[tuple[str, str, object]] = list(in_parts)
        for part in rest_parts:
            if not part.strip():
                return None
            mt = cls._ZONE_PRED_RE.match(part)
            if not mt:
                return None
            col, op, raw, s = mt.group(1), mt.group(2), mt.group(3), mt.group(4)
            val: object = s if s is not None else (float(raw) if "." in raw else int(raw))
            preds.append((col, op, val))
        return preds or None

    @staticmethod
    def _zones_may_match(zones: dict, preds: list[tuple[str, str, object]]) -> bool:
        """False only when a predicate PROVABLY excludes the zone range
        (null-safe: parquet min/max ignore nulls, and null comparisons are
        UNKNOWN under every accepted operator, so a pruned dir can hold no
        qualifying row)."""
        for col, op, val in preds:
            z = zones.get(col)
            if not z:
                continue  # no stats for this column -> cannot prune on it
            lo, hi = z
            if isinstance(val, str) != isinstance(lo, str):
                continue  # type mismatch -> be conservative
            if (
                (op == "=" and (val < lo or val > hi))
                or (op == ">" and hi <= val)
                or (op == ">=" and hi < val)
                or (op == "<" and lo >= val)
                or (op == "<=" and lo > val)
            ):
                return False
        return True

    @staticmethod
    def _merge_zones(a: dict | None, b: dict | None) -> dict:
        """Union of two zone maps: common columns widen; a side with
        unknown zones (None) makes the union unknowable (empty)."""
        if a is None or b is None:
            return {}
        return {
            k: [min(a[k][0], b[k][0]), max(a[k][1], b[k][1])]
            for k in a.keys() & b.keys()
        }

    @staticmethod
    def _advance_watermark(m: dict, wstats: dict) -> int | None:
        """Monotone LSN high-water mark, advanced from the _lsn zone maps
        the writer just harvested — no extra jobs, never regresses (compact
        rewrites old data; its harvest can only confirm the mark)."""
        prev = m.get("lsn_watermark")
        vals = [
            s["zones"][LSN_COL][1]
            for s in wstats.values()
            if s.get("zones", {}).get(LSN_COL) is not None
        ]
        cur = int(max(vals)) if vals else None
        if prev is None:
            return cur
        if cur is None:
            return int(prev)
        return max(int(prev), cur)

    def _pruned_buckets(self, m: dict, where: str | None) -> set[str]:
        """Bucket keys that provably hold no row matching ``where`` (zone-map
        data skipping). A bucket carrying MoR deltas prunes only when BOTH
        its base zones AND its delta zones exclude the predicate — pruning
        is all-or-nothing per bucket, because dropping only one side before
        the read-time reduce could resurrect superseded state. Buckets whose
        delta dirs predate delta-zone tracking have unknown delta zones and
        never prune (conservative)."""
        if not where:
            return set()
        preds = self._parse_zone_preds(where)
        if not preds:
            return set()
        stats = m.get("bucket_stats") or {}
        deltas = m.get("deltas") or {}
        dstats = m.get("delta_stats") or {}
        out = set()
        for b in set(m["buckets"]) | set(deltas):
            base_zones = (stats.get(b) or {}).get("zones")
            base_misses = not m["buckets"].get(b) or (
                bool(base_zones) and not self._zones_may_match(base_zones, preds)
            )
            delta_zones = (dstats.get(b) or {}).get("zones")
            delta_misses = not deltas.get(b) or (
                bool(delta_zones) and not self._zones_may_match(delta_zones, preds)
            )
            if base_misses and delta_misses:
                out.add(b)
        return out

    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        fields: list[str] | None = None,
        where: str | None = None,
        limit: int | None = None,
        include_system: bool = False,
        as_of_ts: float | None = None,
    ) -> DataFrame:
        """Read a snapshot (time travel via ``version=`` or a unix
        timestamp ``as_of_ts=`` — resolved to the latest retained commit at
        or before it).

        Bucket pruning is manifest-level **file pruning**: only the data
        directories of requested buckets are scanned — the engine's own
        partition pruning, independent of (and additive to) parquet
        row-group stats on ``_bucket``. ``where=`` additionally applies
        **zone-map data skipping** at two granularities: per-bucket column
        min/max prune whole buckets a simple range/equality conjunction
        provably cannot match, and — on tables with no MoR deltas — per-DIR
        zones prune individual append-accumulated directories inside
        surviving buckets (the union range is wide, the dirs narrow). The
        filter itself always still runs — pruning only removes
        provably-empty scans.

        Merge-on-read: when the manifest carries delta dirs for the selected
        buckets, base and delta rows are unioned and reduced per key via
        ``max_by`` on (_lsn, _seq) — the read-time tax MoR trades for O(batch)
        writes; ``compact()`` folds deltas back into the base to reclaim it.
        """
        if as_of_ts is not None:
            if version is not None:
                raise ValueError("pass version= or as_of_ts=, not both")
            version = self.version_as_of(as_of_ts)
        m = self.manifest(version)
        skip = self._pruned_buckets(m, where)
        # per-DIR pruning within surviving buckets (Iceberg prunes per file
        # for the same reason): an append-heavy bucket's UNION zone range is
        # wide even when each dir is narrow. Only sound when the table holds
        # no MoR deltas — with deltas, the read-time reduce makes rows
        # interdependent (dropping a dir could change which version of a
        # key survives the max_by); without them rows are independent and a
        # dir whose zones provably miss contributes nothing to the filter.
        preds = (
            self._parse_zone_preds(where)
            if where and not m.get("deltas")
            else None
        )
        stats = m.get("bucket_stats") or {}
        dirs: list[str] = []
        for b, dlist in m["buckets"].items():
            if (buckets is None or int(b) in set(buckets)) and b not in skip:
                if preds:
                    dz = (stats.get(b) or {}).get("dirs") or {}
                    dirs.extend(
                        d
                        for d in dlist
                        if not (dz.get(d) and not self._zones_may_match(dz[d], preds))
                    )
                else:
                    dirs.extend(dlist)
        delta_dirs: list[str] = []
        for b, dlist in m.get("deltas", {}).items():
            # skip is all-or-nothing per bucket (base AND delta provably
            # miss), so dropping the delta dirs with the base is safe
            if (buckets is None or int(b) in set(buckets)) and b not in skip:
                delta_dirs.extend(dlist)
        read_schema = self._read_schema(m)
        if not dirs and not delta_dirs:
            df = self.spark.createDataFrame([], read_schema)
        else:
            df = self.spark.read.schema(read_schema).parquet(*dirs, *delta_dirs)
        if delta_dirs:
            df = _reduce_latest(df, m["key_col"])
        if not include_system:
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False))).drop(*_SYSTEM_COLS)
        if where:
            df = df.filter(F.expr(where))
        if fields:
            df = df.select(*fields)
        if limit is not None:
            df = df.limit(limit)
        return df

    def read_changes(
        self,
        since_version: int,
        to_version: int | None = None,
        on_bulk: str = "error",
    ) -> DataFrame:
        """Incremental changelog read (CDC-out, Iceberg-incremental-style):
        every key whose state changed after ``since_version``'s LSN
        watermark, as of ``to_version`` (default: current). Upserts surface
        as live rows, deletes as ``_deleted=True`` tombstones; columns =
        table schema + ``_lsn`` + ``_deleted``.

        Cost model: the ``_lsn`` zone maps prune every bucket whose maximum
        LSN is at or below the watermark, so an epoch that touched 3 of
        4096 buckets reads 3 buckets — the changelog is O(changed data),
        not O(table); a ``since_version`` predating the first merge yields
        the full CDC-derived state.

        **Changelog-retention contract** (enforced, not advisory):

        * History breaks — ``write(mode='overwrite')``, ``truncate()``, and
          ``compact(drop_tombstones=True)`` (which physically removes
          delete events) — advance ``changelog_min_version``; a
          ``since_version`` older than it RAISES, because an incremental
          read across the break would silently miss deletes or rewritten
          state. Consumers must resync from a full snapshot ``read()``.
          Operationally: drop tombstones only once every changelog
          consumer's checkpoint has passed them.
        * Bulk ``write(mode='append')`` commits load rows with no LSN,
          which the changelog can never surface. A read window spanning
          one raises by default so backfilled keys cannot be missed
          silently; pass ``on_bulk='ignore'`` to read the merge-only
          changes anyway (correct when the backfill is known disjoint
          from CDC keys, e.g. a separate source partition)."""
        if on_bulk not in ("error", "ignore"):
            raise ValueError(f"on_bulk must be 'error' or 'ignore', got {on_bulk!r}")
        m_to = self.manifest(to_version)
        min_v = m_to.get("changelog_min_version")
        if min_v is not None and since_version < int(min_v):
            op = m_to.get("changelog_min_reason", "a history-breaking commit")
            raise ValueError(
                f"changelog window since_version={since_version} predates "
                f"version {min_v} ({op}): incremental reads across it would "
                f"silently miss deletes or rewritten state. Resync from a "
                f"full snapshot read() and restart the changelog from "
                f"version {min_v} or later."
            )
        bulk = [
            int(v)
            for v in m_to.get("bulk_write_versions", [])
            if since_version < int(v) <= m_to["version"]
        ]
        if bulk and on_bulk == "error":
            raise ValueError(
                f"changelog window ({since_version}, {m_to['version']}] spans "
                f"bulk-append commit(s) at version(s) {bulk}: bulk-loaded rows "
                f"carry no LSN and never surface in the changelog, so a "
                f"consumer would silently miss the backfilled keys. Either "
                f"resync from a full snapshot read(), load backfills through "
                f"merge() with synthetic LSNs, or pass on_bulk='ignore' to "
                f"read the merge-only changes."
            )
        try:
            wm = self.manifest(since_version).get("lsn_watermark")
        except FileNotFoundError:
            raise ValueError(
                f"since_version={since_version} has been vacuumed out of the "
                f"retention window (oldest readable manifest governs "
                f"changelog resume points — keep vacuum's "
                f"keep_last_versions above the oldest consumer's lag). "
                f"Resync from a full snapshot read()."
            ) from None
        pred = None if wm is None else f"{LSN_COL} > {int(wm)}"
        skip = self._pruned_buckets(m_to, pred)
        all_b = set(m_to["buckets"]) | set(m_to.get("deltas") or {})
        keep = [int(b) for b in all_b if b not in skip]
        # passing the watermark predicate through read() additionally
        # engages per-DIR _lsn-zone pruning inside surviving buckets
        # (delta-free tables only — read() enforces that)
        df = self.read(version=to_version, buckets=keep, include_system=True, where=pred)
        if wm is None:
            df = df.filter(F.col(LSN_COL).isNotNull())
        return df.drop(BUCKET_COL, SEQ_COL)

    def iter_changes(
        self, since_version: int, on_bulk: str = "error"
    ):
        """Tail the changelog: yield ``(version, DataFrame, summary)`` for
        every commit after ``since_version`` that changed data, in commit
        order — the consumption loop a downstream CDC-out subscriber runs
        (each yielded frame is ``read_changes(v-1, v)``: that commit's
        delta only). Metadata-only commits (ACL changes) and
        watermark-neutral maintenance rewrites (compact/rebucket) yield
        nothing; every DATA commit — including bulk appends and history
        breaks — goes through :meth:`read_changes`, so the retention and
        ``on_bulk`` contracts raise here exactly as for a direct windowed
        read (a tailing consumer can never silently miss a backfill).
        Returns when caught up with the current version; callers poll by
        re-invoking from the last yielded version."""
        current = self.manifest()["version"]
        prev = since_version
        for v in range(since_version + 1, current + 1):
            try:
                m = self.manifest(v)
                wm_prev = self.manifest(prev).get("lsn_watermark")
            except FileNotFoundError:
                raise ValueError(
                    f"changelog tail from since_version={since_version} "
                    f"spans version(s) vacuumed out of the retention window "
                    f"(at or near v={v}); resync from a full snapshot "
                    f"read() and restart the tail from a retained version."
                ) from None
            op = m["summary"].get("operation")
            if op == "alter-acl":
                prev = v
                continue
            if op in ("compact", "rebucket") and m.get("lsn_watermark") == wm_prev:
                prev = v  # state-preserving rewrite: nothing past the watermark
                continue
            df = self.read_changes(prev, to_version=v, on_bulk=on_bulk)
            yield v, df, dict(m["summary"])
            prev = v

    def count(self) -> int:
        # metadata-only row count, ≈ A1 (oracle_sde.py:1084-1091) served from
        # the snapshot summary like Iceberg's total-records. After an MoR
        # merge the exact live count is unknown without the read-time reduce
        # (key overlap between base and delta is data-dependent), so the
        # summary stores None and the count falls back to one reduced scan —
        # the same "counts are exact only after compaction" economics as
        # Iceberg MoR.
        total = self.manifest()["summary"].get("total_rows", 0)
        if total is None:
            return self.read().count()
        return int(total)

    # --------------------------------------------------------------- writes

    def _bucket_expr(self, key_col: str, n_buckets: int):
        return F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets)).cast("int")

    def _snapshot_dir(self, version: int) -> str:
        # Unique per commit ATTEMPT, not per version: two writers racing to
        # version v each write their own data dir, so the O_EXCL manifest
        # check in _publish is the only arbiter — the loser's mode-overwrite
        # can never clobber the winner's just-written files. The manifest
        # stores explicit dir lists, so readers never guess the dir name;
        # vacuum() reclaims losers' orphans.
        return os.path.join(self.path, "data", f"snap-{version:08d}-{uuid.uuid4().hex[:8]}")

    def _write_snapshot_data(
        self, df: DataFrame, version: int, n_buckets: int
    ) -> tuple[dict[str, list[str]], dict[str, dict], int, int]:
        """Write df (already carrying _bucket and _lsn) into one dir per
        bucket under the snapshot dir; returns (bucket->dirs map,
        bucket->{rows,live} stats, total rows, total live).

        ``_bucket`` is duplicated into a partition-dir column so bucket
        separation is physical (file pruning) while the value also stays
        inside the files (row-group stats + no basePath gymnastics on read).
        """
        snapdir = self._snapshot_dir(version)
        out = df.withColumn(_PART_COL, F.col(BUCKET_COL))
        # One shuffle, keyed by bucket: co-locates each bucket's rows so each
        # bucket dir gets few files. Sorting within partitions by key gives
        # clustered files (better row-group pruning on key lookups).
        out = out.repartition(n_buckets, F.col(BUCKET_COL)).sortWithinPartitions(
            self.key_col if self.exists() else out.columns[0]
        )
        out.write.mode("overwrite").partitionBy(_PART_COL).parquet(snapdir)
        written: dict[str, list[str]] = {}
        for name in os.listdir(snapdir):
            if name.startswith(f"{_PART_COL}="):
                b = name.split("=", 1)[1]
                written[b] = [os.path.join(snapdir, name)]
        # Per-bucket row accounting from parquet FOOTERS plus a read of only
        # the tombstone-flag column (RLE booleans, ~KBs/file) — zero
        # data-page rescans of what was just written (previously this was a
        # full two-column readback job per commit; Iceberg keeps the same
        # stats in its manifests for the same reason). Small commits harvest
        # on the driver (no job-launch overhead); large commits fan the
        # footer reads out across executors so the commit path never
        # serializes O(files) metadata reads (see _harvest_stats).
        stats = self._harvest_stats(written)
        # each snapshot write produces exactly ONE dir per bucket, so the
        # bucket's harvested zones are also that dir's zones — recorded
        # per-dir for within-bucket pruning on append-accumulated buckets
        for b, dlist in written.items():
            stats[b]["dirs"] = {dlist[0]: stats[b]["zones"]}
        n_rows = sum(v["rows"] for v in stats.values())
        n_live = sum(v["live"] for v in stats.values())
        return written, stats, n_rows, n_live

    # distributed-harvest crossover: below this many files the driver loop
    # beats the fixed cost of one Spark job. Local-FS footer reads are
    # ~0.5 ms so the measured crossover here is ~2k files (the distributed
    # curve stays FLAT at ~1.2 s from 256 to 4096 files while serial grows
    # linearly — tools/bench_harvest.py); on an object store a footer is
    # 1-2 GETs (~20-80 ms) and the crossover drops to tens of files, so
    # the default splits the difference. Tunable per deployment.
    _HARVEST_DRIVER_MAX_FILES = 512

    @staticmethod
    def _file_stats(dirs: list[str]) -> dict:
        """(rows, live, zones) for a list of parquet dirs — the driver-serial
        reference harvest; see :func:`_stat_parquet_file` for the per-file
        extraction and :func:`_combine_file_stats` for the (order-
        independent) merge. Kept as the small-commit path and the equality
        reference for the distributed harvest."""
        files = []
        for d in dirs:
            for fn in sorted(os.listdir(d)):
                if not fn.startswith((".", "_")) and fn.endswith(".parquet"):
                    files.append(os.path.join(d, fn))
        return _combine_file_stats([_stat_parquet_file(p) for p in files])

    def _harvest_stats(self, written: dict[str, list[str]]) -> dict[str, dict]:
        """Bucket → (rows, live, zones) for a just-written snapshot.

        The footer reads are the commit path's only O(files) work; at real
        epoch sizes (10³–10⁴ files across thousands of buckets) a serial
        driver loop would serialize that into every commit. Above
        ``_HARVEST_DRIVER_MAX_FILES`` the per-file extraction fans out as
        one tiny Spark job over the file list (executors read footers in
        parallel, return one small stats dict per file — manifest-style
        metadata, never data), and only the per-bucket combine runs on the
        driver. The combine is order-independent (sums + min/max widening +
        no-stats-column union), so both paths are byte-identical — asserted
        by ``tests/test_zone_maps.py``."""
        pairs: list[tuple[str, str]] = []
        for b, dirs in written.items():
            for d in dirs:
                for fn in sorted(os.listdir(d)):
                    if not fn.startswith((".", "_")) and fn.endswith(".parquet"):
                        pairs.append((b, os.path.join(d, fn)))
        if len(pairs) <= self._HARVEST_DRIVER_MAX_FILES:
            per_file = [(b, _stat_parquet_file(p)) for b, p in pairs]
        else:
            sc = self.spark.sparkContext
            n_slices = max(1, min(len(pairs) // 8, sc.defaultParallelism * 4))
            per_file = (
                sc.parallelize(pairs, n_slices)
                .map(lambda bp: (bp[0], _stat_parquet_file(bp[1])))
                .collect()
            )
        grouped: dict[str, list[dict]] = {b: [] for b in written}
        for b, st in per_file:
            grouped[b].append(st)
        return {b: _combine_file_stats(sts) for b, sts in grouped.items()}

    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        epoch_id: Any | None = None,
        fail_on_empty: bool = False,
        lineage: list[dict] | None = None,
    ) -> dict:
        """Full refresh (``overwrite`` ≈ truncate+load) or blind ``append``."""
        if not self.exists():
            raise ValueError(
                f"no lake table at {self.path}; create() it first "
                "(reference refuses auto-create on SDE too, oracle_sde.py:55-57)"
            )
        if fail_on_empty and df.isEmpty():
            # empty-input write guard, W6 (oracle_sde.py:840-846)
            raise ValueError("refusing to write empty input (fail_on_empty=True)")
        m = self.manifest()
        new_schema = schema_mod.evolve_schema(self.schema(), _user_schema(df))
        # A caller-provided _lsn survives the conform: an LSN-carrying
        # append (backfill loaded with synthetic LSNs) advances the
        # watermark and surfaces in the changelog like merged rows do, so
        # it is NOT recorded as a bulk-blind version below. Other system
        # columns are always re-derived.
        lsn_synthesized = LSN_COL not in df.columns
        if not lsn_synthesized:
            df = df.select(
                *[c for c in df.columns if c not in _SYSTEM_COLS],
                F.col(LSN_COL).cast("long").alias(LSN_COL),
            )
        df = _conform(df, new_schema, keep_system=not lsn_synthesized)
        if not lsn_synthesized and mode == "append":
            # Guard (advisor r6): an LSN-carrying append is exempted from the
            # bulk-blind marker below ONLY because its rows surface in
            # read_changes — which filters _lsn > watermark. Null LSNs or
            # LSNs at/below the current watermark would be silently invisible
            # to every changelog window while the version looks complete, so
            # refuse them loudly before any data is written.
            wm = m.get("lsn_watermark")
            chk = df.agg(
                F.count(F.when(F.col(LSN_COL).isNull(), 1)).alias("n_null"),
                F.min(LSN_COL).alias("mn"),
            ).collect()[0]
            if chk["n_null"]:
                raise ValueError(
                    f"append with _lsn: {chk['n_null']} null-_lsn row(s) would never "
                    "surface in read_changes; supply non-null LSNs or drop the _lsn "
                    "column (the version is then recorded bulk-blind)"
                )
            if wm is not None and chk["mn"] is not None and int(chk["mn"]) <= int(wm):
                raise ValueError(
                    f"append with _lsn: min(_lsn)={chk['mn']} <= lsn_watermark={wm}; "
                    "read_changes filters _lsn > watermark, so these rows would be "
                    "invisible to every changelog window. Supply LSNs above the "
                    "watermark or drop the _lsn column"
                )
        n_buckets = m["n_buckets"]
        key = m["key_col"]
        staged = df.withColumn(BUCKET_COL, self._bucket_expr(key, n_buckets))
        if lsn_synthesized:
            staged = staged.withColumn(LSN_COL, F.lit(None).cast("long"))
        staged = staged.withColumn(DELETED_COL, F.lit(False))
        version = m["version"] + 1
        written, wstats, n_new, _live_new = self._write_snapshot_data(staged, version, n_buckets)

        if mode == "overwrite":
            buckets = written
            bucket_stats = wstats
            total = n_new
            deltas = {}  # full refresh folds/discards all MoR deltas
            delta_stats = {}
        elif mode == "append":
            buckets = {k: list(v) for k, v in m["buckets"].items()}
            bucket_stats = {k: dict(v) for k, v in m.get("bucket_stats", {}).items()}
            for b, dlist in written.items():
                had_prior = bool(buckets.get(b))
                buckets.setdefault(b, []).extend(dlist)
                bs = bucket_stats.setdefault(b, {"rows": 0, "live": 0})
                bs["rows"] += wstats[b]["rows"]
                bs["live"] += wstats[b]["live"]
                # zone maps widen under append; prior dirs with UNKNOWN
                # zones poison the union (old manifests) -> drop, no pruning
                nz = wstats[b].get("zones", {})
                bs["zones"] = (
                    self._merge_zones(bs.get("zones"), nz) if had_prior else nz
                )
                # per-dir zones don't widen — each appended dir keeps its
                # own (that's the point: the union is wide, the dirs narrow)
                dmap = dict(bs.get("dirs") or {})
                dmap.update(wstats[b].get("dirs") or {})
                bs["dirs"] = dmap
            deltas = {k: list(v) for k, v in m.get("deltas", {}).items()}
            delta_stats = {k: dict(v) for k, v in m.get("delta_stats", {}).items()}
            prev_total = m["summary"].get("total_rows", 0)
            total = None if prev_total is None else prev_total + n_new
        else:
            raise ValueError(f"unknown write mode {mode!r}")

        new_m = dict(m)
        # changelog-retention bookkeeping (see read_changes): an overwrite
        # breaks incremental history entirely; an append adds LSN-less rows
        # the changelog can never surface — record which, so read_changes
        # can refuse to be silently wrong
        if mode == "overwrite":
            new_m["changelog_min_version"] = version
            new_m["changelog_min_reason"] = "write(mode='overwrite') full refresh"
        elif lsn_synthesized:
            # Only LSN-less appends are invisible to the changelog.  When the
            # caller's DataFrame already carries _lsn the appended rows DO
            # surface in read_changes (and advance the watermark), so marking
            # the version bulk would raise a false-positive on a window that
            # is actually complete.
            new_m["bulk_write_versions"] = sorted(
                set(int(v) for v in m.get("bulk_write_versions", [])) | {version}
            )
        new_m.update(
            version=version,
            snapshot_id=uuid.uuid4().hex,
            parent=m["snapshot_id"],
            epoch_id=epoch_id,
            committed_epochs=_merge_epochs(m.get("committed_epochs", []), epoch_id),
            schema=json.loads(new_schema.json()),
            buckets=buckets,
            deltas=deltas,
            delta_stats=delta_stats,
            bucket_stats=bucket_stats,
            lsn_watermark=self._advance_watermark(m, wstats),
            summary={"total_rows": total, "operation": mode, "rows_written": n_new},
            lineage=(lineage or []),
        )
        self._publish(new_m)
        return new_m["summary"]

    def truncate(self) -> None:
        """W1: full-refresh reset including 'RESTART IDENTITY' — the
        committed-epoch bookkeeping resets with the data."""
        m = self.manifest()
        new_m = dict(m)
        new_m.update(
            version=m["version"] + 1,
            snapshot_id=uuid.uuid4().hex,
            parent=m["snapshot_id"],
            epoch_id=None,
            committed_epochs=[],
            buckets={},
            deltas={},
            delta_stats={},
            bucket_stats={},
            lsn_watermark=None,
            changelog_min_version=m["version"] + 1,
            changelog_min_reason="truncate()",
            summary={"total_rows": 0, "operation": "truncate"},
            lineage=[],
        )
        self._publish(new_m)

    # ---------------------------------------------------------------- MERGE

    def merge(
        self,
        changes: DataFrame,
        epoch_id: Any,
        lsn_col: str = "lsn",
        op_col: str = "op",
        assume_deduped: bool = False,
        lineage: list[dict] | None = None,
        strategy: str | None = None,
    ) -> dict:
        """Apply a CDC change batch as an idempotent key-partitioned MERGE.

        Semantics (north rule): LSN-ordered per-key dedup, then upsert
        (op I/U) or delete (op D) against current state; a source row older
        than the target row's ``_lsn`` never regresses state, so replaying
        any suffix of history is a no-op — combined with epoch-id skip this
        is the exactly-once contract.

        ``strategy``: 'cow' (default) rewrites affected buckets — right when
        epochs touch few buckets. 'mor' (merge-on-read) appends the deduped
        batch as per-bucket DELTA files with a commit-sequence tiebreak and
        defers reconciliation to read time / compaction — right for the
        uniform-key big-epoch regime where CoW would rewrite the full table
        every epoch. Defaults to the table property ``write.merge-mode``.
        Both strategies produce identical logical state (LSN-last-wins with
        later-commit tiebreak on equal LSNs, tombstoned deletes).
        """
        if not self.exists():
            raise ValueError(f"no lake table at {self.path}")
        _t0 = time.time()
        m = self.manifest()
        if epoch_id is not None and epoch_id in set(m.get("committed_epochs", [])):
            return {"operation": "skip", "reason": "epoch already committed", "epoch_id": epoch_id}
        mode = strategy or m.get("properties", {}).get("write.merge-mode", "cow")
        if mode not in ("cow", "mor"):
            raise ValueError(f"unknown merge strategy {mode!r}")

        key = m["key_col"]
        n_buckets = m["n_buckets"]

        if not assume_deduped:
            from ..operators.dedup_cdc import latest_per_key

            changes = latest_per_key(changes, key_col=key, lsn_col=lsn_col, op_col=op_col)

        payload_cols = [c for c in changes.columns if c not in (op_col, lsn_col, "commit_ts", "epoch")]
        incoming_schema = T.StructType([f for f in changes.schema.fields if f.name in payload_cols])
        new_schema = schema_mod.evolve_schema(self.schema(), incoming_schema)

        if mode == "mor":
            return self._merge_mor(changes, epoch_id, m, new_schema, lsn_col, op_col, lineage, _t0)

        src = changes.withColumn(BUCKET_COL, self._bucket_expr(key, n_buckets))
        src = src.withColumn(LSN_COL, F.col(lsn_col).cast("long"))
        # The deduped batch is consumed twice (affected-bucket discovery +
        # the MERGE join). Persisting it avoids re-running the upstream
        # dedup aggregation over the raw batch — the deduped set is at most
        # one row per key, far smaller than the batch.
        src = src.persist()

        # Affected-bucket pruning: only buckets containing changed keys are
        # read and rewritten. The distinct-bucket list is tiny (≤ n_buckets
        # ints) — the one deliberate collect in the merge path.
        affected = [r[0] for r in src.select(BUCKET_COL).distinct().collect()]
        _t_dedup = time.time()
        target = self.read(buckets=affected, include_system=True)
        target = _conform(target, new_schema, keep_system=True)

        data_cols = [f.name for f in new_schema.fields]
        src_sel = src.select(
            *[
                (
                    F.col(f.name).cast(f.dataType) if f.name in src.columns else F.lit(None).cast(f.dataType)
                ).alias(f"_src_{f.name}")
                for f in new_schema.fields
            ],
            F.col(BUCKET_COL).alias(f"_src_{BUCKET_COL}"),
            F.col(LSN_COL).alias(f"_src_{LSN_COL}"),
            F.col(op_col).alias("_src_op"),
        )

        # Key-partitioned full-outer MERGE: both sides shuffle on the key;
        # AQE skew-join splits any residual hot partitions (source side is
        # already deduped to unique keys, so skew lives in the target only
        # if key distribution is pathological).
        joined = target.join(src_sel, target[key] == src_sel[f"_src_{key}"], "full_outer")

        src_present = F.col(f"_src_{key}").isNotNull()
        tgt_present = F.col(key).isNotNull()
        src_newer = src_present & (
            ~tgt_present | F.col(LSN_COL).isNull() | (F.col(f"_src_{LSN_COL}") >= F.col(LSN_COL))
        )

        # Deletes become tombstones (not row removal): a later replay of an
        # older upsert for the key sees the tombstone's _lsn and loses.
        resolved = joined.select(
            *[
                F.when(src_newer, F.col(f"_src_{c}")).otherwise(F.col(c)).alias(c)
                for c in data_cols
            ],
            F.when(src_newer, F.col(f"_src_{BUCKET_COL}")).otherwise(F.col(BUCKET_COL)).alias(BUCKET_COL),
            F.when(src_newer, F.col(f"_src_{LSN_COL}")).otherwise(F.col(LSN_COL)).alias(LSN_COL),
            F.when(src_newer, F.col("_src_op") == "D")
            .otherwise(F.coalesce(F.col(DELETED_COL), F.lit(False)))
            .alias(DELETED_COL),
        )

        version = m["version"] + 1
        written, wstats, n_affected_rows, n_affected_live = self._write_snapshot_data(resolved, version, n_buckets)
        _t_write = time.time()

        buckets = {k: list(v) for k, v in m["buckets"].items() if int(k) not in set(affected)}
        buckets.update(written)  # carry forward untouched buckets, swap affected
        # a key's delta rows share its bucket, so rewriting a bucket FOLDS its
        # deltas (the target read above already reduced them in); drop them
        # and their zone stats
        deltas = {k: list(v) for k, v in m.get("deltas", {}).items() if int(k) not in set(affected)}
        delta_stats = {
            k: dict(v) for k, v in m.get("delta_stats", {}).items() if k in deltas
        }

        # incremental live-row accounting from manifest bucket stats — no
        # scan of historical data (fallback scan only for pre-stats tables)
        prev_stats = m.get("bucket_stats")
        if prev_stats is None:
            prev_stats = self._recompute_bucket_stats(m)
        bucket_stats = {k: dict(v) for k, v in prev_stats.items() if int(k) not in set(affected)}
        bucket_stats.update(wstats)
        # with unfolded deltas on other buckets the exact live total is
        # data-dependent (key overlap) — leave it unknown until compaction
        total = sum(v["live"] for v in bucket_stats.values()) if not deltas else None

        new_m = dict(m)
        new_m.update(
            version=version,
            snapshot_id=uuid.uuid4().hex,
            parent=m["snapshot_id"],
            epoch_id=epoch_id,
            committed_epochs=_merge_epochs(m.get("committed_epochs", []), epoch_id),
            schema=json.loads(new_schema.json()),
            buckets=buckets,
            deltas=deltas,
            delta_stats=delta_stats,
            bucket_stats=bucket_stats,
            lsn_watermark=self._advance_watermark(m, wstats),
            summary={
                "operation": "merge",
                "total_rows": total,
                "rows_written": n_affected_rows,
                "live_rows_written": n_affected_live,
                "buckets_affected": len(affected),
                "epoch_id": epoch_id,
                "merge_phase_sec": {
                    "dedup_and_bucket_discovery": round(_t_dedup - _t0, 2),
                    "join_and_write": round(_t_write - _t_dedup, 2),
                    "count_bookkeeping": round(time.time() - _t_write, 2),
                },
            },
            lineage=(lineage or []),
        )
        src.unpersist()
        self._publish(new_m)
        return new_m["summary"]

    def _merge_mor(
        self,
        changes: DataFrame,
        epoch_id: Any,
        m: dict,
        new_schema: T.StructType,
        lsn_col: str,
        op_col: str,
        lineage: list[dict] | None,
        _t0: float,
    ) -> dict:
        """Merge-on-read apply: write the deduped batch as per-bucket delta
        files — O(batch) work regardless of how many buckets the keys touch,
        no target read, no join. Deletes become tombstone delta rows; the
        read-time ``max_by(_lsn, _seq)`` reduce makes LSN-last-wins hold and
        replayed old events lose exactly as in the CoW join."""
        key = m["key_col"]
        n_buckets = m["n_buckets"]
        version = m["version"] + 1
        src = changes.withColumn(LSN_COL, F.col(lsn_col).cast("long")).withColumn(
            DELETED_COL, F.col(op_col) == "D"
        )
        staged = (
            _conform(src, new_schema, keep_system=True)
            .withColumn(BUCKET_COL, self._bucket_expr(key, n_buckets))
            .withColumn(SEQ_COL, F.lit(version).cast("long"))
        )
        written, wstats, n_rows, n_live = self._write_snapshot_data(staged, version, n_buckets)
        _t_write = time.time()

        deltas = {k: list(v) for k, v in m.get("deltas", {}).items()}
        # delta zone maps widen across delta commits exactly like append's
        # base zones; a bucket whose existing deltas predate delta_stats
        # tracking has unknown zones, and _merge_zones(None, x) poisons the
        # union to {} so it can never prune
        delta_stats = {k: dict(v) for k, v in m.get("delta_stats", {}).items()}
        for b, dlist in written.items():
            had_prior = bool(deltas.get(b))
            deltas.setdefault(b, []).extend(dlist)
            nz = wstats[b].get("zones", {})
            if had_prior:
                prior = (delta_stats.get(b) or {}).get("zones")
                delta_stats[b] = {"zones": self._merge_zones(prior, nz)}
            else:
                delta_stats[b] = {"zones": nz}

        new_m = dict(m)
        new_m.update(
            version=version,
            snapshot_id=uuid.uuid4().hex,
            parent=m["snapshot_id"],
            epoch_id=epoch_id,
            committed_epochs=_merge_epochs(m.get("committed_epochs", []), epoch_id),
            schema=json.loads(new_schema.json()),
            deltas=deltas,
            delta_stats=delta_stats,
            lsn_watermark=self._advance_watermark(m, wstats),
            summary={
                "operation": "merge",
                "mode": "mor",
                "total_rows": None,  # exact only after compaction (see count())
                "rows_written": n_rows,
                "live_rows_written": n_live,
                "buckets_affected": len(written),
                "delta_dirs": sum(len(v) for v in deltas.values()),
                "epoch_id": epoch_id,
                "merge_phase_sec": {
                    "dedup_and_delta_write": round(_t_write - _t0, 2),
                    "count_bookkeeping": round(time.time() - _t_write, 2),
                },
            },
            lineage=(lineage or []),
        )
        self._publish(new_m)
        return new_m["summary"]

    def vacuum(self, keep_last_versions: int = 1) -> dict:
        """Delete snapshot data directories not referenced by the last
        ``keep_last_versions`` manifests (and drop the older manifests).
        Reclaims copy-on-write garbage + orphans from crashed commits.
        Time travel remains possible only within the kept window."""
        import shutil

        current = self.manifest()
        keep_versions = set(range(max(current["version"] - keep_last_versions + 1, 0), current["version"] + 1))
        referenced: set[str] = set()
        kept_manifests: set[str] = set()
        for v in keep_versions:
            try:
                m = self.manifest(v)
            except FileNotFoundError:
                continue
            kept_manifests.add(os.path.basename(self._manifest_path(v)))
            for dl in m["buckets"].values():
                referenced.update(os.path.normpath(d) for d in dl)
            for dl in m.get("deltas", {}).values():  # MoR delta dirs are live too
                referenced.update(os.path.normpath(d) for d in dl)

        removed_dirs = 0
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for snap in sorted(os.listdir(data_root)):
                snapdir = os.path.join(data_root, snap)
                if not os.path.isdir(snapdir):
                    continue
                live = [
                    d for d in os.listdir(snapdir)
                    if os.path.normpath(os.path.join(snapdir, d)) in referenced
                ]
                if not live:
                    shutil.rmtree(snapdir)
                    removed_dirs += 1
                else:
                    for d in os.listdir(snapdir):
                        full = os.path.normpath(os.path.join(snapdir, d))
                        if full not in referenced and os.path.isdir(full):
                            shutil.rmtree(full)
                            removed_dirs += 1
        removed_manifests = 0
        for name in os.listdir(self.manifest_dir):
            if name.startswith("manifest-") and name not in kept_manifests:
                os.unlink(os.path.join(self.manifest_dir, name))
                removed_manifests += 1
        return {"removed_data_dirs": removed_dirs, "removed_manifests": removed_manifests}

    def _recompute_bucket_stats(self, m: dict) -> dict[str, dict]:
        """Full-scan fallback for manifests written before bucket_stats
        existed (only the _bucket/_deleted columns are read)."""
        dirs = [d for dl in m["buckets"].values() for d in dl]
        if not dirs:
            return {}
        rows = (
            self.spark.read.schema(self._read_schema(m))
            .parquet(*dirs)
            .groupBy(BUCKET_COL)
            .agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.coalesce(F.col(DELETED_COL), F.lit(False)), 0).otherwise(1)).alias("live"),
            )
            .collect()
        )
        return {str(r[BUCKET_COL]): {"rows": int(r["n"]), "live": int(r["live"] or 0)} for r in rows}

    # ------------------------------------------------------------ utilities

    _VALID_OPS = ("ALL", "SELECT", "INSERT", "UPDATE", "DELETE")

    def grant(self, principal: str, ops: list[str] | str) -> dict:
        """Record privileges for ``principal`` (informational grants surface,
        C6 tail — mirrors the reference's privileges introspection,
        ``oracle_sde.py:784-799``, which likewise surfaces rather than
        enforces: enforcement lives in the storage/catalog layer, not the
        engine). The ACL change is a metadata-only commit: a new manifest
        version with the same data, so grants are versioned and replay-safe
        like every other table mutation."""
        ops = [ops] if isinstance(ops, str) else list(ops)
        bad = [o for o in ops if o.upper() not in self._VALID_OPS]
        if bad:
            raise ValueError(f"unknown ops {bad!r} (valid: {self._VALID_OPS})")
        m = self.manifest()
        acl = {k: list(v) for k, v in m.get("acl", {}).items()}
        merged = set(acl.get(principal, [])) | {o.upper() for o in ops}
        acl[principal] = sorted(merged if "ALL" not in merged else {"ALL"})
        return self._publish_acl(m, acl, f"grant {ops} to {principal}")

    def revoke(self, principal: str, ops: list[str] | str | None = None) -> dict:
        """Remove privileges (all of them when ``ops`` is None). Revoking
        from the owner is allowed but the ownership fact itself persists."""
        m = self.manifest()
        acl = {k: list(v) for k, v in m.get("acl", {}).items()}
        if principal not in acl:
            return {"operation": "alter-acl", "noop": True}
        if ops is None:
            del acl[principal]
        else:
            ops = [ops] if isinstance(ops, str) else list(ops)
            requested = {o.upper() for o in ops}
            held = set(acl[principal])
            if "ALL" in requested:
                del acl[principal]
            else:
                if "ALL" in held:
                    # partial revoke from an ALL holder must NARROW: expand
                    # ALL to the concrete op list first, then subtract
                    held = set(self._VALID_OPS) - {"ALL"}
                remaining = held - requested
                if remaining:
                    acl[principal] = sorted(remaining)
                else:
                    del acl[principal]
        return self._publish_acl(m, acl, f"revoke {ops or 'ALL'} from {principal}")

    def _publish_acl(self, m: dict, acl: dict, note: str) -> dict:
        new_m = dict(m)
        new_m.update(
            version=m["version"] + 1,
            snapshot_id=uuid.uuid4().hex,
            parent=m["snapshot_id"],
            acl=acl,
            summary={"operation": "alter-acl", "note": note,
                     "total_rows": m["summary"].get("total_rows")},
        )
        self._publish(new_m)
        return new_m["summary"]

    def privileges(self) -> dict:
        """{principal: [ops]} — the grants surface (informational)."""
        return {k: list(v) for k, v in self.manifest().get("acl", {}).items()}

    def describe(self) -> dict:
        """Informational layout/stats surface (C6 analog: the reference
        exposes ``indexes``/``privileges``, ``oracle_sde.py:784-824``; here
        the physical-design facts are the bucket layout and sort order, and
        the access facts are owner + ACL)."""
        m = self.manifest()
        stats = m.get("bucket_stats") or {}
        return {
            "path": self.path,
            "version": m["version"],
            "snapshot_id": m["snapshot_id"],
            "key_col": m["key_col"],
            "columns": [f["name"] for f in m["schema"]["fields"]],
            "layout": {
                "type": "hash-bucket copy-on-write",
                "bucket_expr": f"pmod(xxhash64(cast({m['key_col']} as string)), {m['n_buckets']})",
                "n_buckets": m["n_buckets"],
                "sort_within_buckets": m["key_col"],
            },
            "buckets_populated": len(m["buckets"]),
            "data_dirs": sum(len(v) for v in m["buckets"].values()),
            "delta_dirs": sum(len(v) for v in m.get("deltas", {}).values()),
            "total_rows": m["summary"].get("total_rows", 0),
            "tombstones": sum(v["rows"] - v["live"] for v in stats.values()) if stats else None,
            "committed_epochs": len(m.get("committed_epochs", [])),
            # the CDC-out surface a changelog consumer plans against
            "changelog": {
                "lsn_watermark": m.get("lsn_watermark"),
                "min_version": m.get("changelog_min_version"),
                "min_reason": m.get("changelog_min_reason"),
                "bulk_write_versions": list(m.get("bulk_write_versions", [])),
            },
            "properties": m.get("properties", {}),
            "owner": m.get("owner"),
            "privileges": {k: list(v) for k, v in m.get("acl", {}).items()},
        }

    def checksum(self) -> int:
        """Order-independent state checksum: sum of xxhash64 over every row's
        canonical (key, payload) encoding — the 'byte-identical replay'
        equality check from the north rule."""
        df = self.read()
        cols = [F.col(c).cast("string") for c in sorted(df.columns)]
        return (
            df.select(F.xxhash64(*cols).alias("h"))
            .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("s"))
            .collect()[0]["s"]
            or 0
        )

    def rebucket(self, n_buckets: int) -> dict:
        """Bucket-count evolution (≈ Iceberg partition-spec evolution): at
        10^10 rows the create-time bucket count is wrong by definition —
        CoW rewrite cost per epoch is O(table/n_buckets · touched buckets),
        so the count must grow with the table. One full rewrite under the
        new ``pmod(xxhash64(key), n)`` layout; logical state (and therefore
        ``checksum()``) is unchanged, all zone/dir stats are rebuilt for
        the new layout, and subsequent merges route by the new count.
        Run it like compaction: between epochs, versioned, replay-safe."""
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        m = self.manifest()
        df = self.read(include_system=True).drop(BUCKET_COL)
        df = df.withColumn(BUCKET_COL, self._bucket_expr(m["key_col"], n_buckets))
        version = m["version"] + 1
        written, wstats, n, n_live = self._write_snapshot_data(df, version, n_buckets)
        new_m = dict(m)
        new_m.update(
            version=version,
            snapshot_id=uuid.uuid4().hex,
            parent=m["snapshot_id"],
            n_buckets=int(n_buckets),
            buckets=written,
            deltas={},  # the read above reduced any deltas into the rewrite
            delta_stats={},
            bucket_stats=wstats,
            lsn_watermark=self._advance_watermark(m, wstats),
            summary={
                "operation": "rebucket",
                "total_rows": n_live,
                "rows_written": n,
                "n_buckets": int(n_buckets),
            },
        )
        self._publish(new_m)
        return new_m["summary"]

    def compact(self, drop_tombstones: bool = False) -> dict:
        """Rewrite every bucket's dirs into one snapshot (small-file cleanup).

        ``drop_tombstones=True`` also reclaims delete tombstones — only safe
        once (a) no replay older than the tombstones' LSNs can arrive (the
        checkpoint horizon has passed them), AND (b) no changelog consumer's
        ``since_version`` predates the deletes, since the delete events are
        physically removed. (b) is enforced: the commit advances
        ``changelog_min_version``, so a stale ``read_changes`` raises
        instead of silently losing deletes — tombstones must outlive the
        oldest ``since_version`` consumers may still use."""
        m = self.manifest()
        df = self.read(include_system=True)
        if drop_tombstones:
            df = df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        version = m["version"] + 1
        written, wstats, n, n_live = self._write_snapshot_data(df, version, m["n_buckets"])
        new_m = dict(m)
        if drop_tombstones:
            new_m["changelog_min_version"] = version
            new_m["changelog_min_reason"] = "compact(drop_tombstones=True) removed delete events"
        new_m.update(
            version=version,
            snapshot_id=uuid.uuid4().hex,
            parent=m["snapshot_id"],
            buckets=written,
            deltas={},  # the read above reduced deltas into the rewrite
            delta_stats={},
            bucket_stats=wstats,
            lsn_watermark=self._advance_watermark(m, wstats),
            summary={"operation": "compact", "total_rows": n_live, "rows_written": n},
        )
        self._publish(new_m)
        return new_m["summary"]


def _stat_parquet_file(path: str) -> dict:
    """Footer stats for ONE parquet file: row count from metadata, delete
    count from a read of only the ``_deleted`` column (RLE booleans,
    ~KBs/file), and per-column zone min/max over every row group for scalar
    int/float/bool/string columns. Columns with missing/unusable statistics
    are returned in ``nostat`` so the combiner can drop them table-wide
    (conservative: no pruning on them). Module-level + self-contained so it
    ships cleanly to executors for the distributed harvest."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    rows = md.num_rows
    deleted = 0
    zones: dict[str, list] = {}
    nostat: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name or name in nostat or (
                name.startswith("_") and name != LSN_COL
            ):
                # nested / system / known-unusable (the _lsn zone stays:
                # it drives changelog bucket pruning)
                continue
            st = col.statistics
            ok = (
                st is not None
                and st.has_min_max
                and isinstance(st.min, (int, float, str, bool))
                and isinstance(st.max, (int, float, str, bool))
            )
            if not ok:
                nostat.add(name)
                zones.pop(name, None)
                continue
            z = zones.get(name)
            if z is None:
                zones[name] = [st.min, st.max]
            else:
                z[0] = min(z[0], st.min)
                z[1] = max(z[1], st.max)
    if rows and DELETED_COL in pf.schema_arrow.names:
        col = pf.read(columns=[DELETED_COL]).column(DELETED_COL)
        deleted = int(pc.sum(pc.cast(pc.fill_null(col, False), "int64")).as_py() or 0)
    return {"rows": rows, "deleted": deleted, "zones": zones, "nostat": sorted(nostat)}


def _combine_file_stats(file_stats: list[dict]) -> dict:
    """Merge per-file stats into the bucket-level manifest entry. Order-
    independent by construction: row/delete counts sum, zone ranges widen
    via min/max, and any column lacking stats in ANY file is dropped
    (a column absent from a file's SCHEMA entirely is fine — its rows read
    as NULL there, and NULL comparisons are UNKNOWN under every pruning
    operator, so the other files' range remains a safe bound)."""
    rows = sum(s["rows"] for s in file_stats)
    deleted = sum(s["deleted"] for s in file_stats)
    dead: set[str] = set()
    for s in file_stats:
        dead.update(s["nostat"])
    zones: dict[str, list] = {}
    for s in file_stats:
        for name, (lo, hi) in s["zones"].items():
            if name in dead:
                continue
            z = zones.get(name)
            if z is None:
                zones[name] = [lo, hi]
            else:
                z[0] = min(z[0], lo)
                z[1] = max(z[1], hi)
    return {"rows": rows, "live": rows - deleted, "zones": zones}


def _reduce_latest(df: DataFrame, key: str) -> DataFrame:
    """Merge-on-read reconciliation: one row per key — the max of
    (_lsn, _seq), so the highest LSN wins and, on equal LSNs, the later
    commit (exactly the CoW join's ``src_lsn >= tgt_lsn`` rule). NULL _lsn
    (plain writes) and NULL _seq (pre-MoR files) sort below everything.
    Compiles to a partial+final max_by aggregation — map-side combinable,
    no window sort, same skew profile as the CDC dedup."""
    order = F.struct(
        F.coalesce(F.col(LSN_COL), F.lit(-(1 << 62)).cast("long")).alias("l"),
        F.coalesce(F.col(SEQ_COL), F.lit(-1).cast("long")).alias("s"),
    )
    row = F.max_by(F.struct(*[F.col(c) for c in df.columns]), order)
    return df.groupBy(key).agg(row.alias("_row")).select("_row.*")


def _merge_epochs(old: list, epoch_id) -> list:
    """Record epoch_id into the committed-epoch set. Sorted with a type-stable
    key: batch epochs are ints while stream epochs are strings
    ('stream-{batch_id}'), and a bare sorted() on the mixed set raises
    TypeError, bricking every subsequent commit to the table."""
    s = set(old) | ({epoch_id} if epoch_id is not None else set())
    return sorted(s, key=lambda e: (isinstance(e, str), str(e)))


def _user_schema(df: DataFrame) -> T.StructType:
    return T.StructType([f for f in df.schema.fields if f.name not in _SYSTEM_COLS])


def _conform(df: DataFrame, schema: T.StructType, keep_system: bool = False) -> DataFrame:
    """Project df onto schema: missing columns become typed NULLs, column
    order normalized (W4 analog — order normalization before merge)."""
    cols = []
    for f in schema.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    if keep_system:
        for s in _SYSTEM_COLS:
            if s in df.columns:
                cols.append(F.col(s))
    return df.select(*cols)
