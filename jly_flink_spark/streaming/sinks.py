"""Dual sinks reproducing the reference's delivery semantics
(SURVEY.md K1–K6) on the micro-batch model.

- AdbStyleSink ≈ the buffered JDBC batch-insert sink
  (reference: sink/AdbSink.java:30-146). Here the write target is
  parquet partitioned by the routing key; for a real
  AnalyticDB/MySQL target, swap `_write` for `df.write.jdbc(...)`
  with the reference's URL params (`rewriteBatchedStatements=true`,
  server-side prepared statements, `serverTimezone=Asia/Shanghai` —
  AdbSink.java:63,73-77); the epoch/ledger logic is unchanged.
- SrStyleSink ≈ the StarRocks Stream Load sink
  (reference: sink/SrSink.java:31-203 + utils/SrStreamLoadClient.java).
  It reproduces the contract pieces that carry semantics: fixed-size
  chunking (Lists.partition, SrSink.java:108-110), one labelled load
  request per chunk (SrSink.java:111-116), label-dedup on replay
  ("Label Already Exists" → skip, SrSink.java:126-129). The transport
  is pluggable: `LocalDirTransport` records each request (for the
  offline harness); a real transport would PUT to
  http://fe:8030/api/<db>/<tbl>/_stream_load with Basic auth,
  format=JSON, strip_outer_array=true, jsonpaths column mapping and
  307-redirect handling (SrStreamLoadClient.java:44-79).

Delivery guarantee: at-least-once micro-batches from checkpointed
source offsets + idempotent labels keyed on (query_id, epoch_id,
chunk) ⇒ effectively-once, strictly stronger than the reference's
ADB path (which drops on persistent failure — K2; deviation
documented in SURVEY.md §7)."""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame

# Sink column order matches the ADB INSERT list (AdbSink.java:111).
SINK_COLUMNS = ("db_tb_name", "id", "fb_no", "record_del_time", "data_json")


class LabelLedger:
    """Filesystem ledger of committed load labels — the replay-dedup
    that StarRocks provides server-side via label registration
    (SrSink.java:126-129). One empty file per committed label; rename-
    free and idempotent, so it is safe under micro-batch replay."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def seen(self, label: str) -> bool:
        return os.path.exists(os.path.join(self.path, label))

    def commit(self, label: str) -> None:
        with open(os.path.join(self.path, label), "w", encoding="utf-8"):
            pass


@dataclass
class AdbStyleSink:
    """Parquet archival keyed by epoch, standing in for the JDBC
    batch sink. Epoch idempotency: an epoch already in the ledger is
    skipped wholesale; an epoch NOT in the ledger overwrites its own
    `epoch_id=<n>` partition directory, so a crash between a partial
    write and the ledger commit replays clean instead of appending
    duplicates — the parquet analog of the JDBC sink's
    DELETE-then-INSERT (the reference instead relies on MySQL
    transaction-per-flush, AdbSink.java:104-127)."""

    out_dir: str

    def __post_init__(self):
        self.ledger = LabelLedger(os.path.join(self.out_dir, "_ledger"))

    def write(self, batch_df: DataFrame, epoch_id: int, query_id: str = "q") -> None:
        label = f"adb_{query_id}_{epoch_id}"
        if self.ledger.seen(label):
            return  # replayed epoch — already committed
        epoch_dir = os.path.join(
            self.out_dir, "data", f"epoch_id={int(epoch_id)}"
        )
        (
            batch_df.select(*SINK_COLUMNS)
            .write.mode("overwrite")
            .partitionBy("db_tb_name")
            .parquet(epoch_dir)
        )
        self.ledger.commit(label)


# Table-missing SQLStates across the dialects the sink targets:
# MySQL/AnalyticDB 42S02 (ER_NO_SUCH_TABLE), Derby 42X05
# (table/view does not exist), Postgres 42P01 (undefined_table).
_MISSING_TABLE_SQLSTATES = {"42S02", "42X05", "42P01"}


def _is_missing_table_error(e: Exception) -> bool:
    """True iff the JDBC failure means the TARGET TABLE does not
    exist. Decide on the structured SQLState from the Java exception
    chain when available — a bare substring match on the message
    would also swallow a genuine failure whose text merely MENTIONS
    such a state (e.g. a wrapped error referencing another
    statement). The message-anchor fallback runs only when no
    SQLState is exposed anywhere in the chain."""
    java_exc = getattr(e, "java_exception", None)
    for _ in range(8):  # bounded walk of the cause chain
        if java_exc is None:
            break
        try:
            state = java_exc.getSQLState()
        except Exception:
            state = None
        if state:
            return str(state).upper() in _MISSING_TABLE_SQLSTATES
        try:
            java_exc = java_exc.getCause()
        except Exception:
            break
    low = str(e).lower()
    return "does not exist" in low or "doesn't exist" in low


@dataclass
class JdbcAdbSink:
    """Real JDBC code path for the ADB batch sink (reference
    sink/AdbSink.java:111-127: buffered INSERT batch inside a
    transaction per flush).

    The reference's MySQL/AnalyticDB URL params
    (`rewriteBatchedStatements=true`, `useServerPrepStmts`,
    `serverTimezone=Asia/Shanghai` — AdbSink.java:63,73-77) belong on
    the caller-supplied `url`; tests run against embedded Derby (the
    JDBC driver Spark itself bundles), which exercises the identical
    `df.write.jdbc` code path.

    Delivery: effectively-once per epoch via DELETE-then-INSERT keyed
    on (query_id, epoch_id) — a replayed or half-written epoch is
    wiped and rewritten, the transactional analog of the reference's
    transaction-per-flush. The epoch/query columns ride along in the
    target table, so the cleanup is a single indexed DELETE."""

    url: str
    table: str = "delete_archive"
    driver: str = "org.apache.derby.jdbc.EmbeddedDriver"

    def _execute(self, spark, sql: str) -> None:
        """Run one DDL/DML statement over the JVM's DriverManager —
        the same connection machinery df.write.jdbc uses."""
        jvm = spark._jvm
        jvm.java.lang.Class.forName(self.driver)
        conn = jvm.java.sql.DriverManager.getConnection(self.url)
        try:
            stmt = conn.createStatement()
            try:
                stmt.executeUpdate(sql)
            finally:
                stmt.close()
        finally:
            conn.close()

    def write(self, batch_df: DataFrame, epoch_id: int, query_id: str = "q") -> None:
        import re

        from pyspark.sql import functions as F

        # query_id/table are interpolated into the cleanup SQL; keep
        # them identifier-shaped so config values can't smuggle SQL.
        if not re.fullmatch(r"[A-Za-z0-9_.\-]+", query_id):
            raise ValueError(f"query_id not identifier-safe: {query_id!r}")
        if not re.fullmatch(r"[A-Za-z0-9_.]+", self.table):
            raise ValueError(f"table not identifier-safe: {self.table!r}")

        spark = batch_df.sparkSession
        stamped = batch_df.select(*SINK_COLUMNS).withColumn(
            "epoch_id", F.lit(int(epoch_id))
        ).withColumn("query_id", F.lit(query_id))
        try:
            # Spark's JDBC writer emits the table name as given
            # (unquoted) but QUOTES every column identifier, so the
            # cleanup must match: bare table, quoted columns.
            # CAST the string column: Spark maps StringType to CLOB
            # on Derby, and CLOB does not compare to a CHAR literal.
            self._execute(
                spark,
                f"DELETE FROM {self.table} "
                f'WHERE "epoch_id" = {int(epoch_id)} '
                f'AND CAST("query_id" AS VARCHAR(128)) = \'{query_id}\'',
            )
        except Exception as e:
            # Tolerate only the very first epoch (table not created
            # yet); anything else is a real cleanup failure and must
            # surface — swallowing it would let replays duplicate.
            if not _is_missing_table_error(e):
                raise
        (
            stamped.write.mode("append")
            .option("driver", self.driver)
            .jdbc(self.url, self.table)
        )


class LocalDirTransport:
    """Offline stand-in for the Stream Load HTTP endpoint: records
    each labelled JSON-array payload as a file. Duplicate label →
    'Label Already Exists' response, exactly like a StarRocks FE."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def put(self, db_tb_name: str, label: str, payload: str) -> dict:
        import json as _json

        tbl_dir = os.path.join(self.root, db_tb_name)
        os.makedirs(tbl_dir, exist_ok=True)
        target = os.path.join(tbl_dir, f"{label}.json")
        if os.path.exists(target):
            return {"Status": "Label Already Exists"}
        # Atomic commit: a crash mid-write must NOT leave a partial
        # file at the label path — replay would see it as committed
        # ('Label Already Exists') and the truncated payload would be
        # accepted forever. Temp-write + rename is the same
        # visibility contract a real FE's label registration gives.
        tmp = target + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(payload)
        os.replace(tmp, target)
        return {
            "Status": "Success",
            "NumberLoadedRows": len(_json.loads(payload)),
        }


class HttpStreamLoadTransport:
    """Real Stream Load HTTP transport, reproducing the reference
    client's wire contract (utils/SrStreamLoadClient.java:44-93):

    - PUT http://<fe>/api/<db>/<table>/_stream_load
    - Basic auth header (user:password)
    - label header (dedup key registered by the FE)
    - format=json + strip_outer_array=true + jsonpaths column mapping
      (the payload is a JSON array of row objects)
    - Expect: 100-continue
    - 307 handling: the FE redirects the PUT to a backend node;
      HTTP clients do not transparently re-send a PUT body on 307
      (the reference re-issues manually, SrStreamLoadClient.java:70-79),
      so the request is re-built once against the Location target.

    Duck-typed like LocalDirTransport: `put(db_tb_name, label,
    payload) -> dict` (the parsed JSON response body), so SrStyleSink
    takes either transport unchanged."""

    JSONPATHS = '["$.id", "$.record_del_time", "$.fb_no", "$.data_json"]'

    def __init__(
        self,
        fe_url: str,
        db: str,
        user: str = "root",
        password: str = "",
        timeout_s: float = 30.0,
    ):
        self.fe_url = fe_url.rstrip("/")
        self.db = db
        self.user = user
        self.password = password
        self.timeout_s = timeout_s

    def _auth_header(self) -> str:
        import base64

        token = base64.b64encode(
            f"{self.user}:{self.password}".encode("utf-8")
        ).decode("ascii")
        return f"Basic {token}"

    def _request(
        self, url: str, label: str, body: bytes, follow_redirect: bool = True
    ) -> dict:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, data=body, method="PUT")
        req.add_header("Authorization", self._auth_header())
        req.add_header("label", label)
        req.add_header("format", "json")
        req.add_header("strip_outer_array", "true")
        req.add_header("jsonpaths", self.JSONPATHS)
        req.add_header("Expect", "100-continue")
        req.add_header("Content-Type", "application/json")
        # Server-side load limits, mirroring the reference client
        # (SrStreamLoadClient.java:52-53): 5 GiB per-load memory cap,
        # 1200 s server-side load timeout.
        req.add_header("load_mem_limit", str(5 * 1024**3))
        req.add_header("timeout", "1200")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code == 307 and follow_redirect:
                target = e.headers.get("Location")
                if not target:
                    raise
                # one manual re-issue, like the reference client
                return self._request(target, label, body, follow_redirect=False)
            raise

    def put(self, db_tb_name: str, label: str, payload: str) -> dict:
        url = f"{self.fe_url}/api/{self.db}/{db_tb_name}/_stream_load"
        return self._request(url, label, payload.encode("utf-8"))


@dataclass
class SrStyleSink:
    """Stream-Load-style sink: group by routing table, chunk each
    group to `batch_size`, one labelled request per chunk.

    Label format mirrors the reference's
    sink_sr_<jobId>_<uid>_<subtask>_<nanos>_<chunk> (SrSink.java:111-116)
    with Spark's replay identity substituted: (query_id, epoch_id)
    is stable across micro-batch replays, so labels are deterministic
    and replays dedup — the property the reference gets from nanos+uid
    only within a single attempt.

    Chunk CONTENTS are deterministic too, not just labels: rows are
    sorted by the full row key before chunking (sortWithinPartitions
    below), so a replayed epoch re-produces byte-identical chunks
    under the same labels. Without the sort, shuffle row order could
    differ across task retries and a replayed chunk would carry
    different rows under an already-committed label — silent row
    loss masked by the 'Label Already Exists' skip."""

    transport: object  # LocalDirTransport | HttpStreamLoadTransport
    batch_size: int = 100  # SinkConfig.java:20 default

    def write(self, batch_df: DataFrame, epoch_id: int, query_id: str = "q") -> None:
        size = self.batch_size

        def load_partition(rows):
            # Executor-side: group rows of this partition by routing
            # key, chunk, and send one labelled request per chunk.
            import collections

            by_table = collections.defaultdict(list)
            for row in rows:
                by_table[row["db_tb_name"]].append(
                    {
                        "id": row["id"],
                        "record_del_time": str(row["record_del_time"]),
                        "fb_no": row["fb_no"],
                        "data_json": row["data_json"],
                    }
                )
            for tbl, items in by_table.items():
                for ci in range(0, len(items), size):
                    chunk = items[ci : ci + size]
                    label = (
                        f"sink_sr_{query_id}_{epoch_id}_{tbl}_{ci // size}"
                    )
                    resp = transport.put(tbl, label, json.dumps(chunk))
                    status = resp.get("Status")
                    if status == "Label Already Exists":
                        continue  # replayed chunk — already loaded
                    if status != "Success":
                        raise RuntimeError(f"stream load failed: {resp}")

        transport = self.transport
        # Repartition by routing key so each destination table's rows
        # co-locate (the groupingBy at SrSink.java:93), then sort
        # within each partition on the full row so chunk membership is
        # a pure function of (epoch contents, batch_size) — replay-
        # deterministic. coalesce(1) per epoch would serialize like
        # the reference's parallelism-1; we keep it parallel (bag +
        # labels make order irrelevant).
        (
            batch_df.select(*SINK_COLUMNS)
            .repartition("db_tb_name")
            .sortWithinPartitions(*SINK_COLUMNS)
            .foreachPartition(load_partition)
        )


@dataclass
class DualSink:
    """Fan out every micro-batch to both sinks — the reference wires
    AdbSink always and SrSink behind --sink_to_sr (StartJob.java:
    94-104; C3). One source read, two writes, exactly as the Flink
    job replicates records to both sink operators.

    `query_id` is the idempotency namespace: labels and the JDBC
    cleanup key are (query_id, epoch_id, ...)-scoped, so TWO
    independent streaming queries sharing one sink target MUST use
    distinct query_ids — otherwise query B's epoch 0 collides with
    query A's already-committed epoch 0 label and is silently
    skipped. The job wiring passes the task's db alias."""

    adb: AdbStyleSink
    sr: SrStyleSink | None = None
    query_id: str = "q"

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            self.adb.write(batch_df, epoch_id, self.query_id)
            if self.sr is not None:
                self.sr.write(batch_df, epoch_id, self.query_id)
        finally:
            batch_df.unpersist()
