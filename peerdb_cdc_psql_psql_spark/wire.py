"""PostgreSQL v3 wire-protocol frontend — the listener the reference
exposes on :9900 (docker-compose.yml:155-170, `peerdb` service) so a
stock ``psql`` can speak mirror DDL and SQL to the engine.

Scope: the *simple query* subtree of the protocol — startup (with
SSL/GSS probe refusal), trust auth, ``Q`` messages, text-format
result sets, error responses. That is exactly the surface the
reference's nexus uses for `CREATE/DROP/PAUSE/RESUME MIRROR`,
`SHOW MIRRORS`, and ad-hoc SELECTs; the extended (prepare/bind)
protocol is deliberately out of scope.

Dispatch: mirror-DDL verbs route to
``operators.sql_frontend.execute_mirror_command`` (the dialect
handler); everything else goes to ``spark.sql`` — Catalyst compiles
the text to the same plan the DataFrame API would produce, so the
wire layer adds no second query engine, only framing.

Scale posture: result sets stream through ``toLocalIterator`` in
partition-sized chunks — the frontend never materializes a full
result in driver memory, so a SELECT over the fact table ships rows
as the executors deliver them (the same backpressure model as a real
server-side cursor).
"""

from __future__ import annotations

import socket
import struct
import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_SSL_REQUEST = 80877103
_GSSENC_REQUEST = 80877104
_CANCEL_REQUEST = 80877102
_PROTOCOL_V3 = 196608

# Spark simpleString prefix → Postgres type OID (text format)
_OID = {
    "tinyint": 21, "smallint": 21, "int": 23, "bigint": 20,
    "float": 700, "double": 701, "decimal": 1700,
    "boolean": 16, "date": 1082, "timestamp": 1114, "string": 25,
}
_TEXT_OID = 25


def _oid_for(spark_type: str) -> int:
    for prefix, oid in _OID.items():
        if spark_type.startswith(prefix):
            return oid
    return _TEXT_OID


def _render(v) -> bytes | None:
    """Text-format cell rendering (None → SQL NULL wire marker)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return b"t" if v else b"f"
    if isinstance(v, bytes):
        return b"\\x" + v.hex().encode()
    if isinstance(v, (list, tuple)):
        return (
            "{" + ",".join("NULL" if x is None else str(x) for x in v) + "}"
        ).encode()
    if isinstance(v, dict):
        return (
            "{" + ",".join(f"{k}={x}" for k, x in sorted(v.items())) + "}"
        ).encode()
    return str(v).encode()


def _msg(kind: bytes, payload: bytes) -> bytes:
    return kind + struct.pack("!i", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _error(message: str, code: str = "XX000") -> bytes:
    fields = b"S" + _cstr("ERROR") + b"C" + _cstr(code) + b"M" + _cstr(message)
    return _msg(b"E", fields + b"\x00")


_READY = _msg(b"Z", b"I")


@dataclass
class WireServer:
    """Localhost frontend binding ``spark`` to a TCP port. ``port=0``
    binds an ephemeral port (tests); the reference's fixed port is
    9900. ``mirror_env`` carries the storage roots CREATE/DROP/RESUME
    MIRROR need (schemas, event_dir, target_root, checkpoint_root,
    trigger) — exactly ``execute_mirror_command``'s keywords."""

    spark: SparkSession
    host: str = "127.0.0.1"
    port: int = 9900
    sf_dir: str | None = None
    mirror_env: dict = field(default_factory=dict)
    # also expose every registered operator as a q_<name> SQL view, so
    # a psql user can run the full engine surface as plain SELECTs
    query_views: bool = False
    _sock: socket.socket | None = None
    _thread: threading.Thread | None = None
    _stop: threading.Event = field(default_factory=threading.Event)

    def start(self) -> int:
        """Bind, register fixture views (when ``sf_dir`` is given) and
        serve on a daemon thread; returns the bound port."""
        if self.sf_dir:
            from .operators.sql_frontend import register_views

            register_views(self.spark, self.sf_dir)
            if self.query_views:
                from . import operators  # noqa: F401 — fills REGISTRY
                from .operators.sql_frontend import register_query_views

                register_query_views(self.spark, self.sf_dir)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((self.host, self.port))
        self._sock.listen(8)
        self._sock.settimeout(0.25)
        self.port = self._sock.getsockname()[1]
        self._stop.clear()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
        if self._sock:
            self._sock.close()
            self._sock = None

    # -- accept loop ---------------------------------------------------
    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            t = threading.Thread(
                target=self._handle_conn, args=(conn,), daemon=True
            )
            t.start()

    # -- per-connection ------------------------------------------------
    def _handle_conn(self, conn: socket.socket) -> None:
        try:
            conn.settimeout(60)
            if not self._startup(conn):
                return
            conn.sendall(
                _msg(b"R", struct.pack("!i", 0))  # AuthenticationOk (trust)
                + _msg(b"S", _cstr("server_version") + _cstr("15.0 (spark)"))
                + _msg(b"S", _cstr("client_encoding") + _cstr("UTF8"))
                + _msg(b"S", _cstr("DateStyle") + _cstr("ISO"))
                + _msg(b"K", struct.pack("!ii", 1, 0))  # BackendKeyData
                + _READY
            )
            while not self._stop.is_set():
                head = self._read_exact(conn, 5)
                if head is None:
                    return
                kind, length = head[0:1], struct.unpack("!i", head[1:5])[0]
                payload = self._read_exact(conn, length - 4)
                if payload is None:
                    return
                if kind == b"X":  # Terminate
                    return
                if kind == b"Q":
                    self._simple_query(conn, payload[:-1].decode("utf-8", "replace"))
                    conn.sendall(_READY)
                # Flush/Sync/etc. from stray extended-protocol clients:
                # answer ready so they fail fast instead of hanging
                elif kind in (b"S", b"H"):
                    conn.sendall(_READY)
                else:
                    conn.sendall(
                        _error(
                            f"unsupported message type {kind!r} "
                            "(simple query protocol only)",
                            code="0A000",
                        )
                        + _READY
                    )
        except OSError:
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _startup(self, conn: socket.socket) -> bool:
        """Negotiate startup; refuse SSL/GSS probes with 'N' (psql then
        retries plaintext when sslmode allows)."""
        while True:
            head = self._read_exact(conn, 4)
            if head is None:
                return False
            length = struct.unpack("!i", head)[0]
            payload = self._read_exact(conn, length - 4)
            if payload is None:
                return False
            code = struct.unpack("!i", payload[:4])[0]
            if code in (_SSL_REQUEST, _GSSENC_REQUEST):
                conn.sendall(b"N")
                continue
            if code == _CANCEL_REQUEST:
                return False
            return code == _PROTOCOL_V3

    @staticmethod
    def _read_exact(conn: socket.socket, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    # -- query dispatch ------------------------------------------------
    _MIRROR_VERBS = (
        "create mirror", "drop mirror", "pause mirror",
        "resume mirror", "show mirrors",
    )

    @staticmethod
    def _split_statements(sql: str) -> list[str]:
        """Split on semicolons outside single-quoted literals ('' is
        the quote escape) — a raw split would cut `SELECT 'a;b'`."""
        out, cur, in_str, i = [], [], False, 0
        while i < len(sql):
            ch = sql[i]
            if in_str:
                if ch == "'" and i + 1 < len(sql) and sql[i + 1] == "'":
                    cur.append("''")
                    i += 2
                    continue
                if ch == "'":
                    in_str = False
                cur.append(ch)
            elif ch == "'":
                in_str = True
                cur.append(ch)
            elif ch == ";":
                out.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
            i += 1
        out.append("".join(cur))
        return [s.strip() for s in out if s.strip()]

    def _simple_query(self, conn: socket.socket, sql: str) -> None:
        for stmt in self._split_statements(sql):
            try:
                self._run_statement(conn, stmt)
            except Exception as e:  # noqa: BLE001 — every engine error
                # becomes one wire ErrorResponse; the session survives
                conn.sendall(_error(str(e).splitlines()[0][:500]))
                return
        if not sql.strip():
            conn.sendall(_msg(b"I", b""))  # EmptyQueryResponse

    def _run_statement(self, conn: socket.socket, stmt: str) -> None:
        low = " ".join(stmt.lower().split())
        if (
            low.startswith(("insert into ", "update ", "delete from "))
            and self.mirror_env.get("schemas")
            and self.mirror_env.get("event_dir")
        ):
            # DML against a mirrored source table = change-event
            # production (the role the source Postgres plays in the
            # reference); a running/resumed mirror applies it.
            from .operators.sql_frontend import execute_dml_command

            tag, _ = execute_dml_command(
                self.spark, stmt,
                schemas=self.mirror_env["schemas"],
                event_dir=self.mirror_env["event_dir"],
                key_column=self.mirror_env.get("key_column", "id"),
            )
            conn.sendall(_msg(b"C", _cstr(tag)))
            return
        if low.startswith(self._MIRROR_VERBS):
            from .operators.sql_frontend import execute_mirror_command

            result = execute_mirror_command(
                self.spark, stmt, **self.mirror_env
            )
            verb = low.split(" mirror")[0].upper()
            if isinstance(result, DataFrame):
                self._send_result(conn, result)
            else:
                conn.sendall(_msg(b"C", _cstr(f"{verb} MIRROR")))
            return
        df = self._sql_with_mirror_targets(stmt)
        if df.columns:
            self._send_result(conn, df)
        else:
            # DDL/utility statements (SET, CREATE VIEW, ...) return an
            # empty-schema frame; complete with the leading keyword
            df.collect()
            conn.sendall(_msg(b"C", _cstr(stmt.split()[0].upper())))

    def _sql_with_mirror_targets(self, stmt: str) -> DataFrame:
        """spark.sql with mirror-target resolution: a reference user's
        main wire workflow is CREATE MIRROR then SELECT against the
        replicated TARGET table. Target state lives as keyed parquet
        under mirror_env['target_root'], not in the SQL catalog, so an
        unresolved-table error retries once after registering temp
        views for any DDL-defined mirror targets that now have data."""
        from pyspark.errors import AnalysisException

        try:
            return self.spark.sql(stmt)
        except AnalysisException:
            target_root = self.mirror_env.get("target_root")
            if not target_root:
                raise
            from .operators.sql_frontend import _DDL_MIRRORS
            from .streaming.cdc import read_target

            registered = False
            for mirror in _DDL_MIRRORS.values():
                for mapping in mirror.tables.values():
                    try:
                        read_target(
                            self.spark, mirror, mapping.source_table,
                            target_root,
                        ).createOrReplaceTempView(mapping.target_table)
                        registered = True
                    except Exception:  # noqa: BLE001 — target not
                        continue  # materialized yet; leave unregistered
            if not registered:
                raise
            return self.spark.sql(stmt)

    def _send_result(self, conn: socket.socket, df: DataFrame) -> None:
        desc = struct.pack("!h", len(df.dtypes))
        for name, typ in df.dtypes:
            desc += (
                _cstr(name)
                + struct.pack("!ihihih", 0, 0, _oid_for(typ), -1, -1, 0)
            )
        conn.sendall(_msg(b"T", desc))
        n = 0
        chunk = bytearray()
        # toLocalIterator: one partition in flight — constant frontend
        # memory however large the result
        for row in df.toLocalIterator():
            cells = [_render(v) for v in row]
            body = struct.pack("!h", len(cells))
            for c in cells:
                body += (
                    struct.pack("!i", -1)
                    if c is None
                    else struct.pack("!i", len(c)) + c
                )
            chunk += _msg(b"D", body)
            n += 1
            if len(chunk) >= 1 << 16:
                conn.sendall(bytes(chunk))
                chunk.clear()
        chunk += _msg(b"C", _cstr(f"SELECT {n}"))
        conn.sendall(bytes(chunk))


def main(argv: list[str] | None = None) -> None:
    """``python -m peerdb_cdc_psql_psql_spark.wire`` — serve the
    engine on the reference's port layout (docker-compose.yml:155-170)
    until interrupted: ``--port 9900 --sf-dir /data/sf --data-root
    /data/mirrors`` then ``psql -h localhost -p 9900``."""
    import argparse
    import time as _time

    from .catalog import DEMO_SCHEMAS
    from .session import get_spark

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=9900)
    ap.add_argument("--sf-dir", default=None,
                    help="parquet table dir to expose as SQL views")
    ap.add_argument("--data-root", default=None,
                    help="root dir for mirror event/target/checkpoint state")
    ap.add_argument("--query-views", action="store_true",
                    help="expose every registered operator as a q_<name> view")
    args = ap.parse_args(argv)
    spark = get_spark("wire-frontend")
    env = {}
    if args.data_root:
        import os as _os

        # CREATE MIRROR tails the WAL dir immediately; it must exist
        # (empty is fine) even before the first INSERT produces events
        _os.makedirs(f"{args.data_root}/wal", exist_ok=True)
        env = dict(
            schemas=DEMO_SCHEMAS,
            event_dir=f"{args.data_root}/wal",
            target_root=f"{args.data_root}/target",
            checkpoint_root=f"{args.data_root}/ckpt",
        )
    srv = WireServer(
        spark, host=args.host, port=args.port,
        sf_dir=args.sf_dir, mirror_env=env,
        query_views=args.query_views,
    )
    port = srv.start()
    print(f"wire frontend listening on {args.host}:{port}", flush=True)
    try:
        while True:
            _time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
