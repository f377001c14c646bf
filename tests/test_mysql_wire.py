"""M34: native MySQL wire protocol — golden-frame codec checks plus a raw
socket client driving the full conversation (handshake, COM_QUERY text
resultset, DDL-comment intercept, COM_PING, error path, COM_QUIT) against
the served SqlSession. No protocol library on either side."""

from __future__ import annotations

import socket
import struct
import threading

from dbt_osmosis_spark.mysql_wire import (
    COM_PING,
    COM_QUERY,
    COM_QUIT,
    MYSQL_TYPE_LONGLONG,
    MYSQL_TYPE_VAR_STRING,
    SERVER_VERSION,
    build_column_definition,
    build_eof,
    build_err,
    build_handshake_v10,
    build_ok,
    lenenc_int,
    lenenc_str,
    mysql_column_type,
    parse_handshake_response,
    read_lenenc_int,
    read_lenenc_str,
    serve_mysql,
    text_cell,
)


# ---- codec unit tests (golden bytes) ----------------------------------------

def test_lenenc_int_roundtrip_all_widths():
    for n in (0, 1, 250, 251, 65535, 65536, (1 << 24) - 1, 1 << 24, 1 << 33):
        buf = lenenc_int(n)
        val, pos = read_lenenc_int(buf, 0)
        assert (val, pos) == (n, len(buf))
    # golden encodings per the published format
    assert lenenc_int(5) == b"\x05"
    assert lenenc_int(251) == b"\xfc\xfb\x00"
    assert lenenc_int(1 << 16) == b"\xfd\x00\x00\x01"
    assert lenenc_int(1 << 24) == b"\xfe" + struct.pack("<Q", 1 << 24)


def test_lenenc_str_roundtrip():
    buf = lenenc_str(b"hello")
    s, pos = read_lenenc_str(buf, 0)
    assert s == b"hello" and pos == len(buf)


def test_ok_err_eof_golden_frames():
    ok = build_ok()
    assert ok[0] == 0x00 and ok == b"\x00\x00\x00\x02\x00\x00\x00"
    eof = build_eof()
    assert eof == b"\xfe\x00\x00\x02\x00"
    err = build_err("boom", code=1105, sqlstate="HY000")
    assert err[0] == 0xFF
    assert struct.unpack_from("<H", err, 1)[0] == 1105
    assert err[3:4] == b"#" and err[4:9] == b"HY000" and err[9:] == b"boom"


def test_handshake_v10_layout():
    seed = bytes(range(20))
    pkt = build_handshake_v10(7, seed)
    assert pkt[0] == 0x0A  # protocol version
    end = pkt.index(b"\x00", 1)
    assert pkt[1:end].decode() == SERVER_VERSION
    pos = end + 1
    assert struct.unpack_from("<I", pkt, pos)[0] == 7  # thread id
    pos += 4
    assert pkt[pos : pos + 8] == seed[:8] and pkt[pos + 8] == 0
    assert pkt.endswith(b"mysql_native_password\x00")


def test_parse_handshake_response_extracts_user():
    caps = 0x0200 | 0x8000  # PROTOCOL_41 | SECURE_CONNECTION
    payload = (
        struct.pack("<I", caps)
        + struct.pack("<I", 1 << 24)
        + bytes([33])
        + b"\x00" * 23
        + b"alice\x00"
        + bytes([4]) + b"\x01\x02\x03\x04"
    )
    out = parse_handshake_response(payload)
    assert out["user"] == "alice" and out["capabilities"] == caps


def test_column_definition_shape():
    pkt = build_column_definition("amount", MYSQL_TYPE_LONGLONG)
    cat, pos = read_lenenc_str(pkt, 0)
    assert cat == b"def"
    for _ in range(3):  # schema, table, org_table
        _, pos = read_lenenc_str(pkt, pos)
    name, pos = read_lenenc_str(pkt, pos)
    org, pos = read_lenenc_str(pkt, pos)
    assert name == org == b"amount"
    assert pkt[pos] == 0x0C  # fixed-fields marker
    assert pkt[pos + 7] == MYSQL_TYPE_LONGLONG


def test_type_map_and_text_cells():
    from datetime import date, datetime
    from decimal import Decimal

    from pyspark.sql import types as T

    assert mysql_column_type(T.LongType()) == MYSQL_TYPE_LONGLONG
    assert mysql_column_type(T.StringType()) == MYSQL_TYPE_VAR_STRING
    assert mysql_column_type(T.ArrayType(T.IntegerType())) == MYSQL_TYPE_VAR_STRING
    assert text_cell(None) is None
    assert text_cell(True) == b"1"
    assert text_cell(42) == b"42"
    assert text_cell(Decimal("1.50")) == b"1.50"
    assert text_cell(date(2024, 1, 2)) == b"2024-01-02"
    assert text_cell(datetime(2024, 1, 2, 3, 4, 5)) == b"2024-01-02 03:04:05"


# ---- raw-socket client ------------------------------------------------------

class _RawClient:
    """Minimal MySQL client speaking raw frames (test-side implementation,
    independent of the server's writer except for the shared framing)."""

    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        self.f = self.sock.makefile("rwb")

    def read_packet(self) -> tuple[bytes, int]:
        head = self.f.read(4)
        assert len(head) == 4, "connection closed"
        n = int.from_bytes(head[:3], "little")
        return self.f.read(n), head[3]

    def write_packet(self, payload: bytes, seq: int) -> None:
        self.f.write(struct.pack("<I", len(payload))[:3] + bytes([seq]) + payload)
        self.f.flush()

    def command(self, cmd: int, body: bytes = b"") -> None:
        self.write_packet(bytes([cmd]) + body, 0)

    def read_resultset(self):
        payload, _ = self.read_packet()
        if payload[0] == 0xFF:
            return ("err", payload[9:].decode())
        if payload[0] == 0x00:
            return ("ok", None)
        ncols, _ = read_lenenc_int(payload, 0)
        cols = []
        for _ in range(ncols):
            pkt, _ = self.read_packet()
            pos = 0
            for _ in range(4):  # catalog, schema, table, org_table
                _, pos = read_lenenc_str(pkt, pos)
            name, pos = read_lenenc_str(pkt, pos)
            _, pos = read_lenenc_str(pkt, pos)  # org_name
            cols.append((name.decode(), pkt[pos + 7]))
        eof, _ = self.read_packet()
        assert eof[0] == 0xFE
        rows = []
        while True:
            pkt, _ = self.read_packet()
            if pkt[0] == 0xFE and len(pkt) < 9:  # EOF terminates rows
                break
            row, pos = [], 0
            for _ in range(ncols):
                if pkt[pos] == 0xFB:  # NULL
                    row.append(None)
                    pos += 1
                else:
                    s, pos = read_lenenc_str(pkt, pos)
                    row.append(s.decode())
            rows.append(row)
        return ("rows", (cols, rows))

    def close(self):
        self.sock.close()


def test_mysql_wire_conversation(spark):
    from dbt_osmosis_spark.project import Manifest, ModelNode

    m = Manifest()
    m.models["wire_model"] = ModelNode(
        name="wire_model", raw_sql="select 1 as one", path="wm.sql"
    )
    spark.createDataFrame(
        [(1, "x", None), (2, None, 3.5)], "id long, name string, score double"
    ).createOrReplaceTempView("mysql_demo")

    srv = serve_mysql(spark, m)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        c = _RawClient(port)
        # 1. greeting
        greeting, seq = c.read_packet()
        assert seq == 0 and greeting[0] == 0x0A
        assert b"mysql_native_password\x00" in greeting
        # 2. handshake response (protocol 4.1, secure connection, no db)
        caps = 0x0200 | 0x8000
        resp = (
            struct.pack("<I", caps)
            + struct.pack("<I", 1 << 24)
            + bytes([33])
            + b"\x00" * 23
            + b"tester\x00"
            + bytes([0])  # empty auth response
        )
        c.write_packet(resp, seq + 1)
        ok, _ = c.read_packet()
        assert ok[0] == 0x00  # auth accepted
        # 3. COM_QUERY -> text resultset with typed columns and NULLs
        c.command(COM_QUERY, b"select id, name, score from mysql_demo order by id")
        kind, (cols, rows) = c.read_resultset()
        assert kind == "rows"
        assert [name for name, _ in cols] == ["id", "name", "score"]
        assert cols[0][1] == MYSQL_TYPE_LONGLONG
        assert cols[1][1] == MYSQL_TYPE_VAR_STRING
        assert rows == [["1", "x", None], ["2", None, "3.5"]]
        # 4. comment DDL intercept -> OK, manifest mutated
        c.command(COM_QUERY, b"COMMENT ON TABLE wire_model IS 'over mysql'")
        assert c.read_resultset() == ("ok", None)
        assert m.models["wire_model"].description == "over mysql"
        # 5. jinja through the session (compiles; ref targets a view name)
        c.command(COM_QUERY, b"select 1 as one from {{ ref('wire_model') }}")
        kind, _ = c.read_resultset()
        assert kind in ("rows", "err")  # compiled; view existence is env-dependent
        # 6. COM_PING -> OK
        c.command(COM_PING)
        pkt, _ = c.read_packet()
        assert pkt[0] == 0x00
        # 7. broken SQL -> ERR with sqlstate marker
        c.command(COM_QUERY, b"select broken from")
        kind, msg = c.read_resultset()
        assert kind == "err" and msg
        # 8. COM_QUIT -> server closes the stream
        c.command(COM_QUIT)
        assert c.f.read(4) == b""
        c.close()
    finally:
        srv.shutdown()
        srv.server_close()


def test_workbench_client_example(spark):
    """examples/workbench_client.py drives a live JSON server end-to-end:
    spawn serve_wire, run the compile+preview+profile round-trip, render."""
    import importlib.util
    import threading

    from dbt_osmosis_spark.project import Manifest
    from dbt_osmosis_spark.serving import serve_wire

    spec = importlib.util.spec_from_file_location(
        "workbench_client", "/root/repo/examples/workbench_client.py"
    )
    client = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(client)

    spark.createDataFrame(
        [(1, "a"), (2, None)], "id long, tag string"
    ).createOrReplaceTempView("wb_demo")
    srv = serve_wire(spark, Manifest())
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        resp = client.workbench_roundtrip(
            "127.0.0.1", port, "SELECT id, tag from wb_demo where id > 0"
        )
        text = client.render(resp)
        assert "-- compiled --" in text and "-- profile --" in text
        assert "id | tag" in text and "NULL" in text
        assert "keyword-case" in text  # lint pane fired on the mixed case
        assert "nulls=1" in text  # tag column profile
    finally:
        srv.shutdown()
        srv.server_close()


def test_write_packet_splits_16mb_frames():
    """Payloads >= 0xFFFFFF bytes must split into continuation frames and
    read_packet must reassemble them (ADVICE r4: one oversized text cell
    would otherwise emit a wrapped 3-byte length and desynchronize stock
    clients). Also covers the exact-boundary case, which requires an empty
    terminating frame."""
    import io

    from dbt_osmosis_spark.mysql_wire import read_packet, write_packet

    for size in (0, 5, 0xFFFFFE, 0xFFFFFF, 0xFFFFFF + 7, 2 * 0xFFFFFF):
        payload = bytes(range(256)) * (size // 256) + bytes(size % 256)
        buf = io.BytesIO()
        next_seq = write_packet(buf, payload, seq=3)
        n_frames = max(1, size // 0xFFFFFF + 1)
        assert next_seq == (3 + n_frames) & 0xFF
        buf.seek(0)
        got, last_seq = read_packet(buf)
        assert got == payload
        assert last_seq == (3 + n_frames - 1) & 0xFF
        assert buf.read() == b""  # no trailing bytes — framing is exact


def test_read_packet_caps_oversized_logical_packets():
    """Continuation reassembly must not buffer unbounded client data: a
    logical packet over max_packet returns None (connection dropped)
    instead of accumulating frames forever."""
    import io

    from dbt_osmosis_spark.mysql_wire import read_packet, write_packet

    buf = io.BytesIO()
    write_packet(buf, b"x" * (2 * 0xFFFFFF + 5), seq=0)
    buf.seek(0)
    assert read_packet(buf, max_packet=0xFFFFFF) is None
    buf.seek(0)
    got, _ = read_packet(buf, max_packet=64 * 1024 * 1024)
    assert len(got) == 2 * 0xFFFFFF + 5
