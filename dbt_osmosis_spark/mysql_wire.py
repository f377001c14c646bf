"""Native MySQL client/server wire protocol codec (SURVEY M34).

The reference mounts its serving session on a MySQL-wire proxy via the
third-party mysql-mimic library (reference: src/dbt_osmosis/sql/proxy.py:
174-179), so any stock MySQL client can point at a dbt project. That
library is not available here, but the protocol itself is public and
small for the subset a read-mostly SQL proxy needs, so this module
implements it directly from the published wire format:

  * server greeting (Protocol::HandshakeV10) + accept-any auth
    (Protocol::HandshakeResponse41 -> OK_Packet)
  * COM_QUERY -> Protocol::Text resultset (column-count, ColumnDefinition41
    packets, EOF, row packets of length-encoded strings, EOF)
  * COM_PING / COM_INIT_DB -> OK_Packet, COM_QUIT -> close
  * errors -> ERR_Packet, intercepted comment-DDL -> OK_Packet

The SQL semantics live in the protocol-agnostic ``SqlSession``
(serving.py): jinja compilation, DDL-comment interception, and Spark
execution are identical whether the bytes arrive as JSON lines
(serve_wire) or MySQL frames (serve_mysql below).

Scale note: the proxy is a control-plane surface — every resultset is
bounded by ``max_rows`` (`LIMIT` pushed into the plan, CollectLimit), so
a client poking a 100 TB table costs one bounded scan per query.
"""

from __future__ import annotations

import socketserver
import struct
from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from dbt_osmosis_spark.project import Manifest
from dbt_osmosis_spark.serving import SqlSession

SERVER_VERSION = "8.0.0-dbt-osmosis-spark"

# capability flags (public protocol constants)
CLIENT_LONG_PASSWORD = 0x00000001
CLIENT_FOUND_ROWS = 0x00000002
CLIENT_LONG_FLAG = 0x00000004
CLIENT_CONNECT_WITH_DB = 0x00000008
CLIENT_PROTOCOL_41 = 0x00000200
CLIENT_TRANSACTIONS = 0x00002000
CLIENT_SECURE_CONNECTION = 0x00008000
CLIENT_PLUGIN_AUTH = 0x00080000

SERVER_CAPABILITIES = (
    CLIENT_LONG_PASSWORD
    | CLIENT_FOUND_ROWS
    | CLIENT_LONG_FLAG
    | CLIENT_CONNECT_WITH_DB
    | CLIENT_PROTOCOL_41
    | CLIENT_TRANSACTIONS
    | CLIENT_SECURE_CONNECTION
    | CLIENT_PLUGIN_AUTH
)
# deliberately NOT advertised: CLIENT_DEPRECATE_EOF (we emit classic EOF
# packets) and CLIENT_SSL (plaintext only) — clients mask against server
# capabilities, so not advertising keeps both sides on the simple path.

SERVER_STATUS_AUTOCOMMIT = 0x0002
CHARSET_UTF8_GENERAL_CI = 33

# command bytes
COM_QUIT = 0x01
COM_INIT_DB = 0x02
COM_QUERY = 0x03
COM_PING = 0x0E

# column types (Protocol::ColumnType)
MYSQL_TYPE_TINY = 0x01
MYSQL_TYPE_SHORT = 0x02
MYSQL_TYPE_LONG = 0x03
MYSQL_TYPE_FLOAT = 0x04
MYSQL_TYPE_DOUBLE = 0x05
MYSQL_TYPE_TIMESTAMP = 0x07
MYSQL_TYPE_LONGLONG = 0x08
MYSQL_TYPE_DATE = 0x0A
MYSQL_TYPE_NEWDECIMAL = 0xF6
MYSQL_TYPE_BLOB = 0xFC
MYSQL_TYPE_VAR_STRING = 0xFD


# ---- primitive encoders -----------------------------------------------------

def lenenc_int(n: int) -> bytes:
    """Length-encoded integer (the protocol's variable-size int)."""
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def lenenc_str(s: bytes) -> bytes:
    return lenenc_int(len(s)) + s


def read_lenenc_int(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode a length-encoded int at ``pos``; returns (value, next_pos)."""
    first = buf[pos]
    if first < 0xFB:
        return first, pos + 1
    if first == 0xFC:
        return struct.unpack_from("<H", buf, pos + 1)[0], pos + 3
    if first == 0xFD:
        return int.from_bytes(buf[pos + 1 : pos + 4], "little"), pos + 4
    return struct.unpack_from("<Q", buf, pos + 1)[0], pos + 9


def read_lenenc_str(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = read_lenenc_int(buf, pos)
    return buf[pos : pos + n], pos + n


# ---- packet framing ---------------------------------------------------------

def write_packet(wfile, payload: bytes, seq: int) -> int:
    """Frame ``payload`` (3-byte LE length + sequence id); returns next seq.

    Payloads >= 2^24-1 bytes are split into 0xFFFFFF-sized frames with
    continuation packets, per the MySQL protocol: a resultset is
    row-at-a-time so row COUNT is bounded by max_rows, but row WIDTH is
    not — one large text/binary cell would otherwise emit a 3-byte length
    that wraps and desynchronizes stock clients (ADVICE r4).  A payload of
    exactly k*0xFFFFFF bytes is followed by an empty terminating frame, as
    the protocol requires.
    """
    max_frame = 0xFFFFFF
    offset = 0
    while True:
        chunk = payload[offset : offset + max_frame]
        wfile.write(struct.pack("<I", len(chunk))[:3] + bytes([seq & 0xFF]) + chunk)
        seq = (seq + 1) & 0xFF
        offset += len(chunk)
        if len(chunk) < max_frame:  # last frame (possibly empty terminator)
            return seq


MAX_PACKET = 64 * 1024 * 1024  # server-side max_allowed_packet analog


def read_packet(rfile, max_packet: int = MAX_PACKET) -> tuple[bytes, int] | None:
    """Read one logical packet; returns (payload, seq) or None on EOF.

    Frames of exactly 0xFFFFFF bytes are continued by the next frame
    (mirror of the split in ``write_packet``); seq returned is the last
    frame's sequence id. Reassembly is capped at ``max_packet`` bytes —
    continuation frames mean a client could otherwise stream unbounded
    data into server memory before the first return (the cap mirrors
    MySQL's max_allowed_packet); exceeding it drops the connection.
    """
    parts: list[bytes] = []
    total = 0
    while True:
        head = rfile.read(4)
        if len(head) < 4:
            return None
        length = int.from_bytes(head[:3], "little")
        seq = head[3]
        payload = rfile.read(length) if length else b""
        if length and len(payload) < length:
            return None
        parts.append(payload)
        total += length
        if total > max_packet:
            return None  # oversized logical packet: treat as protocol error
        if length < 0xFFFFFF:
            return b"".join(parts), seq


# ---- server-side packets ----------------------------------------------------

def build_handshake_v10(thread_id: int, auth_seed: bytes) -> bytes:
    """Protocol::HandshakeV10 greeting. ``auth_seed`` must be 20 bytes."""
    assert len(auth_seed) == 20
    caps = SERVER_CAPABILITIES
    return (
        b"\x0a"  # protocol version 10
        + SERVER_VERSION.encode() + b"\x00"
        + struct.pack("<I", thread_id)
        + auth_seed[:8] + b"\x00"  # auth-plugin-data part 1 + filler
        + struct.pack("<H", caps & 0xFFFF)
        + bytes([CHARSET_UTF8_GENERAL_CI])
        + struct.pack("<H", SERVER_STATUS_AUTOCOMMIT)
        + struct.pack("<H", caps >> 16)
        + bytes([21])  # auth-plugin-data total length (20 + NUL)
        + b"\x00" * 10  # reserved
        + auth_seed[8:] + b"\x00"  # part 2, NUL-terminated
        + b"mysql_native_password\x00"
    )


def build_ok(affected: int = 0, status: int = SERVER_STATUS_AUTOCOMMIT) -> bytes:
    return (
        b"\x00"
        + lenenc_int(affected)
        + lenenc_int(0)  # last insert id
        + struct.pack("<H", status)
        + struct.pack("<H", 0)  # warnings
    )


def build_eof(status: int = SERVER_STATUS_AUTOCOMMIT) -> bytes:
    return b"\xfe" + struct.pack("<H", 0) + struct.pack("<H", status)


def build_err(message: str, code: int = 1105, sqlstate: str = "HY000") -> bytes:
    return (
        b"\xff"
        + struct.pack("<H", code)
        + b"#" + sqlstate.encode()[:5].ljust(5, b"0")
        + message.encode()[:480]
    )


def parse_handshake_response(payload: bytes) -> dict:
    """Protocol::HandshakeResponse41 — enough to log who connected; the
    server accepts any credentials (reference proxy does the same:
    sql/proxy.py's IdentityProvider allows all)."""
    caps = struct.unpack_from("<I", payload, 0)[0]
    pos = 4 + 4 + 1 + 23  # caps, max packet size, charset, reserved
    end = payload.index(b"\x00", pos)
    user = payload[pos:end].decode(errors="replace")
    out = {"capabilities": caps, "user": user, "database": None}
    pos = end + 1
    if caps & CLIENT_SECURE_CONNECTION and pos < len(payload):
        alen = payload[pos]
        pos += 1 + alen
    if caps & CLIENT_CONNECT_WITH_DB and pos < len(payload):
        try:
            end = payload.index(b"\x00", pos)
            out["database"] = payload[pos:end].decode(errors="replace")
        except ValueError:
            pass
    return out


# ---- Spark type -> wire type ------------------------------------------------

def mysql_column_type(dt: T.DataType) -> int:
    if isinstance(dt, (T.ByteType, T.BooleanType)):
        return MYSQL_TYPE_TINY
    if isinstance(dt, T.ShortType):
        return MYSQL_TYPE_SHORT
    if isinstance(dt, T.IntegerType):
        return MYSQL_TYPE_LONG
    if isinstance(dt, T.LongType):
        return MYSQL_TYPE_LONGLONG
    if isinstance(dt, T.FloatType):
        return MYSQL_TYPE_FLOAT
    if isinstance(dt, T.DoubleType):
        return MYSQL_TYPE_DOUBLE
    if isinstance(dt, T.DecimalType):
        return MYSQL_TYPE_NEWDECIMAL
    if isinstance(dt, T.DateType):
        return MYSQL_TYPE_DATE
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return MYSQL_TYPE_TIMESTAMP
    if isinstance(dt, T.BinaryType):
        return MYSQL_TYPE_BLOB
    return MYSQL_TYPE_VAR_STRING  # strings, arrays/structs rendered as text


def build_column_definition(name: str, col_type: int) -> bytes:
    """Protocol::ColumnDefinition41."""
    nm = name.encode()
    return (
        lenenc_str(b"def")  # catalog — literally "def" per spec
        + lenenc_str(b"")  # schema
        + lenenc_str(b"")  # table
        + lenenc_str(b"")  # org_table
        + lenenc_str(nm)  # name
        + lenenc_str(nm)  # org_name
        + b"\x0c"  # fixed-length fields marker
        + struct.pack("<H", CHARSET_UTF8_GENERAL_CI)
        + struct.pack("<I", 1024)  # display length
        + bytes([col_type])
        + struct.pack("<H", 0)  # flags
        + b"\x00"  # decimals
        + b"\x00\x00"  # filler
    )


def text_cell(v) -> bytes | None:
    """Protocol::Text value rendering (None -> NULL marker by caller)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return b"1" if v else b"0"
    if isinstance(v, datetime):
        return v.isoformat(sep=" ").encode()
    if isinstance(v, date):
        return v.isoformat().encode()
    if isinstance(v, Decimal):
        return str(v).encode()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return str(v).encode()


def write_resultset(wfile, columns, types, rows, seq: int) -> int:
    """Text-protocol resultset: count, definitions, EOF, rows, EOF."""
    seq = write_packet(wfile, lenenc_int(len(columns)), seq)
    for name, tp in zip(columns, types):
        seq = write_packet(wfile, build_column_definition(name, tp), seq)
    seq = write_packet(wfile, build_eof(), seq)
    for row in rows:
        out = b""
        for v in row:
            cell = text_cell(v)
            out += b"\xfb" if cell is None else lenenc_str(cell)
        seq = write_packet(wfile, out, seq)
    return write_packet(wfile, build_eof(), seq)


# ---- server -----------------------------------------------------------------

def serve_mysql(
    spark: SparkSession,
    manifest: Manifest,
    host: str = "127.0.0.1",
    port: int = 0,
    max_rows: int = 1000,
):
    """MySQL-wire server over the shared SqlSession (the reference's
    `dbt-osmosis sql serve` analog, natively coded — no protocol library).
    Returns the server; caller drives serve_forever()."""

    counter = {"n": 0}

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            counter["n"] += 1
            # deterministic, connection-unique seed (no auth is checked, but
            # real clients scramble their password against it, so it must be
            # present and 20 bytes)
            seed = (b"dbt-osmosis-spark-seed" * 2)[:20]
            seq = write_packet(self.wfile, build_handshake_v10(counter["n"], seed), 0)
            resp = read_packet(self.rfile)
            if resp is None:
                return
            payload, cseq = resp
            try:
                parse_handshake_response(payload)
            except Exception:
                write_packet(self.wfile, build_err("malformed handshake"), cseq + 1)
                return
            write_packet(self.wfile, build_ok(), cseq + 1)

            session = SqlSession(spark=spark, manifest=manifest)
            while True:
                pkt = read_packet(self.rfile)
                if pkt is None:
                    return
                payload, _ = pkt
                if not payload:
                    return
                cmd = payload[0]
                if cmd == COM_QUIT:
                    return
                if cmd in (COM_PING, COM_INIT_DB):
                    write_packet(self.wfile, build_ok(), 1)
                    continue
                if cmd != COM_QUERY:
                    write_packet(
                        self.wfile, build_err(f"unsupported command 0x{cmd:02x}", 1047), 1
                    )
                    continue
                sql = payload[1:].decode(errors="replace")
                try:
                    df = session.query(sql)
                    if df is None:  # intercepted comment DDL
                        write_packet(self.wfile, build_ok(affected=0), 1)
                        continue
                    rows = df.limit(max_rows).collect()
                    types = [mysql_column_type(f.dataType) for f in df.schema.fields]
                    write_resultset(self.wfile, list(df.columns), types, rows, 1)
                except Exception as exc:  # noqa: BLE001 - wire boundary
                    write_packet(
                        self.wfile, build_err(f"{type(exc).__name__}: {exc}"), 1
                    )

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    return Server((host, port), Handler)
