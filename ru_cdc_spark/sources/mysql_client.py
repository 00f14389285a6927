"""A real MySQL client-protocol implementation over TCP sockets.

This closes the engine's last identity gap with the reference: the
reference IS a wire-protocol client (``/root/reference/src/mysql.rs:47-94``
connect + handshake + auth, ``src/protocal.rs:21-170`` packet codecs,
``src/protocal.rs:277-293`` COM_BINLOG_DUMP). Everything here is built
from the public MySQL client/server protocol documentation — packet
framing, HandshakeV10, HandshakeResponse41, ``mysql_native_password``
scramble, text result sets, and the binlog dump command — in pure-stdlib
Python (``socket``, ``struct``, ``hashlib``).

Parity map (reference -> here):

| ``mysql.rs:96-138`` read_package (4-byte header + seq)  | ``PacketIO.read_packet`` |
| ``protocal.rs:21-77`` HandshakeV10 decode               | ``decode_handshake_v10`` |
| ``mysql.rs:480-494`` native_password_auth               | ``native_password_scramble`` |
| ``protocal.rs:80-126`` HandshakeResponse41 encode        | ``encode_handshake_response41`` |
| ``protocal.rs:138-170`` AuthSwitch req/resp             | ``decode_auth_switch_request`` |
| ``protocal.rs:173-186`` ComQuery                        | ``encode_com_query`` |
| ``mysql.rs:140-178`` read_text_result_set               | ``MySQLConnection.read_text_result_set`` |
| ``protocal.rs:228-272`` ColDef decode                   | ``decode_col_def`` |
| ``protocal.rs:277-293`` ComBinLogDump                   | ``encode_com_binlog_dump`` |
| ``protocal.rs:296-302`` ComPing                         | ``encode_com_ping`` |
| ``mysql.rs:185-215`` desc_table -> FieldMeta            | ``MySQLConnection.desc_table`` |
| ``main.rs:109-130`` serve loop (TM starts, rows append) | ``iter_binlog_frames`` |

Two deliberate fixes of reference quirks (documented, not copied):

* the reference sends the **password** as the auth-plugin-name field of
  HandshakeResponse41 (``mysql.rs:66`` ``plugin_name: Some(passwd)``)
  and an empty auth response, forcing the server down the AuthSwitch
  path; we send the correct plugin name plus the scramble inline, and
  ALSO answer an AuthSwitchRequest if the server sends one.
* the reference decodes binlog events straight from the packet payload
  (``main.rs:113`` ``EventRaw::decode(buf.payload)``), ignoring the
  network stream's leading ``0x00`` OK byte that a real server prefixes
  to every streamed event; ``iter_binlog_events`` strips it.

The fixture server at the bottom speaks the same protocol from the
server side so the client can be exercised over REAL sockets without a
MySQL install: handshake with a configurable nonce, scramble
verification, COM_QUERY for the session-setup statements the reference
issues (``main.rs:82-88``), SHOW MASTER STATUS / SHOW BINLOG EVENTS,
DESC, and COM_BINLOG_DUMP streaming a virtual binlog built from the
deterministic frame fixture.

Scale shape: connections are made **executor-side** (one socket per
task, see ``mysql_socket_source``); the driver never proxies bytes. The
client is I/O-bound glue — all row decoding stays in the existing
Arrow-batched ``binlog_wire`` codec.
"""

from __future__ import annotations

import hashlib
import socket
import struct
import threading
import zlib
from dataclasses import dataclass, field

# --------------------------------------------------------------------------
# capability flags (public protocol values)
# --------------------------------------------------------------------------

CLIENT_LONG_PASSWORD = 0x00000001
CLIENT_FOUND_ROWS = 0x00000002
CLIENT_LONG_FLAG = 0x00000004
CLIENT_CONNECT_WITH_DB = 0x00000008
CLIENT_COMPRESS = 0x00000020
CLIENT_PROTOCOL_41 = 0x00000200
CLIENT_SSL = 0x00000800
CLIENT_RESERVED = 0x00004000
CLIENT_SECURE_CONNECTION = 0x00008000  # the reference's CLIENT_RESERVED2
CLIENT_PLUGIN_AUTH = 0x00080000
CLIENT_CONNECT_ATTRS = 0x00100000
CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA = 0x00200000
CLIENT_DEPRECATE_EOF = 0x01000000
CLIENT_ZSTD_COMPRESSION_ALGORITHM = 0x04000000

# the exact capability set the reference requests (mysql.rs:55-62)
REFERENCE_CLIENT_CAPS = (
    CLIENT_LONG_PASSWORD
    | CLIENT_PROTOCOL_41
    | CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA
    | CLIENT_RESERVED
    | CLIENT_SECURE_CONNECTION
    | CLIENT_DEPRECATE_EOF
    | CLIENT_PLUGIN_AUTH
)

SERVER_CAPS = (
    CLIENT_LONG_PASSWORD
    | CLIENT_PROTOCOL_41
    | CLIENT_CONNECT_WITH_DB
    | CLIENT_RESERVED
    | CLIENT_SECURE_CONNECTION
    | CLIENT_PLUGIN_AUTH
    | CLIENT_CONNECT_ATTRS
    | CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA
    | CLIENT_DEPRECATE_EOF
    | CLIENT_COMPRESS
    | CLIENT_ZSTD_COMPRESSION_ALGORITHM
)

COM_QUIT = 0x01
COM_QUERY = 0x03
COM_PING = 0x0E
COM_BINLOG_DUMP = 0x12
COM_REGISTER_SLAVE = 0x15

NATIVE_PASSWORD_PLUGIN = "mysql_native_password"

MAX_PACKET = 0xFFFFFF  # 3-byte length ceiling -> packet continuation


# --------------------------------------------------------------------------
# length-encoded integers / strings (protocol primitives)
# --------------------------------------------------------------------------


def write_lenenc_int(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + n.to_bytes(2, "little")
    if n < 1 << 24:
        return b"\xfd" + n.to_bytes(3, "little")
    return b"\xfe" + n.to_bytes(8, "little")


def read_lenenc_int(b: bytes, off: int) -> tuple[int, int]:
    first = b[off]
    if first < 0xFB:
        return first, off + 1
    if first == 0xFC:
        return int.from_bytes(b[off + 1:off + 3], "little"), off + 3
    if first == 0xFD:
        return int.from_bytes(b[off + 1:off + 4], "little"), off + 4
    if first == 0xFE:
        return int.from_bytes(b[off + 1:off + 9], "little"), off + 9
    raise ValueError(f"invalid lenenc prefix 0x{first:02x}")


def write_lenenc_bytes(s: bytes) -> bytes:
    return write_lenenc_int(len(s)) + s


def read_lenenc_bytes(b: bytes, off: int) -> tuple[bytes, int]:
    n, off = read_lenenc_int(b, off)
    return b[off:off + n], off + n


def read_nul_str(b: bytes, off: int) -> tuple[str, int]:
    end = b.index(0, off)
    return b[off:end].decode("utf-8", "replace"), end + 1


# --------------------------------------------------------------------------
# packet framing: 3-byte LE length + 1-byte sequence id
# --------------------------------------------------------------------------


def encode_packet(seq: int, payload: bytes) -> bytes:
    """Frame one payload; oversized payloads split into MAX_PACKET
    continuations per the public protocol (the reference caps at
    max_packet_size instead, mysql.rs:47)."""
    out = bytearray()
    view = memoryview(payload)
    while True:
        chunk = view[:MAX_PACKET]
        out += len(chunk).to_bytes(3, "little") + bytes([seq & 0xFF]) + chunk
        seq += 1
        view = view[len(chunk):]
        if len(chunk) < MAX_PACKET:
            break
    return bytes(out)


class PacketIO:
    """Blocking packet reader/writer over a connected socket — the
    Python analog of ``read_package``/``write_package``
    (mysql.rs:96-186)."""

    RECV_CHUNK = 1 << 16

    def __init__(self, sock: socket.socket) -> None:
        self.sock = sock
        self.seq = 0
        self._buf = bytearray()
        self._off = 0

    def unconsumed(self) -> int:
        """Bytes buffered past the last packet (TLS-boundary check)."""
        return len(self._buf) - self._off

    def settimeout(self, t) -> None:
        self.sock.settimeout(t)

    def _read_exact(self, n: int, exact: bool = False) -> bytes:
        # buffered: drain the socket in 64 KiB chunks so a stream of
        # small packets (binlog events) costs ~1 syscall per chunk, not
        # per packet. Consumption advances an OFFSET — `del buf[:n]`
        # per packet shifts the whole buffer, which turns a chunk of
        # tiny packets quadratic in the chunk size. ``exact`` reads no
        # further than requested — used at the TLS upgrade boundary,
        # where overbuffering would steal the ClientHello bytes from
        # the ssl wrapper.
        while len(self._buf) - self._off < n:
            want = (n - (len(self._buf) - self._off)) if exact else \
                max(self.RECV_CHUNK, n)
            chunk = self.sock.recv(want)
            if not chunk:
                raise ConnectionError("peer closed mid-packet")
            if self._off:
                del self._buf[:self._off]  # compact only on refill
                self._off = 0
            self._buf += chunk
        out = bytes(self._buf[self._off:self._off + n])
        self._off += n
        return out

    def read_packet(self, exact: bool = False) -> bytes:
        # fast path: the whole (non-continued) packet is already
        # buffered — one slice, no _read_exact call pair. This is the
        # steady state when a result set streams thousands of small
        # packets per 64 KiB recv.
        buf, off = self._buf, self._off
        avail = len(buf) - off
        if avail >= 4:
            length = int.from_bytes(buf[off:off + 3], "little")
            if length < MAX_PACKET and avail >= 4 + length:
                self.seq = (buf[off + 3] + 1) & 0xFF
                end = off + 4 + length
                self._off = end
                return bytes(buf[off + 4:end])
        payload = bytearray()
        while True:
            header = self._read_exact(4, exact)
            length = int.from_bytes(header[:3], "little")
            self.seq = (header[3] + 1) & 0xFF
            payload += self._read_exact(length, exact)
            if length < MAX_PACKET:
                return bytes(payload)

    def write_packet(self, payload: bytes, seq: int | None = None) -> None:
        if seq is None:
            seq = self.seq
        self.sock.sendall(encode_packet(seq, payload))
        self.seq = (seq + 1) & 0xFF

    def reset_seq(self) -> None:
        self.seq = 0
        # the compressed protocol keeps its OWN sequence, also reset at
        # each command boundary (the published framing rule)
        reset = getattr(self.sock, "reset_seq", None)
        if reset is not None:
            reset()


class CompressedStream:
    """Socket adapter implementing the MySQL compressed protocol
    framing (negotiated via CLIENT_COMPRESS / zlib or MySQL 8.0.18+
    CLIENT_ZSTD_COMPRESSION_ALGORITHM / zstd): every frame is
    ``3-byte compressed length | 1-byte compressed seq | 3-byte
    uncompressed length`` where uncompressed length 0 marks a payload
    stored RAW — used when the payload is below the documented 50-byte
    threshold or compression doesn't shrink it. The payload itself is a
    run of ordinary MySQL packets, so layering this UNDER PacketIO
    leaves all packet logic (continuation, sequence, buffered fast
    path) untouched; both client and fixture server wrap their socket
    in one of these after the authentication OK, which is where real
    connectors switch modes.

    zstd frames are decompressed by functions/zstd.py (any conformant
    frame, e.g. a real server's libzstd output) and compressed through
    pyarrow's bundled libzstd when importable — so the two directions
    cross-validate spec decoder against reference compressor — with
    the store-mode encoder as fallback."""

    MIN_COMPRESS = 50  # MySQL's documented don't-bother threshold

    def __init__(self, sock: socket.socket, algorithm: str = "zlib",
                 level: int = 3) -> None:
        if algorithm not in ("zlib", "zstd"):
            raise ValueError(f"unknown compression {algorithm!r}")
        self.sock = sock
        self.algorithm = algorithm
        self.level = level
        self.seq = 0
        self._buf = b""
        self._off = 0

    def reset_seq(self) -> None:
        self.seq = 0

    # -- outgoing ------------------------------------------------------

    def _compress(self, data: bytes) -> bytes:
        if self.algorithm == "zlib":
            return zlib.compress(data, self.level)
        try:
            import pyarrow as _pa

            return _pa.Codec("zstd").compress(data).to_pybytes()
        except ImportError:
            from ru_cdc_spark.functions.zstd import compress

            return compress(data)

    def sendall(self, data: bytes) -> None:
        view = memoryview(data)
        while True:
            chunk = bytes(view[:MAX_PACKET - 1])
            view = view[len(chunk):]
            ulen = 0
            body = chunk
            if len(chunk) >= self.MIN_COMPRESS:
                comp = self._compress(chunk)
                if len(comp) < len(chunk):
                    ulen, body = len(chunk), comp
            self.sock.sendall(len(body).to_bytes(3, "little")
                              + bytes([self.seq & 0xFF])
                              + ulen.to_bytes(3, "little") + body)
            self.seq += 1
            if not view:
                return

    # -- incoming ------------------------------------------------------

    def _read_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("peer closed mid-frame")
            buf += chunk
        return bytes(buf)

    def recv(self, n: int) -> bytes:
        if self._off >= len(self._buf):
            hdr = self._read_exact(7)
            clen = int.from_bytes(hdr[:3], "little")
            self.seq = (hdr[3] + 1) & 0xFF
            ulen = int.from_bytes(hdr[4:7], "little")
            body = self._read_exact(clen)
            if ulen == 0:
                self._buf = body
            elif self.algorithm == "zlib":
                self._buf = zlib.decompress(body)
            else:
                from ru_cdc_spark.functions.zstd import decompress

                self._buf = decompress(body)
            if ulen and len(self._buf) != ulen:
                raise ConnectionError(
                    f"compressed frame declared {ulen} bytes, "
                    f"inflated to {len(self._buf)}")
            self._off = 0
        out = self._buf[self._off:self._off + n]
        self._off += len(out)
        return out

    # -- passthroughs PacketIO/TLS code paths touch ---------------------

    def close(self) -> None:
        self.sock.close()

    def settimeout(self, t) -> None:
        self.sock.settimeout(t)


# --------------------------------------------------------------------------
# handshake packets
# --------------------------------------------------------------------------


@dataclass
class HandshakeV10:
    protocol_version: int
    server_version: str
    thread_id: int
    caps: int
    charset: int
    status: int
    auth_plugin_name: str
    auth_plugin_data: bytes  # the full 20-byte nonce


def decode_handshake_v10(b: bytes) -> HandshakeV10:
    """protocal.rs:21-77, from the public HandshakeV10 layout."""
    if b[0] != 10:
        raise ValueError(f"unsupported protocol version {b[0]}")
    server_version, off = read_nul_str(b, 1)
    thread_id = int.from_bytes(b[off:off + 4], "little")
    off += 4
    nonce = bytearray(b[off:off + 8])
    off += 8 + 1  # 8 nonce bytes + filler
    cap_low = b[off:off + 2]
    off += 2
    charset = b[off]
    off += 1
    status = int.from_bytes(b[off:off + 2], "little")
    off += 2
    cap_high = b[off:off + 2]
    off += 2
    auth_data_len = b[off]
    off += 1 + 10  # len byte + 10 reserved
    caps = int.from_bytes(cap_low + cap_high, "little")
    if auth_data_len > 0:
        # part 2 is max(13, auth_data_len - 8) bytes, NUL-terminated;
        # strip exactly ONE terminator (servers keep nonce bytes in
        # 0x01-0x7F precisely so the terminator is unambiguous)
        part2_len = max(13, auth_data_len - 8)
        part2 = b[off:off + part2_len]
        if part2.endswith(b"\x00"):
            part2 = part2[:-1]
        nonce += part2
        off += part2_len
    plugin = ""
    if caps & CLIENT_PLUGIN_AUTH:
        plugin, off = read_nul_str(b, off)
    return HandshakeV10(10, server_version, thread_id, caps, charset,
                        status, plugin, bytes(nonce))


def encode_handshake_v10(server_version: str, thread_id: int, nonce: bytes,
                         caps: int = SERVER_CAPS, charset: int = 255,
                         status: int = 2,
                         plugin: str = NATIVE_PASSWORD_PLUGIN) -> bytes:
    """Server side of the same layout (for the fixture server).
    ``plugin`` is the server's default auth plugin — MySQL 8 advertises
    ``caching_sha2_password`` here."""
    assert len(nonce) == 20
    caps_le = caps.to_bytes(4, "little")
    p = bytearray([10])
    p += server_version.encode() + b"\x00"
    p += thread_id.to_bytes(4, "little")
    p += nonce[:8] + b"\x00"
    p += caps_le[:2]
    p += bytes([charset]) + status.to_bytes(2, "little") + caps_le[2:]
    p += bytes([21])  # auth_data_len: 20 nonce bytes + NUL
    p += b"\x00" * 10
    p += nonce[8:] + b"\x00"  # part 2: 12 bytes + NUL = 13
    p += plugin.encode() + b"\x00"
    return bytes(p)


def native_password_scramble(password: bytes, nonce: bytes) -> bytes:
    """``mysql_native_password``: SHA1(pw) XOR SHA1(nonce + SHA1(SHA1(pw)))
    — the exact construction in mysql.rs:480-494 (public algorithm)."""
    if not password:
        return b""
    h1 = hashlib.sha1(password).digest()
    h2 = hashlib.sha1(h1).digest()
    rhs = hashlib.sha1(nonce[:20] + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, rhs))


def encode_handshake_response41(user: str, auth_resp: bytes,
                                caps: int = REFERENCE_CLIENT_CAPS,
                                max_packet_size: int = 1 << 24,
                                charset: int = 255,
                                database: str | None = None,
                                plugin: str = NATIVE_PASSWORD_PLUGIN,
                                zstd_level: int = 3) -> bytes:
    """protocal.rs:93-126 layout (with the plugin-name bug fixed: the
    reference writes the PASSWORD into this field, mysql.rs:66). With
    CLIENT_ZSTD_COMPRESSION_ALGORITHM set, the response carries one
    trailing compression-level byte (the 8.0.18+ extension)."""
    if database is not None:
        caps |= CLIENT_CONNECT_WITH_DB
    p = bytearray()
    p += caps.to_bytes(4, "little")
    p += max_packet_size.to_bytes(4, "little")
    p += bytes([charset])
    p += b"\x00" * 23
    p += user.encode() + b"\x00"
    if caps & CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA:
        p += write_lenenc_bytes(auth_resp)
    else:
        p += bytes([len(auth_resp)]) + auth_resp
    if caps & CLIENT_CONNECT_WITH_DB:
        p += (database or "").encode() + b"\x00"
    if caps & CLIENT_PLUGIN_AUTH:
        p += plugin.encode() + b"\x00"
    if caps & CLIENT_ZSTD_COMPRESSION_ALGORITHM:
        p += bytes([zstd_level])
    return bytes(p)


@dataclass
class HandshakeResponse41:
    caps: int
    max_packet_size: int
    charset: int
    user: str
    auth_resp: bytes
    database: str | None
    plugin: str
    zstd_level: int | None = None


def decode_handshake_response41(b: bytes) -> HandshakeResponse41:
    caps = int.from_bytes(b[:4], "little")
    max_packet = int.from_bytes(b[4:8], "little")
    charset = b[8]
    off = 9 + 23
    user, off = read_nul_str(b, off)
    if caps & CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA:
        auth_resp, off = read_lenenc_bytes(b, off)
    else:
        n = b[off]
        auth_resp = b[off + 1:off + 1 + n]
        off += 1 + n
    database = None
    if caps & CLIENT_CONNECT_WITH_DB:
        database, off = read_nul_str(b, off)
    plugin = ""
    if caps & CLIENT_PLUGIN_AUTH and off < len(b):
        plugin, off = read_nul_str(b, off)
    zstd_level = None
    if caps & CLIENT_ZSTD_COMPRESSION_ALGORITHM and off < len(b):
        zstd_level = b[off]
    return HandshakeResponse41(caps, max_packet, charset, user, auth_resp,
                               database, plugin, zstd_level)


def encode_auth_switch_request(plugin: str, nonce: bytes) -> bytes:
    """0xFE tag + plugin NUL-str + data (protocal.rs:129-158)."""
    return b"\xfe" + plugin.encode() + b"\x00" + nonce + b"\x00"


def decode_auth_switch_request(b: bytes) -> tuple[str, bytes]:
    if b[0] != 0xFE:
        raise ValueError("not an AuthSwitchRequest")
    plugin, off = read_nul_str(b, 1)
    data = b[off:]
    # exactly ONE trailing NUL is the terminator; a nonce may
    # legitimately END in 0x00 bytes, so rstrip would corrupt it and
    # every derived scramble
    if data.endswith(b"\x00"):
        data = data[:-1]
    return plugin, data


# --------------------------------------------------------------------------
# OK / ERR / EOF
# --------------------------------------------------------------------------


@dataclass
class OkPacket:
    header: int
    affected_rows: int
    last_insert_id: int
    status_flags: int
    warnings: int
    info: str = ""

    @property
    def is_ok(self) -> bool:
        return self.header == 0x00


def encode_ok(affected: int = 0, last_insert_id: int = 0,
              status: int = 2, warnings: int = 0, header: int = 0x00) -> bytes:
    return (bytes([header]) + write_lenenc_int(affected)
            + write_lenenc_int(last_insert_id)
            + status.to_bytes(2, "little") + warnings.to_bytes(2, "little"))


def decode_ok(b: bytes) -> OkPacket:
    header = b[0]
    affected, off = read_lenenc_int(b, 1)
    last_id, off = read_lenenc_int(b, off)
    status = int.from_bytes(b[off:off + 2], "little")
    warnings = int.from_bytes(b[off + 2:off + 4], "little")
    info = b[off + 4:].decode("utf-8", "replace")
    return OkPacket(header, affected, last_id, status, warnings, info)


class MySQLError(RuntimeError):
    def __init__(self, code: int, sql_state: str, message: str) -> None:
        super().__init__(f"[{code}] ({sql_state}) {message}")
        self.code = code
        self.sql_state = sql_state
        self.message = message


def encode_err(code: int, message: str, sql_state: str = "HY000") -> bytes:
    return (b"\xff" + code.to_bytes(2, "little") + b"#"
            + sql_state.encode()[:5].ljust(5, b"0") + message.encode())


def decode_err(b: bytes) -> MySQLError:
    code = int.from_bytes(b[1:3], "little")
    off = 3
    sql_state = "HY000"
    if len(b) > 3 and b[3] == ord("#"):
        sql_state = b[4:9].decode("ascii", "replace")
        off = 9
    return MySQLError(code, sql_state, b[off:].decode("utf-8", "replace"))


def is_eof_packet(b: bytes) -> bool:
    return len(b) < 9 and b[:1] == b"\xfe"


# --------------------------------------------------------------------------
# commands
# --------------------------------------------------------------------------


def encode_com_query(sql: str) -> bytes:
    return bytes([COM_QUERY]) + sql.encode()


def encode_com_ping() -> bytes:
    return bytes([COM_PING])


def encode_com_quit() -> bytes:
    return bytes([COM_QUIT])


def encode_com_binlog_dump(pos: int, server_id: int, filename: str,
                           flags: int = 0) -> bytes:
    """protocal.rs:285-293: 0x12 + pos(4) + flags(2) + server_id(4) +
    filename (no terminator)."""
    return (bytes([COM_BINLOG_DUMP]) + pos.to_bytes(4, "little")
            + flags.to_bytes(2, "little") + server_id.to_bytes(4, "little")
            + filename.encode())


def decode_com_binlog_dump(b: bytes) -> tuple[int, int, int, str]:
    pos = int.from_bytes(b[1:5], "little")
    flags = int.from_bytes(b[5:7], "little")
    server_id = int.from_bytes(b[7:11], "little")
    filename = b[11:].decode()
    return pos, flags, server_id, filename


# --------------------------------------------------------------------------
# text result sets
# --------------------------------------------------------------------------


@dataclass
class ColDef:
    """protocal.rs:228-272 / public ColumnDefinition41."""
    name: str
    ty: int = 253  # VAR_STRING
    schema: str = ""
    table: str = ""
    charset: int = 255
    column_length: int = 255
    flags: int = 0
    decimals: int = 0


def encode_col_def(c: ColDef) -> bytes:
    p = bytearray()
    for s in ("def", c.schema, c.table, c.table, c.name, c.name):
        p += write_lenenc_bytes(s.encode())
    p += write_lenenc_int(0x0C)
    p += c.charset.to_bytes(2, "little")
    p += c.column_length.to_bytes(4, "little")
    p += bytes([c.ty])
    p += c.flags.to_bytes(2, "little")
    p += bytes([c.decimals])
    p += b"\x00\x00"
    return bytes(p)


def decode_col_def(b: bytes) -> ColDef:
    off = 0
    strs = []
    for _ in range(6):
        s, off = read_lenenc_bytes(b, off)
        strs.append(s.decode("utf-8", "replace"))
    _, off = read_lenenc_int(b, off)  # fixed-length-fields length (0x0c)
    charset = int.from_bytes(b[off:off + 2], "little")
    column_length = int.from_bytes(b[off + 2:off + 6], "little")
    ty = b[off + 6]
    flags = int.from_bytes(b[off + 7:off + 9], "little")
    decimals = b[off + 9]
    return ColDef(name=strs[4], ty=ty, schema=strs[1], table=strs[2],
                  charset=charset, column_length=column_length, flags=flags,
                  decimals=decimals)


def encode_text_row(values: list[str | None]) -> bytes:
    p = bytearray()
    for v in values:
        if v is None:
            p += b"\xfb"
        else:
            p += write_lenenc_bytes(str(v).encode())
    return bytes(p)


def decode_text_row(b: bytes, n_cols: int) -> list[str | None]:
    """protocal.rs:204-225 TextResult::decode — with the reference's
    NULL quirk fixed: it pushes the literal string ``"NULL"`` for 0xfb
    cells (protocal.rs:213); we keep None."""
    out: list[str | None] = []
    off = 0
    blen = len(b)
    append = out.append
    while off < blen and len(out) < n_cols:
        first = b[off]
        if first == 0xFB:
            append(None)
            off += 1
        elif first < 0xFB:
            # short-cell fast path (lenenc < 251 — every metadata row):
            # inlining read_lenenc_bytes halves the per-cell cost on a
            # 16k-row SHOW BINLOG EVENTS listing
            start = off + 1
            off = start + first
            append(b[start:off].decode("utf-8", "replace"))
        else:
            s, off = read_lenenc_bytes(b, off)
            append(s.decode("utf-8", "replace"))
    return out


@dataclass
class TextResultSet:
    col_defs: list[ColDef]
    rows: list[list[str | None]]

    @property
    def column_names(self) -> list[str]:
        return [c.name for c in self.col_defs]


@dataclass
class FieldMeta:
    """mysql.rs:200-206 — name/type/is_pk from DESC rows."""
    name: str
    field_type: str
    is_pk: bool


# --------------------------------------------------------------------------
# binary protocol (prepared statements) — COM_STMT_PREPARE / EXECUTE /
# CLOSE and the Binary Protocol Resultset Row, from the published docs.
# The reference speaks only the text protocol; every ORM and connector
# uses this one.
# --------------------------------------------------------------------------

COM_STMT_PREPARE = 0x16
COM_STMT_EXECUTE = 0x17
COM_STMT_CLOSE = 0x19

TYPE_TINY = 0x01
TYPE_LONG = 0x03
TYPE_DOUBLE = 0x05
TYPE_NULL = 0x06
TYPE_LONGLONG = 0x08
TYPE_NEWDECIMAL = 0xF6
TYPE_VAR_STRING = 0xFD


def encode_binary_value(ty: int, v) -> bytes:
    """One Binary Protocol Value (NULLs travel in the row bitmap, never
    here)."""
    if ty == TYPE_TINY:
        return struct.pack("<b", int(v))
    if ty == TYPE_LONG:
        return struct.pack("<i", int(v))
    if ty == TYPE_LONGLONG:
        return struct.pack("<q", int(v))
    if ty == TYPE_DOUBLE:
        return struct.pack("<d", float(v))
    if ty in (TYPE_VAR_STRING, TYPE_NEWDECIMAL):
        # DECIMAL rides the binary protocol as a lenenc STRING (the
        # published rule — exactness is the point, never a float)
        b = v if isinstance(v, bytes) else str(v).encode()
        return write_lenenc_bytes(b)
    raise ValueError(f"unsupported binary type 0x{ty:02x}")


def decode_binary_value(ty: int, b: bytes, off: int):
    if ty == TYPE_TINY:
        return struct.unpack_from("<b", b, off)[0], off + 1
    if ty == TYPE_LONG:
        return struct.unpack_from("<i", b, off)[0], off + 4
    if ty == TYPE_LONGLONG:
        return struct.unpack_from("<q", b, off)[0], off + 8
    if ty == TYPE_DOUBLE:
        return struct.unpack_from("<d", b, off)[0], off + 8
    if ty in (TYPE_VAR_STRING, TYPE_NEWDECIMAL):
        s, off = read_lenenc_bytes(b, off)
        return s.decode("utf-8", "replace"), off
    raise ValueError(f"unsupported binary type 0x{ty:02x}")


def encode_binary_row(values: list, col_types: list[int]) -> bytes:
    """Binary Protocol Resultset Row: 0x00 header, NULL bitmap with a
    2-bit offset (the published quirk), then non-NULL values in column
    order by the RESULT SET's declared column types."""
    n = len(values)
    bitmap = bytearray((n + 7 + 2) // 8)
    body = bytearray()
    for i, (v, ty) in enumerate(zip(values, col_types)):
        if v is None:
            bitmap[(i + 2) // 8] |= 1 << ((i + 2) % 8)
        else:
            body += encode_binary_value(ty, v)
    return b"\x00" + bytes(bitmap) + bytes(body)


def decode_binary_row(b: bytes, col_types: list[int]) -> list:
    if b[:1] != b"\x00":
        raise ValueError("not a binary resultset row")
    n = len(col_types)
    bm_len = (n + 7 + 2) // 8
    bitmap = b[1:1 + bm_len]
    off = 1 + bm_len
    out = []
    for i, ty in enumerate(col_types):
        if bitmap[(i + 2) // 8] & (1 << ((i + 2) % 8)):
            out.append(None)
        else:
            v, off = decode_binary_value(ty, b, off)
            out.append(v)
    return out


@dataclass
class PreparedStatement:
    stmt_id: int
    n_params: int
    col_defs: list[ColDef]


# --------------------------------------------------------------------------
# the client connection
# --------------------------------------------------------------------------


class MySQLConnection:
    """Client connection speaking the real wire protocol
    (mysql.rs:20-222 shape: connect/auth, query, desc, binlog dump)."""

    def __init__(self, io: PacketIO) -> None:
        self.io = io
        self.handshake: HandshakeV10 | None = None
        # set once a COM_BINLOG_DUMP(_GTID) has been issued: the
        # connection is in dump mode and close() must NOT send COM_QUIT
        # — a real replica just disconnects, and a semisync master
        # blocked in its ACK read would misread the quit packet (0x01)
        # as a malformed ACK (the COM_QUIT-vs-ACK race).
        self._dumping = False

    # -- connect / auth ----------------------------------------------------

    @classmethod
    def connect(cls, host: str, port: int, user: str, password: str,
                database: str | None = None, timeout: float = 60.0,
                max_packet_size: int = 1 << 24,
                ssl_ca: str | None = None,
                ssl_hostname: str | None = None,
                compress: str | None = None) -> "MySQLConnection":
        """``ssl_ca`` switches the connection to TLS (CLIENT_SSL): the
        client sends an SSLRequest after the handshake, wraps the
        socket, and VERIFIES the server certificate against the given
        CA bundle (hostname check included) — what every managed MySQL
        requires and the reference cannot do at all.

        ``compress`` = "zlib" (CLIENT_COMPRESS, the classic --compress
        protocol) or "zstd" (8.0.18+ CLIENT_ZSTD_COMPRESSION_ALGORITHM)
        switches all post-auth traffic to compressed framing — what a
        WAN-replica CDC reader enables so a binlog dump's bytes on the
        wire shrink by the payload's compressibility.

        ``timeout`` bounds dial + handshake only (see below). The 60s
        default gives the threaded fixture server's accept/handshake
        lane headroom when 32 tasks dial at once on a loaded host; the
        happy-path handshake is a couple of local round trips."""
        sock = socket.create_connection((host, port), timeout=timeout)
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        conn = cls(PacketIO(sock))
        conn._authenticate(user, password, database, max_packet_size,
                           ssl_ca=ssl_ca,
                           ssl_hostname=ssl_hostname or host,
                           compress=compress)
        # the timeout bounds CONNECT only; a deadline left armed on the
        # established socket turns any >timeout read stall (contended
        # host, long dump) into a fatal 2013 "lost connection" — every
        # post-connect recv must block indefinitely, like libmysql
        conn.io.settimeout(None)
        return conn

    @staticmethod
    def _scramble_for(plugin: str, password: bytes, nonce: bytes) -> bytes:
        from ru_cdc_spark.sources.sha2_auth import (
            CACHING_SHA2_PLUGIN,
            sha2_scramble,
        )

        if plugin == CACHING_SHA2_PLUGIN:
            return sha2_scramble(password, nonce)
        if plugin == NATIVE_PASSWORD_PLUGIN:
            return native_password_scramble(password, nonce)
        raise MySQLError(1045, "28000",
                         f"unsupported auth plugin {plugin}")

    def _start_tls(self, caps_extra: int, max_packet_size: int,
                   ssl_ca: str, hostname: str) -> None:
        """Send SSLRequest (the 32-byte HandshakeResponse prefix with
        CLIENT_SSL set) and wrap the socket; packet sequence CONTINUES
        across the upgrade, per protocol."""
        import ssl as _ssl

        caps = (REFERENCE_CLIENT_CAPS | CLIENT_SSL | caps_extra)
        req = (caps.to_bytes(4, "little")
               + max_packet_size.to_bytes(4, "little")
               + bytes([255]) + b"\x00" * 23)
        self.io.write_packet(req)
        ctx = _ssl.create_default_context(cafile=ssl_ca)
        tls = ctx.wrap_socket(self.io.sock, server_hostname=hostname)
        self.io.sock = tls

    def _authenticate(self, user: str, password: str,
                      database: str | None, max_packet_size: int,
                      ssl_ca: str | None = None,
                      ssl_hostname: str | None = None,
                      compress: str | None = None) -> None:
        """Auth state machine speaking BOTH ``mysql_native_password``
        and MySQL 8's default ``caching_sha2_password`` (the plugin the
        reference lacks — its connect path fails against a stock 2026
        server; sha2_auth.py documents the public algorithms):

        * follow the server's advertised plugin in the response;
        * AuthSwitchRequest (0xFE) re-scrambles under the new plugin,
          in either direction;
        * AuthMoreData (0x01): 0x03 = fast-auth success (OK follows);
          0x04 = perform full authentication — request the server's
          RSA public key (0x02), then send RSA-OAEP(password NUL XOR
          nonce), the no-TLS exchange libmysqlclient performs.
        """
        from ru_cdc_spark.sources.sha2_auth import (
            PERFORM_FULL_AUTHENTICATION,
            FAST_AUTH_SUCCESS,
            REQUEST_PUBLIC_KEY,
            oaep_encrypt,
            parse_public_key_pem,
            xor_password_nonce,
        )

        hs = decode_handshake_v10(self.io.read_packet())
        self.handshake = hs
        caps = REFERENCE_CLIENT_CAPS
        if compress == "zlib":
            if not hs.caps & CLIENT_COMPRESS:
                raise MySQLError(2026, "HY000",
                                 "server does not support compression")
            caps |= CLIENT_COMPRESS
        elif compress == "zstd":
            if not hs.caps & CLIENT_ZSTD_COMPRESSION_ALGORITHM:
                raise MySQLError(2026, "HY000",
                                 "server does not support zstd")
            caps |= CLIENT_ZSTD_COMPRESSION_ALGORITHM
        elif compress is not None:
            raise ValueError(f"unknown compression {compress!r}")
        if ssl_ca is not None:
            if not hs.caps & CLIENT_SSL:
                raise MySQLError(2026, "HY000",
                                 "server does not support TLS")
            # the SSLRequest advertises the SAME caps as the full
            # response that follows it (incl. any compression bit)
            self._start_tls(caps & ~REFERENCE_CLIENT_CAPS,
                            max_packet_size, ssl_ca,
                            ssl_hostname or "localhost")
            caps |= CLIENT_SSL
        plugin = hs.auth_plugin_name or NATIVE_PASSWORD_PLUGIN
        nonce = hs.auth_plugin_data
        scramble = self._scramble_for(plugin, password.encode(), nonce)
        resp = encode_handshake_response41(
            user, scramble, caps=caps, max_packet_size=max_packet_size,
            database=database, plugin=plugin)
        self.io.write_packet(resp)
        while True:
            pkt = self.io.read_packet()
            if pkt[:1] == b"\xff":
                raise decode_err(pkt)
            if pkt[:1] == b"\xfe" and len(pkt) > 9:  # AuthSwitchRequest
                plugin, sw_nonce = decode_auth_switch_request(pkt)
                nonce = sw_nonce or nonce
                self.io.write_packet(
                    self._scramble_for(plugin, password.encode(), nonce))
                continue
            if pkt[:1] == b"\x01":  # AuthMoreData
                status = pkt[1] if len(pkt) > 1 else -1
                if status == FAST_AUTH_SUCCESS:
                    continue  # OK packet follows
                if status == PERFORM_FULL_AUTHENTICATION:
                    import ssl as _ssl

                    if isinstance(self.io.sock, _ssl.SSLSocket):
                        # over TLS, real clients skip the RSA exchange
                        # and send the NUL-terminated password in the
                        # clear INSIDE the encrypted channel
                        self.io.write_packet(password.encode() + b"\x00")
                        continue
                    self.io.write_packet(bytes([REQUEST_PUBLIC_KEY]))
                    key_pkt = self.io.read_packet()
                    if key_pkt[:1] == b"\xff":
                        raise decode_err(key_pkt)
                    n, e = parse_public_key_pem(key_pkt[1:])
                    self.io.write_packet(oaep_encrypt(
                        n, e, xor_password_nonce(password.encode(),
                                                 nonce)))
                    continue
                raise MySQLError(2013, "HY000",
                                 f"unexpected AuthMoreData 0x{status:02x}")
            ok = decode_ok(pkt)
            if not ok.is_ok:
                raise MySQLError(2013, "HY000", "unexpected auth reply")
            if compress is not None:
                # compressed framing starts with the first command
                # AFTER the auth exchange (connector behavior); the
                # server must not have pipelined anything past the OK
                assert not self.io.unconsumed(), \
                    "overread across the compression boundary"
                self.io.sock = CompressedStream(self.io.sock, compress)
            return

    # -- simple commands ---------------------------------------------------

    def _command(self, payload: bytes) -> None:
        self.io.reset_seq()
        self.io.write_packet(payload)

    def ping(self) -> bool:
        self._command(encode_com_ping())
        return decode_ok(self._read_or_raise()).is_ok

    def _read_or_raise(self) -> bytes:
        pkt = self.io.read_packet()
        if pkt[:1] == b"\xff":
            raise decode_err(pkt)
        return pkt

    def execute(self, sql: str) -> OkPacket:
        """COM_QUERY for statements that return OK (SET etc.,
        main.rs:82-84)."""
        self._command(encode_com_query(sql))
        return decode_ok(self._read_or_raise())

    def query(self, sql: str) -> TextResultSet:
        """COM_QUERY returning a text result set (mysql.rs:140-178)."""
        self._command(encode_com_query(sql))
        return self.read_text_result_set()

    def read_text_result_set(self) -> TextResultSet:
        first = self._read_or_raise()
        if first[:1] == b"\x00":  # OK — statement had no result set
            return TextResultSet([], [])
        n_cols, _ = read_lenenc_int(first, 0)
        col_defs = [decode_col_def(self._read_or_raise())
                    for _ in range(n_cols)]
        # CLIENT_DEPRECATE_EOF negotiated: no EOF after the defs, and the
        # row stream ends with an OK carrying the 0xFE header — the same
        # ``first == 0xfe && len < 9`` test the reference row loop uses
        # (mysql.rs:158-171)
        rows: list[list[str | None]] = []
        while True:
            pkt = self._read_or_raise()
            if is_eof_packet(pkt):
                break
            rows.append(decode_text_row(pkt, n_cols))
        return TextResultSet(col_defs, rows)

    # -- binary protocol (prepared statements) ----------------------------

    def stmt_prepare(self, sql: str) -> PreparedStatement:
        """COM_STMT_PREPARE -> PreparedStatement. Response layout
        (published): status 0x00, stmt_id u32, num_columns u16,
        num_params u16, filler, warning_count u16; then the param and
        column definition blocks (no EOF packets — DEPRECATE_EOF)."""
        self._command(bytes([COM_STMT_PREPARE]) + sql.encode())
        first = self._read_or_raise()
        stmt_id = int.from_bytes(first[1:5], "little")
        n_cols = int.from_bytes(first[5:7], "little")
        n_params = int.from_bytes(first[7:9], "little")
        for _ in range(n_params):
            self._read_or_raise()  # param definitions (placeholders)
        col_defs = [decode_col_def(self._read_or_raise())
                    for _ in range(n_cols)]
        return PreparedStatement(stmt_id, n_params, col_defs)

    def stmt_execute(self, stmt: PreparedStatement,
                     params: tuple = ()) -> list[list]:
        """COM_STMT_EXECUTE -> typed rows from a Binary Protocol
        Resultset (NULL bitmap offset 2, values per the result's
        declared column types). Integer params ship as LONGLONG,
        None as NULL (in the param bitmap), everything else as
        VAR_STRING — the classic client binding rule."""
        p = bytearray([COM_STMT_EXECUTE])
        p += stmt.stmt_id.to_bytes(4, "little")
        p += b"\x00"  # CURSOR_TYPE_NO_CURSOR
        p += (1).to_bytes(4, "little")  # iteration count, always 1
        if stmt.n_params:
            if len(params) != stmt.n_params:
                raise ValueError(
                    f"statement takes {stmt.n_params} params, "
                    f"got {len(params)}")
            null_bm = bytearray((stmt.n_params + 7) // 8)
            types = bytearray()
            vals = bytearray()
            for i, v in enumerate(params):
                if v is None:
                    null_bm[i // 8] |= 1 << (i % 8)
                    types += bytes([TYPE_NULL, 0])
                elif isinstance(v, int):
                    types += bytes([TYPE_LONGLONG, 0])
                    vals += encode_binary_value(TYPE_LONGLONG, v)
                else:
                    types += bytes([TYPE_VAR_STRING, 0])
                    vals += encode_binary_value(TYPE_VAR_STRING, v)
            p += bytes(null_bm) + b"\x01" + bytes(types) + bytes(vals)
        self._command(bytes(p))
        first = self._read_or_raise()
        if first[:1] == b"\x00":  # OK — no result set
            return []
        n_cols, _ = read_lenenc_int(first, 0)
        col_defs = [decode_col_def(self._read_or_raise())
                    for _ in range(n_cols)]
        col_types = [c.ty for c in col_defs]
        rows: list[list] = []
        while True:
            pkt = self._read_or_raise()
            if is_eof_packet(pkt):
                break
            rows.append(decode_binary_row(pkt, col_types))
        return rows

    def stmt_close(self, stmt: PreparedStatement) -> None:
        """COM_STMT_CLOSE — fire and forget (no server response)."""
        self.io.reset_seq()
        self.io.write_packet(
            bytes([COM_STMT_CLOSE])
            + stmt.stmt_id.to_bytes(4, "little"), seq=0)

    # -- catalog helpers (S5/S8 parity) ------------------------------------

    def desc_table(self, db: str, table: str) -> list[FieldMeta]:
        """mysql.rs:185-215: DESC db.table -> FieldMeta list, pk =
        Key column startswith PRI (mysql.rs:216-222)."""
        rs = self.query(f"desc {db}.{table}")
        out = []
        for row in rs.rows:
            key = row[3] or ""
            out.append(FieldMeta(name=row[0] or "",
                                 field_type=row[1] or "",
                                 is_pk=key.startswith("PRI")))
        return out

    def show_master_status(self) -> tuple[str, int]:
        """main.rs:86-90: SHOW MASTER STATUS -> (file, position)."""
        rs = self.query("show master status")
        if not rs.rows:
            raise MySQLError(1220, "HY000", "no master status")
        return rs.rows[0][0] or "", int(rs.rows[0][1] or 0)

    def disable_checksum_var(self) -> OkPacket:
        """main.rs:82-84 session setup before the dump."""
        return self.execute(
            "set @master_binlog_checksum= @@global.binlog_checksum")

    # -- binlog dump -------------------------------------------------------

    def register_slave(self, server_id: int = 100,
                       report_host: str = "", report_port: int = 0)\
            -> OkPacket:
        """COM_REGISTER_SLAVE — a real replica announces itself (shows
        up in SHOW SLAVE HOSTS) before requesting a dump; some
        deployments require it. Layout: server_id u32, lenenc-ish
        1-byte-length host/user/password strings, port u16, rank u32,
        master_id u32 (all public protocol)."""
        host_b = report_host.encode()
        payload = (bytes([COM_REGISTER_SLAVE])
                   + server_id.to_bytes(4, "little")
                   + bytes([len(host_b)]) + host_b
                   + bytes([0])          # user
                   + bytes([0])          # password
                   + report_port.to_bytes(2, "little")
                   + (0).to_bytes(4, "little")   # replication rank
                   + (0).to_bytes(4, "little"))  # master id
        self._command(payload)
        return decode_ok(self._read_or_raise())

    def binlog_dump(self, filename: str, pos: int,
                    server_id: int = 100,
                    flags: int = 1,  # BINLOG_DUMP_NON_BLOCK
                    semi_sync: bool = False):
        """Issue COM_BINLOG_DUMP (main.rs:94-100) and yield raw event
        bytes. Each network packet is ``0x00`` + event; EOF(0xfe) or
        socket close ends the stream.

        ``flags`` defaults to BINLOG_DUMP_NON_BLOCK (0x01): the server
        answers EOF at the log tail — the batch-read discipline every
        slice/snapshot path here uses. ``flags=0`` is the real
        replica's BLOCKING tail: the server never EOFs, streams each
        appended event live, and fills idle stretches with
        HEARTBEAT(27) events (skip type 27; its log_pos advances the
        resume coordinate). The caller ends a blocking dump by hanging
        up.

        ``semi_sync=True`` runs the rpl_semi_sync slave side (the
        published semisync framing): the replica registers with
        ``SET @rpl_semi_sync_slave = 1`` before the dump, every event
        packet then carries a 2-byte header (0xEF magic + need-ack
        flag), and each flagged event is ACKed back — 0xEF + u64
        log_pos + filename — BEFORE the master proceeds, giving the
        master its AFTER_SYNC durability wait. The reference has no
        semi-sync support at all."""
        if semi_sync:
            self.query("SET @rpl_semi_sync_slave = 1")
        ack_file = filename  # updated by ROTATE events mid-stream
        checksum_bytes = 0   # set by FORMAT_DESCRIPTION mid-stream
        self._dumping = True
        self._command(encode_com_binlog_dump(pos, server_id,
                                             filename, flags))
        while True:
            try:
                pkt = self.io.read_packet()
            except (ConnectionError, OSError) as exc:
                # an unexpected disconnect is NOT end-of-stream: a
                # server that crashed mid-dump must fail the read task
                # loudly (silently truncating a slice would commit an
                # offset past undelivered frames — data loss). Clean
                # termination is the EOF packet below.
                raise MySQLError(
                    2013, "HY000",
                    "lost connection mid-dump (no EOF packet)") from exc
            if not pkt:
                raise MySQLError(2013, "HY000",
                                 "empty packet mid-dump")
            tag = pkt[0]
            if tag == 0xFF:
                raise decode_err(pkt)
            if tag == 0xFE and len(pkt) < 9:
                return  # EOF — server ended the stream
            if tag != 0x00:
                raise ValueError(f"unexpected binlog packet tag 0x{tag:02x}")
            if not semi_sync:
                yield pkt[1:]
                continue
            # semisync framing: 0x00 0xEF <flag> <event>
            if len(pkt) < 3 or pkt[1] != 0xEF:
                raise ValueError(
                    "semi-sync enabled but event packet lacks the "
                    "0xEF semisync header")
            need_ack, ev = pkt[2], pkt[3:]
            if ev[4] == 15:
                # FORMAT_DESCRIPTION announces whether every later
                # event carries a CRC32 trailer — the rotate-filename
                # slice below must drop it, or the 4 checksum bytes
                # (arbitrary, rarely all-zero) would be appended to
                # ack_file and every subsequent ACK would name a
                # corrupted file
                from ru_cdc_spark.sources.binlog_wire import (
                    decode_format_description,
                )

                checksum_bytes = decode_format_description(
                    ev)["checksum_bytes"]
            if ev[4] == 4 and len(ev) > 27 + checksum_bytes:
                # ROTATE: ACK coordinates move to the announced file
                # (covers filename="" dumps via the artificial rotate)
                name_end = len(ev) - checksum_bytes
                ack_file = ev[27:name_end].rstrip(b"\x00").decode(
                    "utf-8", "replace")
            yield ev
            if need_ack & 1:
                # ACK the commit position (event-header log_pos) so
                # the master's AFTER_SYNC wait completes
                log_pos = int.from_bytes(ev[13:17], "little")
                self.io.reset_seq()
                self.io.write_packet(
                    b"\xef" + log_pos.to_bytes(8, "little")
                    + ack_file.encode(), seq=0)

    def binlog_dump_gtid(self, gtid_set: dict, filename: str = "",
                         pos: int = 4, server_id: int = 100):
        """COM_BINLOG_DUMP_GTID: the server streams only transactions
        NOT in ``gtid_set`` (the auto-positioning resume modern MySQL
        replicas use — no file/pos bookkeeping; the reference only
        speaks the legacy 0x12 form). Yields raw event bytes like
        ``binlog_dump``."""
        self._dumping = True
        self._command(encode_com_binlog_dump_gtid(server_id, filename,
                                                  pos, gtid_set))
        while True:
            try:
                pkt = self.io.read_packet()
            except (ConnectionError, OSError) as exc:
                raise MySQLError(
                    2013, "HY000",
                    "lost connection mid-dump (no EOF packet)") from exc
            if not pkt:
                raise MySQLError(2013, "HY000", "empty packet mid-dump")
            tag = pkt[0]
            if tag == 0xFF:
                raise decode_err(pkt)
            if tag == 0xFE and len(pkt) < 9:
                return
            if tag != 0x00:
                raise ValueError(f"unexpected binlog packet tag 0x{tag:02x}")
            yield pkt[1:]

    def close(self) -> None:
        # dump-mode connections hang up without COM_QUIT: once a
        # COM_BINLOG_DUMP is issued the server is no longer reading
        # commands — a semisync master mid-ACK-wait would count the
        # quit packet as a bad ACK (observed flake: slice reader
        # closing at its range bound while the master awaited an ack).
        if not self._dumping:
            try:
                self._command(encode_com_quit())
            except OSError:
                pass
        try:
            self.io.sock.close()
        except OSError:
            pass

    def __enter__(self) -> "MySQLConnection":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# --------------------------------------------------------------------------
# event-stream helpers
# --------------------------------------------------------------------------

# binlog event type codes used by the serve loop (main.rs:115-122)
_TABLE_MAP = 19
_ROWS_EVENTS = (30, 31, 32, 39)
_ROTATE = 4
_FORMAT_DESCRIPTION = 15
_HEARTBEAT = 27


def event_header(ev: bytes) -> tuple[int, int, int]:
    """(event_type, event_size, log_pos) from a 19-byte header."""
    return ev[4], int.from_bytes(ev[9:13], "little"), \
        int.from_bytes(ev[13:17], "little")


def split_events(blob: bytes) -> list[bytes]:
    """Cut a concatenation of binlog events at header-declared sizes."""
    out, off = [], 0
    while off < len(blob):
        size = int.from_bytes(blob[off + 9:off + 13], "little")
        out.append(blob[off:off + size])
        off += size
    return out


def strip_checksum(ev: bytes) -> bytes:
    """Drop a BINLOG_CHECKSUM_ALG_CRC32 trailer (4 bytes) and patch the
    header's event_size so downstream decoders see a checksum-free
    event. The CRC is verified before stripping — a corrupt event
    raises instead of silently mis-decoding."""
    import zlib

    size = int.from_bytes(ev[9:13], "little")
    claimed = int.from_bytes(ev[size - 4:size], "little")
    if zlib.crc32(ev[:size - 4]) & 0xFFFFFFFF != claimed:
        raise ValueError("binlog event CRC32 mismatch")
    body = ev[:size - 4]
    return body[:9] + (size - 4).to_bytes(4, "little") + body[13:]


def iter_binlog_frames(events) -> "list[tuple[int, bytes]]":
    """Reassemble (TABLE_MAP + ROWS) frames from an event stream — the
    exact serve-loop discipline (main.rs:109-130): type 19 starts a
    packet, types 30/31/32 append and emit; ROTATE(4) resets; control
    events pass through. Returns [(log_pos, frame_bytes)] where the
    frame is TM+ROWS, the shape ``binlog_wire.decode_frame`` takes."""
    frames: list[tuple[int, bytes]] = []
    current_tm: bytes | None = None
    for ev in events:
        etype, _, log_pos = event_header(ev)
        if etype == _TABLE_MAP:
            current_tm = ev
        elif etype in _ROWS_EVENTS and current_tm is not None:
            frames.append((log_pos, current_tm + ev))
        elif etype == _ROTATE:
            current_tm = None
    return frames


# --------------------------------------------------------------------------
# connection pooling (X5 parity)
# --------------------------------------------------------------------------


class ConnectionPool:
    """Per-process idle-connection pool — the reference's connection
    recycling (X5; its executor threads reuse long-lived connections,
    executor.rs worker loop). ``acquire`` revalidates an idle connection
    with COM_PING and silently discards dead ones; ``release`` returns a
    CLEAN connection to the pool (a connection that streamed a dump and
    hung up mid-stream is dirty and must be closed, not recycled).

    Used for the metadata path (SHOW MASTER STATUS / SHOW BINLOG EVENTS
    / DESC) where the streaming source would otherwise dial a fresh TCP
    + handshake every micro-batch trigger."""

    MAX_IDLE_PER_KEY = 4

    _idle: dict[tuple, list["MySQLConnection"]] = {}
    _lock = __import__("threading").Lock()

    @staticmethod
    def _key(host: str, port: int, user: str, password: str,
             ssl_ca: str | None = None,
             compress: str | None = None) -> tuple:
        """Pool key includes a password digest: a caller supplying a
        different/wrong password must never be handed a connection
        authenticated under another credential (which would mask auth
        failures). Digest, not plaintext — keys show up in debuggers."""
        import hashlib

        return (host, port, user,
                hashlib.sha256(password.encode()).hexdigest(), ssl_ca,
                compress)

    @classmethod
    def acquire(cls, host: str, port: int, user: str, password: str,
                ssl_ca: str | None = None,
                ssl_hostname: str | None = None,
                compress: str | None = None) -> "MySQLConnection":
        key = cls._key(host, port, user, password, ssl_ca, compress)
        while True:
            with cls._lock:
                pool = cls._idle.get(key, [])
                conn = pool.pop() if pool else None
            if conn is None:
                return MySQLConnection.connect(
                    host, port, user, password, ssl_ca=ssl_ca,
                    ssl_hostname=ssl_hostname, compress=compress)
            try:
                if conn.ping():
                    return conn
            except (OSError, MySQLError, ConnectionError):
                pass
            conn.close()  # dead idle connection: discard, try next

    @classmethod
    def release(cls, conn: "MySQLConnection", host: str, port: int,
                user: str, password: str,
                ssl_ca: str | None = None,
                compress: str | None = None) -> None:
        key = cls._key(host, port, user, password, ssl_ca, compress)
        with cls._lock:
            pool = cls._idle.setdefault(key, [])
            if len(pool) < cls.MAX_IDLE_PER_KEY:
                pool.append(conn)
                return
        conn.close()

    @classmethod
    def clear(cls) -> None:
        with cls._lock:
            pools, cls._idle = cls._idle, {}
        for pool in pools.values():
            for conn in pool:
                conn.close()


class pooled_connection:
    """``with pooled_connection(host, port, user, pw) as conn:`` —
    acquire from the pool, release back on clean exit, close on error
    (an exception may leave the wire mid-message)."""

    def __init__(self, host: str, port: int, user: str,
                 password: str, ssl_ca: str | None = None,
                 ssl_hostname: str | None = None,
                 compress: str | None = None) -> None:
        self.key = (host, port, user)
        self.password = password
        self.ssl_ca = ssl_ca
        self.ssl_hostname = ssl_hostname
        self.compress = compress
        self.conn: MySQLConnection | None = None

    def __enter__(self) -> "MySQLConnection":
        self.conn = ConnectionPool.acquire(
            *self.key, self.password, ssl_ca=self.ssl_ca,
            ssl_hostname=self.ssl_hostname, compress=self.compress)
        return self.conn

    def __exit__(self, exc_type, *exc) -> None:
        assert self.conn is not None
        if exc_type is None:
            ConnectionPool.release(self.conn, *self.key, self.password,
                                   ssl_ca=self.ssl_ca,
                                   compress=self.compress)
        else:
            self.conn.close()


# --------------------------------------------------------------------------
# COM_BINLOG_DUMP_GTID (modern GTID-set resume; beyond the reference)
# --------------------------------------------------------------------------

COM_BINLOG_DUMP_GTID = 0x1E


def encode_gtid_set(gtid_set: dict[bytes, list[tuple[int, int]]]) -> bytes:
    """Binary SID_block encoding (public layout): n_sids u8, then per
    sid: 16-byte uuid, n_intervals u8, each interval start u8 / end u8
    with END EXCLUSIVE (gno range [start, end))."""
    out = bytearray(len(gtid_set).to_bytes(8, "little"))
    for sid, intervals in gtid_set.items():
        assert len(sid) == 16
        out += sid
        out += len(intervals).to_bytes(8, "little")
        for start, end in intervals:
            out += start.to_bytes(8, "little") + end.to_bytes(8, "little")
    return bytes(out)


def decode_gtid_set(b: bytes, off: int = 0
                    ) -> dict[bytes, list[tuple[int, int]]]:
    n_sids = int.from_bytes(b[off:off + 8], "little")
    off += 8
    out: dict[bytes, list[tuple[int, int]]] = {}
    for _ in range(n_sids):
        sid = b[off:off + 16]
        off += 16
        n_iv = int.from_bytes(b[off:off + 8], "little")
        off += 8
        ivs = []
        for _ in range(n_iv):
            start = int.from_bytes(b[off:off + 8], "little")
            end = int.from_bytes(b[off + 8:off + 16], "little")
            ivs.append((start, end))
            off += 16
        out[sid] = ivs
    return out


def gtid_in_set(gtid_set: dict[bytes, list[tuple[int, int]]],
                sid: bytes, gno: int) -> bool:
    return any(start <= gno < end
               for start, end in gtid_set.get(sid, []))


def encode_com_binlog_dump_gtid(server_id: int, filename: str, pos: int,
                                gtid_set: dict, flags: int = 0) -> bytes:
    """0x1E + flags u2 + server_id u4 + name_len u4 + name + pos u8 +
    data_size u4 + encoded gtid set (the public layout)."""
    data = encode_gtid_set(gtid_set)
    name = filename.encode()
    return (bytes([COM_BINLOG_DUMP_GTID])
            + flags.to_bytes(2, "little")
            + server_id.to_bytes(4, "little")
            + len(name).to_bytes(4, "little") + name
            + pos.to_bytes(8, "little")
            + len(data).to_bytes(4, "little") + data)


def decode_com_binlog_dump_gtid(b: bytes) -> tuple[int, int, str, int, dict]:
    flags = int.from_bytes(b[1:3], "little")
    server_id = int.from_bytes(b[3:7], "little")
    name_len = int.from_bytes(b[7:11], "little")
    off = 11
    filename = b[off:off + name_len].decode()
    off += name_len
    pos = int.from_bytes(b[off:off + 8], "little")
    off += 8 + 4  # pos + data_size
    return flags, server_id, filename, pos, decode_gtid_set(b, off)
