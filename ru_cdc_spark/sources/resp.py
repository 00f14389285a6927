"""Redis wire protocol (RESP2) client + in-repo server fixture.

The reference ships a working Redis producer — ``RPUSH topic payload``
per change message (``/root/reference/src/message_queue.rs:137-172``).
The container has no redis client library, so — like the MySQL path
(sources/mysql_client.py) — the protocol is implemented directly from
the public RESP specification: commands are arrays of bulk strings;
replies are simple strings (``+``), errors (``-``), integers (``:``),
bulk strings (``$``), or arrays (``*``), all CRLF-framed.

``RespServerFixture`` is the other end of the socket for tests: an
in-memory list store speaking RESP over real TCP (RPUSH/LPUSH/LRANGE/
LLEN/DEL/PING/FLUSHALL/QUIT), so the sink's per-row RPUSH semantics are
exercised end to end without a Redis install.

Scale shape: one client connection per executor partition (see
``streaming/sinks.write_batch_to_sink``) — the driver never relays
payloads; RESP pipelining (send N commands, then read N replies) keeps
the per-row round trip off the hot path.
"""

from __future__ import annotations

import socket
import threading

_CRLF = b"\r\n"


class RespError(RuntimeError):
    pass


def encode_command(*args: str | bytes) -> bytes:
    """A command is an array of bulk strings: ``*N␍␊($len␍␊arg␍␊)*N``."""
    out = bytearray(b"*%d\r\n" % len(args))
    for a in args:
        b = a if isinstance(a, bytes) else str(a).encode()
        out += b"$%d\r\n" % len(b) + b + _CRLF
    return bytes(out)


class _LineReader:
    def __init__(self, sock: socket.socket) -> None:
        self.sock = sock
        self.buf = bytearray()

    def read_line(self) -> bytes:
        while True:
            idx = self.buf.find(_CRLF)
            if idx >= 0:
                line = bytes(self.buf[:idx])
                del self.buf[:idx + 2]
                return line
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("peer closed")
            self.buf += chunk

    def read_exact(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("peer closed")
            self.buf += chunk
        out = bytes(self.buf[:n])
        del self.buf[:n]
        return out


def read_reply(r: _LineReader):
    """One RESP reply -> python value (str / int / bytes / list / None);
    error replies raise RespError."""
    line = r.read_line()
    tag, rest = line[:1], line[1:]
    if tag == b"+":
        return rest.decode()
    if tag == b"-":
        raise RespError(rest.decode())
    if tag == b":":
        return int(rest)
    if tag == b"$":
        n = int(rest)
        if n == -1:
            return None
        data = r.read_exact(n)
        r.read_exact(2)  # trailing CRLF
        return data
    if tag == b"*":
        n = int(rest)
        if n == -1:
            return None
        return [read_reply(r) for _ in range(n)]
    raise RespError(f"bad RESP tag {tag!r}")


class RespClient:
    """Minimal Redis client over a socket (command surface the CDC sink
    and its tests need; ``command`` covers the rest)."""

    def __init__(self, sock: socket.socket) -> None:
        self.sock = sock
        self.reader = _LineReader(sock)

    @classmethod
    def connect(cls, host: str, port: int,
                timeout: float = 10.0) -> "RespClient":
        sock = socket.create_connection((host, port), timeout=timeout)
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        return cls(sock)

    def command(self, *args):
        self.sock.sendall(encode_command(*args))
        return read_reply(self.reader)

    def pipeline(self, commands: list[tuple]) -> list:
        """Send every command, then read every reply — RESP pipelining,
        the batched form a per-partition sink writer should use."""
        self.sock.sendall(b"".join(encode_command(*c) for c in commands))
        return [read_reply(self.reader) for _ in commands]

    def ping(self) -> bool:
        return self.command("PING") == "PONG"

    def rpush(self, key: str, value: str | bytes) -> int:
        """The reference sink's exact call shape
        (message_queue.rs:155-166)."""
        return self.command("RPUSH", key, value)

    def llen(self, key: str) -> int:
        return self.command("LLEN", key)

    def lrange(self, key: str, start: int = 0, stop: int = -1) -> list:
        return self.command("LRANGE", key, start, stop)

    def delete(self, key: str) -> int:
        return self.command("DEL", key)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def __enter__(self) -> "RespClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# --------------------------------------------------------------------------
# server fixture
# --------------------------------------------------------------------------


class RespServerFixture:
    """In-memory list store speaking RESP over real TCP (test stand-in
    for a Redis server; threaded, daemon lifecycle like the MySQL
    fixture server)."""

    def __init__(self, host: str = "127.0.0.1") -> None:
        self.host = host
        self.port = 0
        self.lists: dict[str, list[bytes]] = {}
        self._lock = threading.Lock()
        self._sock: socket.socket | None = None
        self._stop = threading.Event()

    def start(self) -> "RespServerFixture":
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((self.host, 0))
        self.port = self._sock.getsockname()[1]
        self._sock.listen(64)
        threading.Thread(target=self._accept_loop, daemon=True).start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass

    def __enter__(self) -> "RespServerFixture":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def _accept_loop(self) -> None:
        assert self._sock is not None
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    def _serve(self, conn: socket.socket) -> None:
        reader = _LineReader(conn)
        try:
            while not self._stop.is_set():
                try:
                    cmd = read_reply(reader)
                except (ConnectionError, OSError):
                    return
                if not isinstance(cmd, list) or not cmd:
                    conn.sendall(b"-ERR protocol error\r\n")
                    continue
                reply = self._dispatch([
                    c.decode() if isinstance(c, (bytes, bytearray)) else c
                    for c in cmd[:1]] + list(cmd[1:]))
                conn.sendall(reply)
                if cmd[0].upper() == b"QUIT":
                    return
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _dispatch(self, cmd: list) -> bytes:
        name = cmd[0].upper()
        args = cmd[1:]

        def key(i):
            a = args[i]
            return a.decode() if isinstance(a, (bytes, bytearray)) else a

        with self._lock:
            if name == "PING":
                return b"+PONG\r\n"
            if name == "QUIT":
                return b"+OK\r\n"
            if name == "FLUSHALL":
                self.lists.clear()
                return b"+OK\r\n"
            if name in ("RPUSH", "LPUSH"):
                lst = self.lists.setdefault(key(0), [])
                vals = [a if isinstance(a, bytes) else str(a).encode()
                        for a in args[1:]]
                if name == "RPUSH":
                    lst.extend(vals)
                else:
                    for v in vals:
                        lst.insert(0, v)
                return b":%d\r\n" % len(lst)
            if name == "LLEN":
                return b":%d\r\n" % len(self.lists.get(key(0), []))
            if name == "DEL":
                n = sum(1 for i in range(len(args))
                        if self.lists.pop(key(i), None) is not None)
                return b":%d\r\n" % n
            if name == "LRANGE":
                lst = self.lists.get(key(0), [])
                start, stop = int(args[1]), int(args[2])
                if start < 0:
                    start += len(lst)
                if stop < 0:
                    stop += len(lst)
                vals = lst[max(0, start):stop + 1]
                out = bytearray(b"*%d\r\n" % len(vals))
                for v in vals:
                    out += b"$%d\r\n" % len(v) + v + _CRLF
                return bytes(out)
        return b"-ERR unknown command '%s'\r\n" % name.encode()
