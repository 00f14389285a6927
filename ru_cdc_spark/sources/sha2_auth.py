"""``caching_sha2_password`` — MySQL 8.0's default auth plugin, from
the public protocol specification.

The reference client only speaks ``mysql_native_password``
(``/root/reference/src/mysql.rs:480-494``), so against a stock MySQL
8.0 server (default ``caching_sha2_password`` since 8.0.4) its connect
path fails immediately. This module closes that gap rather than
inheriting it. Everything here is the published algorithm:

* **scramble** (fast path): ``XOR(SHA256(pw),
  SHA256(SHA256(SHA256(pw)) || nonce))`` — sent in the handshake
  response; a server holding the cached ``SHA256(SHA256(pw))`` digest
  can verify it without the plaintext (the "caching" in the name).
* **full auth** (cache miss, no TLS): client asks for the server's RSA
  public key (``0x02``), receives it PEM-encoded, and sends
  ``RSA-OAEP(password || NUL  XOR  nonce)`` — the exact
  ``RSA_PKCS1_OAEP_PADDING`` exchange libmysqlclient performs.

No crypto libraries ship in this environment, so the RSA/OAEP/DER
pieces are implemented from their RFCs (RFC 8017 RSAES-OAEP with SHA-1,
RFC 5280 SubjectPublicKeyInfo DER, PEM framing) in pure Python +
``hashlib``. Key sizes here are fixture-sized; a production client only
ever needs the ENCRYPT side, which works against any server key.
"""

from __future__ import annotations

import base64
import hashlib
import os

CACHING_SHA2_PLUGIN = "caching_sha2_password"

# AuthMoreData status bytes (wire values from the public protocol docs)
FAST_AUTH_SUCCESS = 3
PERFORM_FULL_AUTHENTICATION = 4
REQUEST_PUBLIC_KEY = 2


def sha2_scramble(password: bytes, nonce: bytes) -> bytes:
    """XOR(SHA256(pw), SHA256(SHA256(SHA256(pw)) || nonce)) — the
    32-byte fast-auth token."""
    if not password:
        return b""
    h1 = hashlib.sha256(password).digest()
    h2 = hashlib.sha256(h1).digest()
    rhs = hashlib.sha256(h2 + nonce[:20]).digest()
    return bytes(a ^ b for a, b in zip(h1, rhs))


def xor_password_nonce(password: bytes, nonce: bytes) -> bytes:
    """The full-auth plaintext: NUL-terminated password XORed with the
    (repeating) handshake nonce — what gets RSA-OAEP encrypted."""
    buf = password + b"\x00"
    return bytes(b ^ nonce[i % len(nonce)] for i, b in enumerate(buf))


# --------------------------------------------------------------------------
# RSAES-OAEP (RFC 8017, SHA-1 / MGF1-SHA-1 — libmysqlclient's default)
# --------------------------------------------------------------------------

_H_LEN = 20  # SHA-1


def _mgf1(seed: bytes, length: int) -> bytes:
    out = bytearray()
    counter = 0
    while len(out) < length:
        out += hashlib.sha1(seed + counter.to_bytes(4, "big")).digest()
        counter += 1
    return bytes(out[:length])


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def oaep_encrypt(n: int, e: int, message: bytes) -> bytes:
    k = (n.bit_length() + 7) // 8
    if len(message) > k - 2 * _H_LEN - 2:
        raise ValueError("message too long for key size")
    l_hash = hashlib.sha1(b"").digest()
    ps = b"\x00" * (k - len(message) - 2 * _H_LEN - 2)
    db = l_hash + ps + b"\x01" + message
    seed = os.urandom(_H_LEN)
    masked_db = _xor(db, _mgf1(seed, k - _H_LEN - 1))
    masked_seed = _xor(seed, _mgf1(masked_db, _H_LEN))
    em = b"\x00" + masked_seed + masked_db
    c = pow(int.from_bytes(em, "big"), e, n)
    return c.to_bytes(k, "big")


def oaep_decrypt(n: int, d: int, ciphertext: bytes) -> bytes:
    k = (n.bit_length() + 7) // 8
    m = pow(int.from_bytes(ciphertext, "big"), d, n)
    em = m.to_bytes(k, "big")
    masked_seed, masked_db = em[1:1 + _H_LEN], em[1 + _H_LEN:]
    seed = _xor(masked_seed, _mgf1(masked_db, _H_LEN))
    db = _xor(masked_db, _mgf1(seed, k - _H_LEN - 1))
    if em[0] != 0 or db[:_H_LEN] != hashlib.sha1(b"").digest():
        raise ValueError("OAEP decoding error")
    idx = db.index(b"\x01", _H_LEN)
    return db[idx + 1:]


# --------------------------------------------------------------------------
# DER / PEM for SubjectPublicKeyInfo (the format the server sends)
# --------------------------------------------------------------------------

_RSA_OID = bytes.fromhex("06092a864886f70d010101")  # 1.2.840.113549.1.1.1


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    b = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(b)]) + b


def _der_int(v: int) -> bytes:
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return b"\x02" + _der_len(len(b)) + b


def _der_seq(payload: bytes) -> bytes:
    return b"\x30" + _der_len(len(payload)) + payload


def encode_public_key_pem(n: int, e: int) -> bytes:
    rsa_key = _der_seq(_der_int(n) + _der_int(e))
    bitstr = b"\x03" + _der_len(len(rsa_key) + 1) + b"\x00" + rsa_key
    alg = _der_seq(_RSA_OID + b"\x05\x00")  # rsaEncryption + NULL params
    spki = _der_seq(alg + bitstr)
    b64 = base64.b64encode(spki).decode()
    lines = "\n".join(b64[i:i + 64] for i in range(0, len(b64), 64))
    return (f"-----BEGIN PUBLIC KEY-----\n{lines}\n"
            f"-----END PUBLIC KEY-----\n").encode()


def _read_tlv(b: bytes, off: int, expect: int) -> tuple[bytes, int]:
    if b[off] != expect:
        raise ValueError(f"DER: expected tag 0x{expect:02x}, "
                         f"got 0x{b[off]:02x}")
    off += 1
    length = b[off]
    off += 1
    if length & 0x80:
        n = length & 0x7F
        length = int.from_bytes(b[off:off + n], "big")
        off += n
    return b[off:off + length], off + length


def parse_public_key_pem(pem: bytes) -> tuple[int, int]:
    """PEM SubjectPublicKeyInfo -> (n, e)."""
    body = b"".join(
        line.strip() for line in pem.splitlines()
        if line and not line.startswith(b"-----"))
    der = base64.b64decode(body)
    spki, _ = _read_tlv(der, 0, 0x30)
    _alg, off = _read_tlv(spki, 0, 0x30)
    bitstr, _ = _read_tlv(spki, off, 0x03)
    rsa_key, _ = _read_tlv(bitstr[1:], 0, 0x30)  # skip unused-bits byte
    n_bytes, off = _read_tlv(rsa_key, 0, 0x02)
    e_bytes, _ = _read_tlv(rsa_key, off, 0x02)
    return (int.from_bytes(n_bytes, "big"), int.from_bytes(e_bytes, "big"))


# --------------------------------------------------------------------------
# RSA keypair generation (fixture-server side only)
# --------------------------------------------------------------------------


def _is_probable_prime(n: int, rounds: int = 24) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(rounds):
        a = int.from_bytes(os.urandom(16), "big") % (n - 3) + 2
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def _random_prime(bits: int) -> int:
    while True:
        cand = int.from_bytes(os.urandom(bits // 8), "big")
        cand |= (1 << (bits - 1)) | 1  # top bit + odd
        if _is_probable_prime(cand):
            return cand


def generate_rsa_keypair(bits: int = 1024) -> tuple[int, int, int]:
    """-> (n, e, d). Fixture-sized by default; the mask-generation and
    padding logic is key-size independent."""
    e = 65537
    while True:
        p = _random_prime(bits // 2)
        q = _random_prime(bits // 2)
        if p == q:
            continue
        phi = (p - 1) * (q - 1)
        if phi % e == 0:
            continue
        n = p * q
        if n.bit_length() < bits:
            continue
        d = pow(e, -1, phi)
        return n, e, d
