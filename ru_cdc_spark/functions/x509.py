"""Minimal X.509 self-signed certificate + RSA private-key PEM
machinery, from the public ASN.1/DER and PKCS specifications.

The MySQL fixture server's TLS listener (CLIENT_SSL — what every
managed MySQL requires) needs a certificate and key that Python's
``ssl`` module (OpenSSL) will load. No crypto library ships here, so
this module builds both from the in-repo RSA primitives
(sources/sha2_auth.py):

* **RSASSA-PKCS1-v1_5 / SHA-256 signing** (RFC 8017 §8.2): EMSA
  padding ``00 01 FF.. 00 || DigestInfo(SHA-256)`` then the private
  exponentiation;
* **RSAPrivateKey** (PKCS#1, RFC 8017 A.1.2) DER + PEM — the key file
  OpenSSL reads;
* **self-signed X.509 v3 certificate** (RFC 5280): TBSCertificate
  (serial, sha256WithRSAEncryption, issuer == subject CN, validity,
  SubjectPublicKeyInfo) signed with its own key.

Fixture-scale cert hygiene: CN and lifetime are caller-supplied; the
point is a byte-correct certificate chain for loopback TLS, not a CA.
"""

from __future__ import annotations

import base64
import hashlib

from ru_cdc_spark.sources.sha2_auth import (
    _der_int,
    _der_len,
    _der_seq,
    _random_prime,
)

# DigestInfo prefix for SHA-256 (RFC 8017 §9.2 note 1)
_SHA256_DIGESTINFO = bytes.fromhex(
    "3031300d060960864801650304020105000420")
_OID_SHA256_RSA = bytes.fromhex("06092a864886f70d01010b")  # 1.2.840...11
_OID_RSA = bytes.fromhex("06092a864886f70d010101")
_OID_CN = bytes.fromhex("0603550403")  # 2.5.4.3


def generate_rsa_private(bits: int = 2048) -> dict:
    """Full CRT private key: {n, e, d, p, q, dp, dq, qinv}."""
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
        return {"n": n, "e": e, "d": d, "p": p, "q": q,
                "dp": d % (p - 1), "dq": d % (q - 1),
                "qinv": pow(q, -1, p)}


def pkcs1_v15_sign_sha256(key: dict, message: bytes) -> bytes:
    k = (key["n"].bit_length() + 7) // 8
    t = _SHA256_DIGESTINFO + hashlib.sha256(message).digest()
    ps = b"\xff" * (k - len(t) - 3)
    em = b"\x00\x01" + ps + b"\x00" + t
    sig = pow(int.from_bytes(em, "big"), key["d"], key["n"])
    return sig.to_bytes(k, "big")


def _pem(tag: str, der: bytes) -> bytes:
    b64 = base64.b64encode(der).decode()
    lines = "\n".join(b64[i:i + 64] for i in range(0, len(b64), 64))
    return (f"-----BEGIN {tag}-----\n{lines}\n"
            f"-----END {tag}-----\n").encode()


def rsa_private_key_pem(key: dict) -> bytes:
    """PKCS#1 RSAPrivateKey DER, PEM-framed ('RSA PRIVATE KEY')."""
    body = (_der_int(0) + _der_int(key["n"]) + _der_int(key["e"])
            + _der_int(key["d"]) + _der_int(key["p"])
            + _der_int(key["q"]) + _der_int(key["dp"])
            + _der_int(key["dq"]) + _der_int(key["qinv"]))
    return _pem("RSA PRIVATE KEY", _der_seq(body))


def _utc_time(s: str) -> bytes:
    """ASN.1 UTCTime (YYMMDDHHMMSSZ)."""
    b = s.encode()
    return b"\x17" + _der_len(len(b)) + b


def _name_cn(cn: str) -> bytes:
    """RDNSequence with a single CN attribute."""
    value = cn.encode()
    atv = _der_seq(_OID_CN + b"\x0c" + _der_len(len(value)) + value)
    rdn = b"\x31" + _der_len(len(atv)) + atv  # SET OF
    return _der_seq(rdn)


def _spki(key: dict) -> bytes:
    rsa_pub = _der_seq(_der_int(key["n"]) + _der_int(key["e"]))
    bitstr = b"\x03" + _der_len(len(rsa_pub) + 1) + b"\x00" + rsa_pub
    return _der_seq(_der_seq(_OID_RSA + b"\x05\x00") + bitstr)


def self_signed_cert_pem(key: dict, cn: str = "localhost",
                         serial: int = 1,
                         not_before: str = "250101000000Z",
                         not_after: str = "491231235959Z") -> bytes:
    """Self-signed X.509 v3 certificate (DER -> PEM)."""
    sig_alg = _der_seq(_OID_SHA256_RSA + b"\x05\x00")
    version = b"\xa0\x03" + _der_int(2)  # [0] EXPLICIT v3
    tbs = _der_seq(
        version
        + _der_int(serial)
        + sig_alg
        + _name_cn(cn)                                   # issuer
        + _der_seq(_utc_time(not_before) + _utc_time(not_after))
        + _name_cn(cn)                                   # subject
        + _spki(key))
    sig = pkcs1_v15_sign_sha256(key, tbs)
    bitstr = b"\x03" + _der_len(len(sig) + 1) + b"\x00" + sig
    cert = _der_seq(tbs + sig_alg + bitstr)
    return _pem("CERTIFICATE", cert)


def write_tls_materials(directory: str, cn: str = "localhost",
                        bits: int = 2048) -> tuple[str, str]:
    """Generate key + self-signed cert into ``directory``; returns
    (cert_path, key_path) ready for ssl.load_cert_chain / load_verify_
    locations."""
    import os

    key = generate_rsa_private(bits)
    cert_path = os.path.join(directory, "cert.pem")
    key_path = os.path.join(directory, "key.pem")
    with open(cert_path, "wb") as fh:
        fh.write(self_signed_cert_pem(key, cn=cn))
    with open(key_path, "wb") as fh:
        fh.write(rsa_private_key_pem(key))
    return cert_path, key_path
