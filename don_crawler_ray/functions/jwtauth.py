"""M24/M25 — GitHub-App JWT building and RSA PEM parsing, pure Python.

Semantic port of the reference's app-auth crypto
(``internal/githubapp/token.go:207-287``):

- ``parse_rsa_private_key``: accepts PKCS1 (``RSA PRIVATE KEY``) and
  PKCS8 (``PRIVATE KEY``) PEM, after trimming and replacing literal
  ``\\n`` escapes with newlines (the env-var single-line form,
  ``token.go:257``); other block types and non-RSA PKCS8 keys error
  with the reference's messages.
- ``build_jwt``: RS256 JWT with claims ``iat = now - 30 s``,
  ``exp = now + 9 min``, ``iss = app_id`` (``token.go:27-30,207-214``)
  over compact sorted-key JSON — byte-identical to Go's
  ``json.Marshal`` of a map (alphabetical keys, no spaces) — and
  raw-url base64 parts.

Everything is from-scratch arithmetic on Python ints (no crypto
library exists in this container): minimal DER TLV reader, PKCS#1 v1.5
signature padding with the SHA-256 DigestInfo prefix, and CRT modular
exponentiation. Deterministic — signing PKCS#1 v1.5 has no randomness
— so tests pin exact outputs. The engine itself never talks to GitHub;
``jwt_token_source`` plugs into the ST1 ``CachedTokenProvider``
(``state/tokens.py``) as its ``fetch`` seam.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import json
import re
from dataclasses import dataclass

# 9 minutes / 30 seconds (token.go:29-30)
JWT_EXPIRY_S = 9 * 60
JWT_ISSUED_AT_SKEW_S = 30

# DigestInfo prefix for SHA-256 (RFC 8017 §9.2 notes)
_SHA256_DIGEST_INFO = bytes.fromhex("3031300d060960864801650304020105000420")
_RSA_OID = (1, 2, 840, 113549, 1, 1, 1)  # rsaEncryption

_PEM_RE = re.compile(
    r"-----BEGIN (?P<type>[A-Z0-9 ]+)-----(?P<body>.*?)-----END (?P=type)-----",
    re.DOTALL,
)


class KeyParseError(ValueError):
    """Invalid PEM / DER / key-type input."""


@dataclass(frozen=True)
class RSAPrivateKey:
    n: int
    e: int
    d: int
    p: int = 0
    q: int = 0
    dp: int = 0
    dq: int = 0
    qinv: int = 0

    @property
    def byte_size(self) -> int:
        return (self.n.bit_length() + 7) // 8


# ---------------------------------------------------------------------------
# PEM + minimal DER
# ---------------------------------------------------------------------------


def pem_decode(raw: str) -> tuple[str, bytes]:
    """First PEM block as ``(type, der_bytes)``; literal ``\\n`` escape
    sequences become newlines first (secrets pasted into single-line
    env vars, token.go:257)."""
    text = raw.strip().replace("\\n", "\n")
    m = _PEM_RE.search(text)
    if m is None:
        raise KeyParseError("secret is not valid PEM data")
    body = "".join(m.group("body").split())
    try:
        return m.group("type"), base64.b64decode(body, validate=True)
    except (binascii.Error, ValueError) as exc:
        raise KeyParseError(f"invalid PEM base64: {exc}") from exc


def _der_read_tlv(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """One DER TLV at ``pos`` -> (tag, value, next_pos)."""
    if pos + 2 > len(buf):
        raise KeyParseError("truncated DER")
    tag = buf[pos]
    length = buf[pos + 1]
    pos += 2
    if length & 0x80:
        n_len = length & 0x7F
        if n_len == 0 or pos + n_len > len(buf):
            raise KeyParseError("bad DER length")
        length = int.from_bytes(buf[pos : pos + n_len], "big")
        pos += n_len
    if pos + length > len(buf):
        raise KeyParseError("truncated DER value")
    return tag, buf[pos : pos + length], pos + length


def _der_sequence(buf: bytes) -> bytes:
    tag, value, end = _der_read_tlv(buf, 0)
    if tag != 0x30:
        raise KeyParseError("expected DER SEQUENCE")
    if end != len(buf):
        raise KeyParseError("trailing bytes after DER SEQUENCE")
    return value


def _der_integers(seq: bytes, count: int) -> list[int]:
    out = []
    pos = 0
    while len(out) < count:
        tag, value, pos = _der_read_tlv(seq, pos)
        if tag != 0x02:
            raise KeyParseError("expected DER INTEGER")
        out.append(int.from_bytes(value, "big"))
    return out


def _parse_pkcs1(der: bytes) -> RSAPrivateKey:
    """RSAPrivateKey ::= SEQUENCE { version, n, e, d, p, q, dp, dq, qinv }."""
    fields = _der_integers(_der_sequence(der), 9)
    version, n, e, d, p, q, dp, dq, qinv = fields
    if version != 0:
        raise KeyParseError(f"unsupported RSAPrivateKey version {version}")
    if n <= 0 or e <= 0 or d <= 0:
        raise KeyParseError("invalid RSA private key: non-positive component")
    return RSAPrivateKey(n, e, d, p, q, dp, dq, qinv)


def _parse_pkcs8(der: bytes) -> RSAPrivateKey:
    """PrivateKeyInfo ::= SEQUENCE { version, AlgorithmIdentifier,
    OCTET STRING (PKCS1 RSAPrivateKey) } — non-RSA OIDs rejected."""
    seq = _der_sequence(der)
    pos = 0
    tag, version, pos = _der_read_tlv(seq, pos)
    if tag != 0x02 or int.from_bytes(version, "big") != 0:
        raise KeyParseError("unsupported PKCS8 version")
    tag, algo, pos = _der_read_tlv(seq, pos)
    if tag != 0x30:
        raise KeyParseError("expected PKCS8 AlgorithmIdentifier")
    oid_tag, oid, _ = _der_read_tlv(algo, 0)
    if oid_tag != 0x06 or _decode_oid(oid) != _RSA_OID:
        raise KeyParseError("secret is not an RSA private key")
    tag, inner, pos = _der_read_tlv(seq, pos)
    if tag != 0x04:
        raise KeyParseError("expected PKCS8 privateKey OCTET STRING")
    return _parse_pkcs1(inner)


def _decode_oid(raw: bytes) -> tuple[int, ...]:
    if not raw:
        raise KeyParseError("empty OID")
    out = [raw[0] // 40, raw[0] % 40]
    val = 0
    for b in raw[1:]:
        val = (val << 7) | (b & 0x7F)
        if not b & 0x80:
            out.append(val)
            val = 0
    return tuple(out)


def parse_rsa_private_key(raw: str) -> RSAPrivateKey:
    """RSA private key from PKCS1 or PKCS8 PEM (token.go:255-287)."""
    block_type, der = pem_decode(raw)
    if block_type == "RSA PRIVATE KEY":
        return _parse_pkcs1(der)
    if block_type == "PRIVATE KEY":
        return _parse_pkcs8(der)
    raise KeyParseError(f"unsupported private key type {block_type!r}")


# ---------------------------------------------------------------------------
# RS256 signing
# ---------------------------------------------------------------------------


def _emsa_pkcs1_v15_sha256(message: bytes, k: int) -> bytes:
    digest = hashlib.sha256(message).digest()
    t = _SHA256_DIGEST_INFO + digest
    if k < len(t) + 11:
        raise ValueError("RSA modulus too small for SHA-256 PKCS1 v1.5")
    return b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t


def sign_pkcs1v15_sha256(message: bytes, key: RSAPrivateKey) -> bytes:
    """RSASSA-PKCS1-v1_5 SHA-256 signature; CRT when p/q are present."""
    k = key.byte_size
    m = int.from_bytes(_emsa_pkcs1_v15_sha256(message, k), "big")
    if key.p and key.q and key.dp and key.dq and key.qinv:
        m1 = pow(m % key.p, key.dp, key.p)
        m2 = pow(m % key.q, key.dq, key.q)
        s = m2 + key.q * ((key.qinv * (m1 - m2)) % key.p)
    else:
        s = pow(m, key.d, key.n)
    return s.to_bytes(k, "big")


def verify_pkcs1v15_sha256(message: bytes, signature: bytes, n: int, e: int) -> bool:
    """Public-key check (tests / parity harnesses only)."""
    k = (n.bit_length() + 7) // 8
    if len(signature) != k:
        return False
    em = pow(int.from_bytes(signature, "big"), e, n).to_bytes(k, "big")
    return em == _emsa_pkcs1_v15_sha256(message, k)


# ---------------------------------------------------------------------------
# JWT
# ---------------------------------------------------------------------------


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def _jwt_part(value: dict) -> str:
    # Go json.Marshal writes map keys alphabetically with no spaces —
    # sort_keys + compact separators reproduce those bytes exactly
    return _b64url(json.dumps(value, sort_keys=True, separators=(",", ":")).encode())


def build_jwt(app_id: int | str, key: RSAPrivateKey, now_s: int) -> str:
    """The reference's app JWT (token.go:207-244): RS256-signed
    ``header.claims.signature`` with iat skewed 30 s back and a
    9-minute expiry. ``now_s`` is injected (epoch seconds) — callers
    own the clock, like every other time seam in this engine."""
    claims = {
        "iat": now_s - JWT_ISSUED_AT_SKEW_S,
        "exp": now_s + JWT_EXPIRY_S,
        "iss": app_id,
    }
    signing_input = _jwt_part({"alg": "RS256", "typ": "JWT"}) + "." + _jwt_part(claims)
    signature = sign_pkcs1v15_sha256(signing_input.encode("ascii"), key)
    return signing_input + "." + _b64url(signature)


def jwt_token_source(app_id: int | str, pem: str, now_ms=None):
    """``fetch`` callable for the ST1 ``CachedTokenProvider``: each call
    builds a fresh app JWT and reports its expiry in epoch ms. Parses
    the PEM ONCE here (held-client seam) — not per refresh."""
    import time as _time

    key = parse_rsa_private_key(pem)
    clock = now_ms or (lambda: int(_time.time() * 1000))

    def fetch() -> tuple[str, int]:
        now_s = clock() // 1000
        return build_jwt(app_id, key, now_s), (now_s + JWT_EXPIRY_S) * 1000

    return fetch
