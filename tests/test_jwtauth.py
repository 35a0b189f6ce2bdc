"""M24/M25 — JWT builder / RSA PEM parser (token.go:207-287 parity).

The container has no crypto library, so the fixture key is generated
here from scratch (deterministic Miller-Rabin primes) and serialized
with a minimal DER writer — the parser under test never sees its own
encoder's output except through real PEM bytes.
"""

import base64
import json
import random

import pytest

from don_crawler_ray.functions.jwtauth import (
    JWT_EXPIRY_S,
    JWT_ISSUED_AT_SKEW_S,
    KeyParseError,
    RSAPrivateKey,
    build_jwt,
    jwt_token_source,
    parse_rsa_private_key,
    sign_pkcs1v15_sha256,
    verify_pkcs1v15_sha256,
)

# ---------------------------------------------------------------------------
# fixture key: deterministic 1024-bit RSA
# ---------------------------------------------------------------------------


def _is_probable_prime(n: int, rng: random.Random, rounds: int = 24) -> bool:
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
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(bits: int, rng: random.Random) -> int:
    while True:
        cand = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
        if _is_probable_prime(cand, rng):
            return cand


def _make_key() -> RSAPrivateKey:
    rng = random.Random(0xD0C5)
    e = 65537
    while True:
        p = _gen_prime(512, rng)
        q = _gen_prime(512, rng)
        if p == q:
            continue
        phi = (p - 1) * (q - 1)
        if phi % e:
            d = pow(e, -1, phi)
            return RSAPrivateKey(
                n=p * q, e=e, d=d,
                p=p, q=q, dp=d % (p - 1), dq=d % (q - 1), qinv=pow(q, -1, p),
            )


KEY = _make_key()

# ---------------------------------------------------------------------------
# minimal DER/PEM writer (test-side only)
# ---------------------------------------------------------------------------


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(raw)]) + raw


def _der_int(v: int) -> bytes:
    raw = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    if raw[0] & 0x80:
        raw = b"\x00" + raw  # keep positive
    return b"\x02" + _der_len(len(raw)) + raw


def _der_seq(*parts: bytes) -> bytes:
    body = b"".join(parts)
    return b"\x30" + _der_len(len(body)) + body


def _pkcs1_der(k: RSAPrivateKey) -> bytes:
    return _der_seq(
        _der_int(0), _der_int(k.n), _der_int(k.e), _der_int(k.d),
        _der_int(k.p), _der_int(k.q), _der_int(k.dp), _der_int(k.dq),
        _der_int(k.qinv),
    )


_RSA_OID_DER = b"\x06\x09\x2a\x86\x48\x86\xf7\x0d\x01\x01\x01"
_EC_OID_DER = b"\x06\x07\x2a\x86\x48\xce\x3d\x02\x01"  # id-ecPublicKey


def _pkcs8_der(k: RSAPrivateKey, oid: bytes = _RSA_OID_DER) -> bytes:
    inner = _pkcs1_der(k)
    return _der_seq(
        _der_int(0),
        _der_seq(oid, b"\x05\x00"),  # AlgorithmIdentifier {OID, NULL}
        b"\x04" + _der_len(len(inner)) + inner,
    )


def _pem(block_type: str, der: bytes) -> str:
    b64 = base64.b64encode(der).decode()
    lines = "\n".join(b64[i : i + 64] for i in range(0, len(b64), 64))
    return f"-----BEGIN {block_type}-----\n{lines}\n-----END {block_type}-----\n"


# ---------------------------------------------------------------------------
# M25: PEM / DER parsing
# ---------------------------------------------------------------------------


class TestParsePrivateKey:
    def test_pkcs1_roundtrip(self):
        got = parse_rsa_private_key(_pem("RSA PRIVATE KEY", _pkcs1_der(KEY)))
        assert got == KEY

    def test_pkcs8_roundtrip(self):
        got = parse_rsa_private_key(_pem("PRIVATE KEY", _pkcs8_der(KEY)))
        assert got == KEY

    def test_escaped_newlines_env_var_form(self):
        # secrets pasted into env vars carry literal backslash-n
        # (token.go:257 strings.ReplaceAll)
        one_line = _pem("RSA PRIVATE KEY", _pkcs1_der(KEY)).replace("\n", "\\n")
        assert parse_rsa_private_key(one_line) == KEY

    def test_not_pem(self):
        with pytest.raises(KeyParseError, match="not valid PEM"):
            parse_rsa_private_key("hunter2")

    def test_unsupported_block_type(self):
        with pytest.raises(KeyParseError, match="unsupported private key type"):
            parse_rsa_private_key(_pem("CERTIFICATE", _pkcs1_der(KEY)))

    def test_pkcs8_non_rsa_oid(self):
        with pytest.raises(KeyParseError, match="not an RSA private key"):
            parse_rsa_private_key(_pem("PRIVATE KEY", _pkcs8_der(KEY, _EC_OID_DER)))

    def test_corrupt_der(self):
        with pytest.raises(KeyParseError):
            parse_rsa_private_key(_pem("RSA PRIVATE KEY", b"\x30\x03\x02\x01"))


# ---------------------------------------------------------------------------
# M24: RS256 signing + JWT
# ---------------------------------------------------------------------------


class TestSignAndJwt:
    def test_sign_verify(self):
        msg = b"don-crawler app auth"
        sig = sign_pkcs1v15_sha256(msg, KEY)
        assert len(sig) == KEY.byte_size
        assert verify_pkcs1v15_sha256(msg, sig, KEY.n, KEY.e)
        assert not verify_pkcs1v15_sha256(msg + b"!", sig, KEY.n, KEY.e)

    def test_crt_equals_plain_exponent(self):
        msg = b"crt parity"
        no_crt = RSAPrivateKey(n=KEY.n, e=KEY.e, d=KEY.d)
        assert sign_pkcs1v15_sha256(msg, KEY) == sign_pkcs1v15_sha256(msg, no_crt)

    def test_jwt_structure_and_claims(self):
        now = 1_700_000_000
        tok = build_jwt(12345, KEY, now)
        h_b64, p_b64, s_b64 = tok.split(".")

        def un64(part: str) -> bytes:
            return base64.urlsafe_b64decode(part + "=" * (-len(part) % 4))

        # header bytes match Go json.Marshal exactly (sorted, compact)
        assert un64(h_b64) == b'{"alg":"RS256","typ":"JWT"}'
        claims = json.loads(un64(p_b64))
        assert claims == {
            "iat": now - JWT_ISSUED_AT_SKEW_S,
            "exp": now + JWT_EXPIRY_S,
            "iss": 12345,
        }
        assert "=" not in tok  # raw (unpadded) url encoding everywhere
        signing_input = (h_b64 + "." + p_b64).encode("ascii")
        assert verify_pkcs1v15_sha256(signing_input, un64(s_b64), KEY.n, KEY.e)

    def test_jwt_deterministic(self):
        assert build_jwt(7, KEY, 1000) == build_jwt(7, KEY, 1000)
        assert build_jwt(7, KEY, 1000) != build_jwt(7, KEY, 1001)

    def test_token_source_plugs_into_st1_cache(self):
        """jwt_token_source + CachedTokenProvider: the JWT is cached
        until within the refresh threshold of its 9-minute expiry, then
        rebuilt — ST1 semantics over the real M24/M25 path."""
        from don_crawler_ray.state.tokens import CachedTokenProvider

        clock = {"ms": 1_700_000_000_000}
        now_ms = lambda: clock["ms"]  # noqa: E731
        pem = _pem("PRIVATE KEY", _pkcs8_der(KEY))
        provider = CachedTokenProvider(
            jwt_token_source(9001, pem, now_ms=now_ms), now_ms=now_ms
        )

        tok1, exp1 = provider.token()
        assert exp1 == clock["ms"] + JWT_EXPIRY_S * 1000
        clock["ms"] += 60_000  # 1 min: still fresh (>2 min to expiry)
        assert provider.token()[0] == tok1
        assert provider.fetch_count == 1
        clock["ms"] += 6 * 60_000  # 7 min in: within 2-min threshold
        tok2, _ = provider.token()
        assert tok2 != tok1
        assert provider.fetch_count == 2


class TestParserFuzz:
    """The parser's error contract: arbitrary garbage — free text or
    valid PEM wrapping random DER bytes — raises KeyParseError, never
    IndexError/UnboundLocalError/etc."""

    def test_garbage_text(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.text(max_size=200))
        def check(raw):
            with pytest.raises(KeyParseError):
                parse_rsa_private_key(raw)

        check()

    def test_garbage_der_in_valid_pem(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(
            st.binary(max_size=120),
            st.sampled_from(["RSA PRIVATE KEY", "PRIVATE KEY"]),
        )
        def check(der, block_type):
            with pytest.raises(KeyParseError):
                parse_rsa_private_key(_pem(block_type, der))

        check()

    def test_truncated_real_key(self):
        der = _pkcs1_der(KEY)
        for cut in (1, 7, len(der) // 2, len(der) - 1):
            with pytest.raises(KeyParseError):
                parse_rsa_private_key(_pem("RSA PRIVATE KEY", der[:cut]))
