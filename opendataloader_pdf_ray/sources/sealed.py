"""Password-sealed payload envelope — the ``--password`` analog.

The reference opens password-protected PDFs when ``Config.password`` is set
and surfaces ``InvalidPasswordException`` as a distinct non-content failure
(``api/Config.java:65,150-165``, ``options.json`` "password",
``processors/DocumentProcessor.java:620-622``). The HTML-CDC analog: change
events can arrive with their ``html`` payload SEALED (think: a crawl dump
that must not be readable at rest). This module implements that envelope
dependency-free and deterministically:

  ODLSEAL1 || salt(16) || tag(32) || ciphertext

- key = SHA-256(salt || password), keystream = SHA-256(key || counter)
  blocks XORed over the plaintext (CTR construction);
- tag = HMAC-SHA-256(key, ciphertext) — wrong password → tag mismatch →
  :class:`InvalidPassword`, the same "not a content failure" signal the
  reference propagates. Handling by surface: the CLI convert loop logs and
  skips the FILE (skip-and-continue); the streaming extractor actor
  (``stages/extract_stage.HtmlExtractor``) quarantines the RECORD to null
  text with one warning per actor — a sealed record never crashes a
  pipeline; direct ``extract()`` callers see the exception.

HONESTY NOTE: without a real crypto library in this environment this is an
obfuscation-grade stream cipher, NOT vetted encryption — the envelope,
key-derivation, authentication and error-handling plumbing are the real,
tested surface; swap the keystream for AES-CTR (``cryptography`` /
``pycryptodome``) where available. The format is versioned (``ODLSEAL1``)
so that swap is a new magic, not a breaking change.

Determinism: sealing the same payload with the same password and ``salt``
(or ``salt_from`` key) yields identical bytes — required by the repo's
byte-equal replay invariant.
"""

from __future__ import annotations

import hashlib
import hmac
from typing import Optional

MAGIC = b"ODLSEAL1"
_SALT_LEN = 16
_TAG_LEN = 32
_HDR = len(MAGIC) + _SALT_LEN + _TAG_LEN


class InvalidPassword(ValueError):
    """Wrong (or missing) password for a sealed payload — a non-content
    failure, mirroring the reference's InvalidPasswordException contract."""


def _key(salt: bytes, password: str) -> bytes:
    return hashlib.sha256(salt + password.encode("utf-8")).digest()


def _keystream_xor(key: bytes, data: bytes) -> bytes:
    """CTR keystream XOR, vectorized: the keystream is materialized once
    (32-byte SHA-256 blocks) and XORed whole-buffer via numpy — this sits on
    the per-document extract hot path, so a per-byte Python loop is out."""
    import numpy as np

    n = len(data)
    if n == 0:
        return b""
    ks = b"".join(hashlib.sha256(key + i.to_bytes(8, "big")).digest()
                  for i in range(0, n, 32))
    a = np.frombuffer(data, dtype=np.uint8)
    b = np.frombuffer(ks, dtype=np.uint8)[:n]
    return (a ^ b).tobytes()


def is_sealed(blob: Optional[bytes]) -> bool:
    return blob is not None and blob[:len(MAGIC)] == MAGIC


def seal(data: bytes, password: str,
         salt_from: Optional[str] = None) -> bytes:
    """Seal ``data``. ``salt_from`` (e.g. the record's url) derives a
    deterministic per-record salt; omit it only when determinism does not
    matter."""
    basis = (salt_from or "").encode("utf-8")
    salt = hashlib.sha256(b"odl-salt:" + basis + data[:32]).digest()[:_SALT_LEN]
    key = _key(salt, password)
    ct = _keystream_xor(key, data)
    tag = hmac.new(key, ct, hashlib.sha256).digest()
    return MAGIC + salt + tag + ct


def unseal(blob: bytes, password: Optional[str]) -> bytes:
    """Open a sealed payload; raises :class:`InvalidPassword` on a wrong or
    missing password (authenticated — a forged/corrupt envelope also fails
    here, never as garbled downstream content)."""
    if not is_sealed(blob):
        return blob
    if password is None:
        raise InvalidPassword("payload is sealed and no password is set")
    if len(blob) < _HDR:
        raise InvalidPassword("sealed payload truncated")
    salt = blob[len(MAGIC):len(MAGIC) + _SALT_LEN]
    tag = blob[len(MAGIC) + _SALT_LEN:_HDR]
    ct = blob[_HDR:]
    key = _key(salt, password)
    if not hmac.compare_digest(tag, hmac.new(key, ct, hashlib.sha256).digest()):
        raise InvalidPassword("wrong password (authentication tag mismatch)")
    return _keystream_xor(key, ct)
