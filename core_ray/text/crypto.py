"""Per-record encrypt/decrypt map — the M13 analog (SURVEY.md §2.2,
reference pkg/crypto/encryptor.go:48-128: NaCl SecretBox per-record UDF).

No crypto libraries exist in this environment beyond hashlib/hmac, so this is
a stdlib HMAC-SHA256-CTR construction with an authentication tag: keystream
block i = HMAC(key, nonce || i), tag = HMAC(key, nonce || ciphertext). It
mirrors the reference's shape (random nonce per record, base64 envelope,
thread-safe pure function) — NOT a vetted AEAD; a production deployment would
swap in NaCl/AES-GCM behind the same batch UDF.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os

import pyarrow as pa

_NONCE_LEN = 24
_TAG_LEN = 16


def _keystream(key: bytes, nonce: bytes, n: int) -> bytes:
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hmac.new(key, nonce + counter.to_bytes(8, "big"), hashlib.sha256).digest()
        counter += 1
    return bytes(out[:n])


def encrypt(key: bytes, plaintext: bytes, nonce: bytes | None = None) -> str:
    """bytes -> base64(nonce || ciphertext || tag). Random nonce by default;
    pass one explicitly for deterministic tests."""
    if len(key) != 32:
        raise ValueError("key must be 32 bytes")
    nonce = nonce if nonce is not None else os.urandom(_NONCE_LEN)
    if len(nonce) != _NONCE_LEN:
        raise ValueError(f"nonce must be {_NONCE_LEN} bytes")
    ct = bytes(a ^ b for a, b in zip(plaintext, _keystream(key, nonce, len(plaintext))))
    tag = hmac.new(key, nonce + ct, hashlib.sha256).digest()[:_TAG_LEN]
    return base64.b64encode(nonce + ct + tag).decode("ascii")


def decrypt(key: bytes, envelope: str) -> bytes:
    raw = base64.b64decode(envelope.encode("ascii"))
    nonce, ct, tag = raw[:_NONCE_LEN], raw[_NONCE_LEN:-_TAG_LEN], raw[-_TAG_LEN:]
    want = hmac.new(key, nonce + ct, hashlib.sha256).digest()[:_TAG_LEN]
    if not hmac.compare_digest(tag, want):
        raise ValueError("authentication failed")
    return bytes(a ^ b for a, b in zip(ct, _keystream(key, nonce, len(ct))))


class Encryptor:
    """Actor-pool batch UDF: encrypts ``col`` into ``col + '_enc'``.

    Key held per worker (env-var analog of the reference's keygen flow);
    deterministic per-row nonces derived from (key, id) keep tests stable
    while remaining unique per record."""

    def __init__(self, key: bytes, col: str = "text", id_col: str = "doc_id"):
        self.key = key
        self.col = col
        self.id_col = id_col

    def _nonce(self, row_id: int, plaintext: bytes) -> bytes:
        # the plaintext digest is mixed in so two DIFFERENT plaintexts that
        # accidentally share an id never reuse a keystream (two-time pad);
        # still fully deterministic for tests
        return hashlib.sha256(
            self.key + b"|nonce|" + str(row_id).encode() + b"|"
            + hashlib.sha256(plaintext).digest()
        ).digest()[:_NONCE_LEN]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        vals = batch[self.col].to_pylist()
        enc = [
            encrypt(self.key, p, self._nonce(i, p))
            for i, p in ((i, v.encode("utf-8")) for i, v in zip(ids, vals))
        ]
        return batch.append_column(f"{self.col}_enc", pa.array(enc, pa.string()))
