"""Standard security handler (ISO 32000-1 §7.6.3) for RC4-encrypted PDFs
with an EMPTY user password — the dominant encrypted-PDF population in web
crawls ("owner-locked" files that any viewer opens without prompting).

The reference gets this free from PyMuPDF (reference
services/pdf_service.py:16 — `fitz.open` silently decrypts
standard-security files whose user password is empty). Here the handler is
a from-scratch implementation of the spec's algorithms: RC4 itself is
pinned by published test vectors so the synth-side encrypt twin cannot
hide a mirrored cipher bug; the key-derivation structure (Algorithms 2/3
in §7.6.3.3-4, U-entry Algorithms 4/5 in §7.6.3.4) follows the standard
directly. Only V ∈ {1, 2} / R ∈ {2, 3} (RC4 40-128 bit) is attempted —
V≥4 (AES, crypt filters) stays an explicit 'encrypted' parse status, never
silently-wrong output, because the /U verification must pass before a
single stream is decrypted.

Per-object keys use generation 0: the regex object scan does not track
generation numbers, and >0 generations essentially do not occur in crawl
PDFs (they require incremental-update chains that re-use freed numbers).
"""

from __future__ import annotations

import re
import struct
from hashlib import md5

# §7.6.3.3 padding string
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)

_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+\d+\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*(<[0-9A-Fa-f\s]*>|\([^)]*\))")
_HEX_STR_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_OBJ_AT_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)\bendobj", re.DOTALL)

_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (KSA + PRGA). Symmetric: encrypt == decrypt."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = byte ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def _parse_pdf_string(tok: bytes) -> bytes | None:
    """Hex `<...>` or literal `(...)` PDF string token → raw bytes."""
    if tok.startswith(b"<"):
        hx = re.sub(rb"\s", b"", tok[1:-1])
        if len(hx) % 2:
            hx += b"0"
        try:
            return bytes.fromhex(hx.decode("ascii"))
        except ValueError:
            return None
    if tok.startswith(b"("):
        body = tok[1:-1]
        out = bytearray()
        i = 0
        while i < len(body):
            c = body[i : i + 1]
            if c == b"\\" and i + 1 < len(body):
                nxt = body[i + 1 : i + 2]
                if nxt.isdigit():  # \ddd octal, 1-3 digits
                    j = i + 1
                    while j < min(i + 4, len(body)) and body[j : j + 1].isdigit():
                        j += 1
                    out.append(int(body[i + 1 : j], 8) & 0xFF)
                    i = j
                    continue
                out += _ESC.get(nxt, nxt)
                i += 2
                continue
            out += c
            i += 1
        return bytes(out)
    return None


def _string_value(head: bytes, key: bytes) -> bytes | None:
    m = re.search(
        re.escape(key) + rb"\s*(<[0-9A-Fa-f\s]*>|\([^)]*(?:\\.[^)]*)*\))", head
    )
    return _parse_pdf_string(m.group(1)) if m else None


def _int_value(head: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(-?\d+)", head)
    return int(m.group(1)) if m else None


def compute_key(
    o: bytes, p: int, id0: bytes, r: int, n: int, user_pw: bytes = b""
) -> bytes:
    """§7.6.3.3 Algorithm 2 — file encryption key for V ≤ 2."""
    h = md5(
        _pad_password(user_pw) + o[:32] + struct.pack("<i", p) + id0
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = md5(h[:n]).digest()
    return h[:n]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """§7.6.3.4 Algorithm 3 — the /O entry (synth-twin side)."""
    h = md5(_pad_password(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = md5(h).digest()
    key = h[:n]
    o = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """§7.6.3.4 Algorithms 4 (R=2) / 5 (R=3) — the /U entry."""
    if r == 2:
        return rc4(key, PAD)
    u = rc4(key, md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16  # 32-byte entry; only the first 16 are defined


class StandardCrypt:
    """Verified file key + per-object RC4 decryption (§7.6.2 Algorithm 1)."""

    def __init__(self, key: bytes):
        self._key = key
        self._n = len(key)

    def decrypt(self, objnum: int, data: bytes, gen: int = 0) -> bytes:
        ok = md5(
            self._key
            + struct.pack("<I", objnum)[:3]
            + struct.pack("<H", gen)
        ).digest()[: min(self._n + 5, 16)]
        return rc4(ok, data)

    encrypt = decrypt  # RC4 is symmetric — synth twin uses the same path


def try_open(raw: bytes) -> StandardCrypt | None:
    """Open an encrypted PDF with the EMPTY user password.

    Returns a verified StandardCrypt, or None when the document uses an
    unsupported handler/revision or the /U check fails (a real user
    password) — the caller then reports parse_status='encrypted' instead
    of emitting ciphertext-derived garbage.
    """
    refs = _ENCRYPT_REF_RE.findall(raw)
    if not refs:
        return None
    enc_num = int(refs[-1])
    head = None
    for m in _OBJ_AT_RE.finditer(raw):
        if int(m.group(1)) == enc_num:
            head = m.group(2).split(b"stream", 1)[0]
    if head is None or b"/Standard" not in head:
        return None
    v = _int_value(head, b"/V") or 0
    r = _int_value(head, b"/R") or 0
    if v not in (1, 2) or r not in (2, 3):
        return None
    n = (_int_value(head, b"/Length") or 40) // 8 if v == 2 else 5
    if not 5 <= n <= 16:
        return None
    o = _string_value(head, b"/O")
    u = _string_value(head, b"/U")
    p = _int_value(head, b"/P")
    if o is None or u is None or p is None or len(o) < 32:
        return None
    idm = _ID_RE.findall(raw)
    id0 = _parse_pdf_string(idm[-1]) if idm else b""
    if id0 is None:
        id0 = b""
    key = compute_key(o, p, id0, r, n)
    want = compute_u(key, id0, r)
    got_ok = u[:16] == want[:16] if r >= 3 else u[:32] == want[:32]
    return StandardCrypt(key) if got_ok else None
