"""o5m varint / string primitives.

The reference's o5m writer is disabled (src/writers/mod.rs:27,40 —
format commented out) and its element body unimplemented
(src/writers/o5m.rs:137-147), so this engine does not offer the o5m
format either. But the reference's only byte-level unit tests pin
down these encoding primitives (src/writers/o5m.rs:222-291), so we
keep a faithful implementation to anchor parity.
"""

from __future__ import annotations


def encode_unsigned_varint(value: int) -> bytes:
    """7-bit little-endian varint with continuation MSB
    (src/writers/o5m.rs:31-64; 5 -> 05, 323 -> c3 02, 16384 -> 80 80 01)."""
    if value < 0:
        raise ValueError("unsigned varint requires value >= 0")
    if value == 0:
        # reference's BitVec loop emits nothing for zero
        return b""
    out = bytearray()
    while value:
        b = value & 0x7F
        value >>= 7
        out.append(b | (0x80 if value else 0x00))
    return bytes(out)


def encode_string(s: str) -> bytes:
    """0x00 <utf8 bytes> 0x00 (src/writers/o5m.rs convert_string)."""
    return b"\x00" + s.encode("utf-8") + b"\x00"


def encode_tag(key: str, value: str) -> bytes:
    """0x00 <key> 0x00 <value> 0x00 (convert_tag)."""
    return b"\x00" + key.encode("utf-8") + b"\x00" + value.encode("utf-8") + b"\x00"


def encode_user(uid: int, username: str) -> bytes:
    """0x00 <uid varint> 0x00 <name> 0x00 (convert_user)."""
    return b"\x00" + encode_unsigned_varint(uid) + b"\x00" + username.encode("utf-8") + b"\x00"


class StringTable:
    """MRU string table with 1-based indices and 15,000-entry cap
    (src/writers/o5m.rs:95-122): a hit returns the varint of
    (position + 1); a miss inserts at the FRONT and returns the raw
    bytes."""

    MAX_ENTRIES = 15000

    def __init__(self) -> None:
        self._entries: list[bytes] = []

    def hit_cache(self, encoded: bytes) -> bytes:
        try:
            pos = self._entries.index(encoded)
        except ValueError:
            self._entries.insert(0, encoded)
            del self._entries[self.MAX_ENTRIES :]
            return encoded
        return encode_unsigned_varint(pos + 1)
