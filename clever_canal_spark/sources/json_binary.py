"""MySQL binary JSON (JSONB) wire decode — the JsonConversion analog.

The reference decodes the in-binlog binary JSON format to readable text
(JsonConversion.java:1-431: type constants at :12-28, small/large
object/array headers at :74-100, scalar ladder at :103-193, the
value-entry inlining rule and rendering at :240-405; the packed decimal
reader is LogBuffer.getDecimal, LogBuffer.java:1251-1330, and the
packed TIME/DATETIME bit layouts are in Json_Value.toJsonString,
JsonConversion.java:322-395). This module re-derives that decode from
the same publicly documented MySQL JSONB storage format
(mysql/sql/json_binary.h) in Python:

- :func:`decode_jsonb` — bytes → Python object (driver-side twin,
  fixture-testable; raises ValueError on malformed input).
- :func:`jsonb_to_canonical_text` — bytes → the engine's CANONICAL JSON
  text (``json_cols.canonical_json``: sorted keys, compact), so a
  binary-wire feed lands byte-identical to the text-wire path after
  normalization — replay equality holds across wire formats.
- :func:`decode_jsonb_udf` — the Spark path: one Arrow-batched pandas
  UDF over the binary column (binary → canonical JSON string; NULL and
  empty payloads → NULL, malformed → NULL so the caller can dead-letter
  via :func:`jsonb_malformed_udf` instead of poisoning the batch — the
  module-wide TRY_CAST discipline).

Format summary (field sizes little-endian unless noted):
``payload[0]`` = type byte; small object/array headers carry uint16
element-count + total-bytes, large carry uint32; object key entries are
(offset, uint16 len) pairs; value entries are (type byte, offset) with
INT16/UINT16/LITERAL — plus INT32/UINT32 in the large format — INLINED
in the entry's offset slot; strings/opaques carry a 7-bit-per-byte
varint length; opaque values embed a MySQL field type — NEWDECIMAL is
the 9-digits-per-4-bytes big-endian packed decimal with a sign bit,
TIME/DATETIME/DATE/TIMESTAMP are the packed bit layouts rendered to
their text forms.
"""

from __future__ import annotations

import json
import struct
from decimal import Decimal

from .json_cols import canonical_json

# type bytes (JsonConversion.java:12-28)
JSONB_TYPE_SMALL_OBJECT = 0x0
JSONB_TYPE_LARGE_OBJECT = 0x1
JSONB_TYPE_SMALL_ARRAY = 0x2
JSONB_TYPE_LARGE_ARRAY = 0x3
JSONB_TYPE_LITERAL = 0x4
JSONB_TYPE_INT16 = 0x5
JSONB_TYPE_UINT16 = 0x6
JSONB_TYPE_INT32 = 0x7
JSONB_TYPE_UINT32 = 0x8
JSONB_TYPE_INT64 = 0x9
JSONB_TYPE_UINT64 = 0xA
JSONB_TYPE_DOUBLE = 0xB
JSONB_TYPE_STRING = 0xC
JSONB_TYPE_OPAQUE = 0xF

_LITERAL_NULL, _LITERAL_TRUE, _LITERAL_FALSE = 0x0, 0x1, 0x2

# MySQL field types seen inside OPAQUE values (LogEvent constants)
_MYSQL_TYPE_NEWDECIMAL = 246
_MYSQL_TYPE_DATE = 10
_MYSQL_TYPE_TIME = 11
_MYSQL_TYPE_DATETIME = 12
_MYSQL_TYPE_TIMESTAMP = 7

# packed-decimal sizing (decimal.c dig2bytes; LogBuffer.java:1251-1259)
_DIG_PER_INT32 = 9
_DIG2BYTES = (0, 1, 1, 2, 2, 3, 3, 4, 4, 4)


class JsonbError(ValueError):
    """Malformed binary JSON payload."""


def _u16(b: memoryview, p: int) -> int:
    return b[p] | (b[p + 1] << 8)


def _u32(b: memoryview, p: int) -> int:
    return b[p] | (b[p + 1] << 8) | (b[p + 2] << 16) | (b[p + 3] << 24)


def _varint(b: memoryview, p: int, end: int) -> tuple[int, int]:
    """7-bits-per-byte length (JsonConversion.java:128-147): returns
    (value, bytes consumed)."""
    val = 0
    for i in range(min(5, end - p)):
        val |= (b[p + i] & 0x7F) << (7 * i)
        if not (b[p + i] & 0x80):
            if val > 0xFFFFFFFF:
                raise JsonbError("varint exceeds 32 bits")
            return val, i + 1
    raise JsonbError("unterminated varint length")


def _packed_decimal(b: memoryview, p: int, precision: int, scale: int):
    """9-digits-per-4-bytes big-endian packed decimal with a sign bit
    (decimal.c bin2decimal; LogBuffer.java:1251-1330). Returns a
    :class:`~decimal.Decimal` preserving the declared scale."""
    intg = precision - scale
    intg0, frac0 = intg // _DIG_PER_INT32, scale // _DIG_PER_INT32
    intg0x, frac0x = intg - intg0 * _DIG_PER_INT32, scale - frac0 * _DIG_PER_INT32
    size = intg0 * 4 + _DIG2BYTES[intg0x] + frac0 * 4 + _DIG2BYTES[frac0x]
    if p + size > len(b):
        raise JsonbError("decimal runs past payload")
    raw = bytearray(b[p:p + size])
    positive = bool(raw[0] & 0x80)
    raw[0] ^= 0x80
    if not positive:
        raw = bytearray((x ^ 0xFF) & 0xFF for x in raw)

    def take(n_digits: int, at: int) -> tuple[int, int]:
        nb = _DIG2BYTES[n_digits] if n_digits < _DIG_PER_INT32 else 4
        x = int.from_bytes(raw[at:at + nb], "big")
        return x, at + nb

    pos = 0
    int_digits = ""
    if intg0x:
        x, pos = take(intg0x, pos)
        int_digits += str(x)
    for _ in range(intg0):
        x, pos = take(9, pos)
        int_digits += f"{x:09d}" if int_digits else str(x)
    frac_digits = ""
    for _ in range(frac0):
        x, pos = take(9, pos)
        frac_digits += f"{x:09d}"
    if frac0x:
        x, pos = take(frac0x, pos)
        frac_digits += f"{x:0{frac0x}d}"
    int_digits = int_digits.lstrip("0") or "0"
    text = int_digits + (("." + frac_digits) if scale else "")
    return Decimal(("-" if not positive else "") + text)


def _packed_time(packed: int) -> str:
    """Packed TIME int64 → 'HH:MM:SS.ffffff' (JsonConversion.java:326-358)."""
    if packed == 0:
        return "00:00:00"
    ultime = abs(packed)
    intpart = ultime >> 24
    frac = ultime % (1 << 24)
    sign = "-" if packed < 0 else ""
    h = (intpart >> 12) % (1 << 10)
    return (
        f"{sign}{h:02d}:{(intpart >> 6) % 64:02d}:{intpart % 64:02d}"
        f".{frac:06d}"
    )


def _packed_datetime(packed: int) -> str:
    """Packed DATETIME int64 → 'YYYY-MM-DD HH:MM:SS.ffffff'
    (JsonConversion.java:360-395)."""
    if packed == 0:
        return "0000-00-00 00:00:00"
    ultime = abs(packed)
    intpart = ultime >> 24
    frac = ultime % (1 << 24)
    ymd = intpart >> 17
    ym = ymd >> 5
    hms = intpart % (1 << 17)
    return (
        f"{ym // 13:04d}-{ym % 13:02d}-{ymd % 32:02d} "
        f"{hms >> 12:02d}:{(hms >> 6) % 64:02d}:{hms % 64:02d}.{frac:06d}"
    )


def _parse_scalar(t: int, b: memoryview, p: int, end: int):
    if t == JSONB_TYPE_LITERAL:
        if p >= end:
            raise JsonbError("truncated literal")
        v = b[p]
        if v == _LITERAL_NULL:
            return None
        if v == _LITERAL_TRUE:
            return True
        if v == _LITERAL_FALSE:
            return False
        raise JsonbError(f"bad literal byte {v}")
    if t == JSONB_TYPE_INT16:
        return struct.unpack_from("<h", b, p)[0]
    if t == JSONB_TYPE_UINT16:
        return _u16(b, p)
    if t == JSONB_TYPE_INT32:
        return struct.unpack_from("<i", b, p)[0]
    if t == JSONB_TYPE_UINT32:
        return _u32(b, p)
    if t == JSONB_TYPE_INT64:
        return struct.unpack_from("<q", b, p)[0]
    if t == JSONB_TYPE_UINT64:
        return struct.unpack_from("<Q", b, p)[0]
    if t == JSONB_TYPE_DOUBLE:
        return struct.unpack_from("<d", b, p)[0]
    if t == JSONB_TYPE_STRING:
        n, used = _varint(b, p, end)
        if p + used + n > end:
            raise JsonbError("string runs past payload")
        return bytes(b[p + used:p + used + n]).decode("utf-8", errors="replace")
    if t == JSONB_TYPE_OPAQUE:
        if p >= end:
            raise JsonbError("truncated opaque")
        field_type = b[p]
        n, used = _varint(b, p + 1, end)
        dp = p + 1 + used
        if n == 0 or dp + n > end:
            raise JsonbError("opaque runs past payload")
        data = b[dp:dp + n]
        if field_type == _MYSQL_TYPE_NEWDECIMAL:
            if n < 2:
                raise JsonbError("truncated decimal header")
            return _packed_decimal(data, 2, data[0], data[1])
        if field_type == _MYSQL_TYPE_TIME:
            return _packed_time(struct.unpack_from("<q", data, 0)[0])
        if field_type in (_MYSQL_TYPE_DATE, _MYSQL_TYPE_DATETIME, _MYSQL_TYPE_TIMESTAMP):
            return _packed_datetime(struct.unpack_from("<q", data, 0)[0])
        # other opaque field types render byte-preserving (the module-wide
        # latin-1 convention — the reference renders via column charset,
        # JsonConversion.java:397-399)
        return bytes(data).decode("latin-1")
    raise JsonbError(f"unknown jsonb type {t}")


def _parse_value(t: int, b: memoryview, p: int, length: int):
    end = p + length
    if end > len(b):
        raise JsonbError("value runs past payload")
    if t in (JSONB_TYPE_SMALL_OBJECT, JSONB_TYPE_LARGE_OBJECT,
             JSONB_TYPE_SMALL_ARRAY, JSONB_TYPE_LARGE_ARRAY):
        large = t in (JSONB_TYPE_LARGE_OBJECT, JSONB_TYPE_LARGE_ARRAY)
        is_obj = t in (JSONB_TYPE_SMALL_OBJECT, JSONB_TYPE_LARGE_OBJECT)
        osz = 4 if large else 2
        if length < 2 * osz:
            raise JsonbError("container header truncated")
        read = _u32 if large else _u16
        count = read(b, p)
        total = read(b, p + osz)
        if total > length:
            raise JsonbError("container bytes exceed payload")
        key_entry = osz + 2  # key offset (osz bytes) + uint16 key length
        val_entry = 1 + osz  # type byte + offset-or-inlined-scalar slot
        header = 2 * osz + (count * key_entry if is_obj else 0) + count * val_entry
        if header > total:
            raise JsonbError("container header exceeds container")

        def element(i: int):
            e = p + 2 * osz + (count * key_entry if is_obj else 0) + i * val_entry
            et = b[e]
            # small scalars are INLINED in the offset slot
            # (JsonConversion.java:266-269): INT16/UINT16/LITERAL always,
            # INT32/UINT32 additionally in the large format
            if et in (JSONB_TYPE_INT16, JSONB_TYPE_UINT16, JSONB_TYPE_LITERAL) or (
                large and et in (JSONB_TYPE_INT32, JSONB_TYPE_UINT32)
            ):
                return _parse_scalar(et, b, e + 1, e + 1 + osz)
            off = read(b, e + 1)
            if off >= total:
                raise JsonbError("element offset out of range")
            return _parse_value(et, b, p + off, total - off)

        if not is_obj:
            return [element(i) for i in range(count)]
        out = {}
        for i in range(count):
            ke = p + 2 * osz + i * key_entry
            koff = read(b, ke)
            klen = _u16(b, ke + osz)
            if koff + klen > total:
                raise JsonbError("key runs past container")
            key = bytes(b[p + koff:p + koff + klen]).decode("utf-8", errors="replace")
            out[key] = element(i)
        return out
    return _parse_scalar(t, b, p, end)


def decode_jsonb(payload: bytes | None):
    """Binary JSONB payload (type byte + data) → Python object. ``None``
    and empty payloads → None (an empty column value is MySQL's NULL
    JSON on the wire); malformed bytes raise :class:`JsonbError`."""
    if payload is None or len(payload) == 0:
        return None
    try:
        return _parse_value(payload[0], memoryview(payload), 1, len(payload) - 1)
    except (struct.error, IndexError) as e:
        raise JsonbError(f"truncated jsonb payload: {e}") from e


def _canonical(obj, out: list) -> None:
    """Canonical serializer matching ``json_cols.canonical_json`` (sorted
    keys, compact separators) with one extension: :class:`Decimal` emits
    its exact plain digit text as a bare JSON number — the reference's
    ``toPlainString`` rendering (JsonConversion.java:322-325), no float
    round-trip."""
    if obj is None:
        out.append("null")
    elif obj is True:
        out.append("true")
    elif obj is False:
        out.append("false")
    elif isinstance(obj, Decimal):
        out.append(format(obj, "f"))
    elif isinstance(obj, int):
        out.append(str(obj))
    elif isinstance(obj, (float, str)):
        out.append(json.dumps(obj, ensure_ascii=False))
    elif isinstance(obj, list):
        out.append("[")
        for i, v in enumerate(obj):
            if i:
                out.append(",")
            _canonical(v, out)
        out.append("]")
    elif isinstance(obj, dict):
        out.append("{")
        for i, k in enumerate(sorted(obj)):
            if i:
                out.append(",")
            out.append(json.dumps(k, ensure_ascii=False))
            out.append(":")
            _canonical(obj[k], out)
        out.append("}")
    else:  # pragma: no cover — decode_jsonb never yields other types
        raise JsonbError(f"unserializable value {type(obj)}")


def jsonb_to_canonical_text(payload: bytes | None) -> str | None:
    """Binary JSONB → the engine's canonical JSON text (sorted keys,
    compact — ``json_cols.canonical_json``'s convention), so binary-wire
    and text-wire feeds normalize to IDENTICAL stored values. Decimals
    keep their exact digit text (no float round-trip)."""
    obj = decode_jsonb(payload)
    if obj is None:
        return None
    out: list = []
    _canonical(obj, out)
    return "".join(out)


def decode_jsonb_udf():
    """Arrow-batched pandas UDF: binary JSONB column → canonical JSON
    string. Malformed payloads → NULL (never throw in the executor — the
    poison-pill rule); pair with :func:`jsonb_malformed_udf` to
    dead-letter exactly those rows."""
    import pandas as pd  # noqa: F401 — annotation target
    from pyspark.sql.functions import pandas_udf

    def _dec(v):
        def one(x):
            if x is None:
                return None
            try:
                return jsonb_to_canonical_text(bytes(x))
            except (JsonbError, ValueError, struct.error, IndexError):
                return None
        return v.map(one)

    _dec.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_dec, "string")


def jsonb_malformed_udf():
    """Arrow-batched pandas UDF: true where a NON-EMPTY payload fails the
    decode — the dead-letter routing flag (empty/NULL payloads are the
    legitimate NULL JSON, never flagged)."""
    import pandas as pd  # noqa: F401 — annotation target
    from pyspark.sql.functions import pandas_udf

    def _flag(v):
        def one(x):
            if x is None or len(x) == 0:
                return False
            try:
                decode_jsonb(bytes(x))
                return False
            except (JsonbError, ValueError, struct.error, IndexError):
                return True
        return v.map(one)

    _flag.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_flag, "boolean")
