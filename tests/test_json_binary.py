"""MySQL binary JSON (JSONB) decode — hand-computed byte fixtures per
the public storage format (mysql/sql/json_binary.h; the reference's
JsonConversion.java:1-431 is the cited decode). Every payload below was
laid out BY HAND from the spec, independently of the decoder under test,
so an implementation bug cannot hide behind a shared encoder."""

from decimal import Decimal

import pytest

from clever_canal_spark.sources.json_binary import (
    JsonbError,
    decode_jsonb,
    decode_jsonb_udf,
    jsonb_malformed_udf,
    jsonb_to_canonical_text,
)


def test_scalars_hand_bytes():
    # INT16 7 (type 0x05, little-endian)
    assert decode_jsonb(b"\x05\x07\x00") == 7
    assert decode_jsonb(b"\x05\xff\xff") == -1
    # UINT16 65535 (0x06)
    assert decode_jsonb(b"\x06\xff\xff") == 65535
    # INT32 / UINT32 / INT64 / UINT64
    assert decode_jsonb(b"\x07\x00\x00\x00\x80") == -(2**31)
    assert decode_jsonb(b"\x08\xff\xff\xff\xff") == 2**32 - 1
    assert decode_jsonb(b"\x09" + (2**40).to_bytes(8, "little")) == 2**40
    assert decode_jsonb(b"\x0a" + b"\xff" * 8) == 2**64 - 1
    # DOUBLE 1.5 = 0x3FF8000000000000 LE
    assert decode_jsonb(b"\x0b\x00\x00\x00\x00\x00\x00\xf8\x3f") == 1.5
    # STRING 'abc' (varint length 3)
    assert decode_jsonb(b"\x0c\x03abc") == "abc"
    # literals
    assert decode_jsonb(b"\x04\x00") is None
    assert decode_jsonb(b"\x04\x01") is True
    assert decode_jsonb(b"\x04\x02") is False
    # NULL JSON on the wire = empty payload
    assert decode_jsonb(b"") is None
    assert decode_jsonb(None) is None


def test_small_array_inlined_and_offset_elements():
    # [1, "ab"]: count=2, total=13; entry 0 inlines INT16 1; entry 1 is
    # a STRING at offset 10 (varint len 2 + bytes)
    payload = b"\x02" + b"\x02\x00" + b"\x0d\x00" + b"\x05\x01\x00" + b"\x0c\x0a\x00" + b"\x02ab"
    assert decode_jsonb(payload) == [1, "ab"]
    assert jsonb_to_canonical_text(payload) == '[1,"ab"]'


def test_small_object_hand_bytes():
    # {"a": 3}: count=1, total=12; key entry (offset=11, len=1); value
    # entry inlines INT16 3; key byte 'a' at offset 11
    payload = (
        b"\x00" + b"\x01\x00" + b"\x0c\x00"
        + b"\x0b\x00" + b"\x01\x00"      # key entry: offset 11, length 1
        + b"\x05\x03\x00"                  # value entry: inlined INT16 3
        + b"a"
    )
    assert decode_jsonb(payload) == {"a": 3}
    assert jsonb_to_canonical_text(payload) == '{"a":3}'


def test_large_array_inlines_int32():
    # large array [70000]: count/total are uint32; INT32 inlines in the
    # large format's 4-byte offset slot (small format would NOT inline it)
    payload = (
        b"\x03" + b"\x01\x00\x00\x00" + b"\x0d\x00\x00\x00"
        + b"\x07" + (70000).to_bytes(4, "little")
    )
    assert decode_jsonb(payload) == [70000]


def test_nested_container_body_has_no_type_byte():
    # [{"a":3}] — a nested container is stored WITHOUT its own type byte
    # (the type lives in the parent's value entry), and its internal
    # offsets are relative to its own start
    obj_body = (
        b"\x01\x00" + b"\x0c\x00" + b"\x0b\x00" + b"\x01\x00"
        + b"\x05\x03\x00" + b"a"
    )
    payload = b"\x02" + b"\x01\x00" + b"\x13\x00" + b"\x00\x07\x00" + obj_body
    assert decode_jsonb(payload) == [{"a": 3}]
    assert jsonb_to_canonical_text(payload) == '[{"a":3}]'


def test_opaque_decimal_time_datetime():
    # NEWDECIMAL(5,2) 123.45: precision/scale header then the packed
    # 9-digits-per-4-bytes big-endian form with the sign bit: int part
    # 123 -> 2 bytes 0x007B (sign bit -> 0x80 0x7B), frac 45 -> 0x2D
    dec = b"\x0f\xf6\x05\x05\x02\x80\x7b\x2d"
    assert decode_jsonb(dec) == Decimal("123.45")
    assert jsonb_to_canonical_text(dec) == "123.45"
    # negative: every byte inverted (sign bit clear)
    ndec = b"\x0f\xf6\x05\x05\x02\x7f\x84\xd2"
    assert decode_jsonb(ndec) == Decimal("-123.45")
    assert jsonb_to_canonical_text(ndec) == "-123.45"
    # TIME 13:14:15.000016 (packed: ((13<<12 | 14<<6 | 15) << 24) | 16)
    packed = ((13 << 12 | 14 << 6 | 15) << 24) | 16
    t = b"\x0f\x0b\x08" + packed.to_bytes(8, "little")
    assert decode_jsonb(t) == "13:14:15.000016"
    assert jsonb_to_canonical_text(t) == '"13:14:15.000016"'
    # DATETIME 2024-03-05 06:07:08.000009
    ym = 2024 * 13 + 3
    ymd = (ym << 5) | 5
    intpart = (ymd << 17) | (6 << 12 | 7 << 6 | 8)
    d = b"\x0f\x0c\x08" + ((intpart << 24) | 9).to_bytes(8, "little")
    assert decode_jsonb(d) == "2024-03-05 06:07:08.000009"
    # zero datetime / time sentinels
    z = b"\x0f\x0b\x08" + (0).to_bytes(8, "little")
    assert decode_jsonb(z) == "00:00:00"


def test_malformed_raises():
    for bad in (
        b"\x05\x07",              # truncated INT16
        b"\x0c\x05ab",            # string length past payload
        b"\x02\x01",              # container header truncated
        b"\x04\x09",              # bad literal byte
        b"\x99\x00",              # unknown type
        b"\x02\x02\x00\xff\x00" + b"\x05\x01\x00\x0c\x0a\x00",  # bytes > len
    ):
        with pytest.raises((JsonbError, ValueError)):
            decode_jsonb(bad)


def test_canonical_matches_text_wire_path():
    """Binary-wire decode lands byte-identical to the text-wire path's
    canonicalization — replay equality across wire formats."""
    from clever_canal_spark.sources.json_cols import canonical_json

    payload = b"\x02" + b"\x02\x00" + b"\x0d\x00" + b"\x05\x01\x00" + b"\x0c\x0a\x00" + b"\x02ab"
    assert jsonb_to_canonical_text(payload) == canonical_json([1, "ab"])
    obj = b"\x00\x01\x00\x0c\x00\x0b\x00\x01\x00\x05\x03\x00a"
    assert jsonb_to_canonical_text(obj) == canonical_json({"a": 3})


def test_udfs_end_to_end(spark):
    rows = [
        (1, b"\x00\x01\x00\x0c\x00\x0b\x00\x01\x00\x05\x03\x00a"),  # {"a":3}
        (2, b"\x0c\x03abc"),                                          # "abc"
        (3, None),                                                     # NULL
        (4, b""),                                                      # NULL JSON
        (5, b"\x05\x07"),                                              # malformed
    ]
    df = spark.createDataFrame(rows, "id int, j binary")
    dec, flag = decode_jsonb_udf(), jsonb_malformed_udf()
    got = {
        r["id"]: (r["txt"], r["bad"])
        for r in df.select("id", dec("j").alias("txt"), flag("j").alias("bad")).collect()
    }
    assert got == {
        1: ('{"a":3}', False),
        2: ('"abc"', False),
        3: (None, False),
        4: (None, False),
        5: (None, True),
    }
