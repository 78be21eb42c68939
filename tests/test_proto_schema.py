"""Bounded .proto text parser + Confluent protobuf body codec
(parsers/proto_schema.py ≈ the reference's confluentschemaregistry
engine protobuf support: format_protobuf.go, utils_protobuf.go,
protobuf_extractor/) — wire-exact fixtures built with the repo's own
protowire encoder, no protoc."""

from __future__ import annotations

import pytest

from transferia_spark.parsers.proto_schema import (
    PROTO_COLUMN_TYPES,
    ProtoCodec,
    ProtoSchema,
    field_spec,
)
from transferia_spark.parsers.protowire import encode_message
from transferia_spark.parsers.schema_registry import (
    encode_message_indexes,
    extract_message_indexes,
)

ORDERS = """
syntax = "proto3";
package demo.orders;
option java_package = "com.demo";  // options are skipped
import "common.proto";

/* block comment with stray braces { } */
message Order {
  int64 id = 1;
  string customer = 2;
  double total = 3;
  repeated Line lines = 4;
  Status status = 5;
  map<string, int64> counts = 6;
  oneof payment { string card = 7; string iban = 8; }
  bytes blob = 9 [deprecated = true];
  common.Address ship_to = 10;
  repeated int32 marks = 11;

  message Line { string sku = 1; int32 qty = 2; }
  enum Status { NEW = 0; SHIPPED = 1; reserved 5; }
  reserved 100 to 110;
}

message Heartbeat {
  fixed64 at = 1;
  message Inner { bool ok = 1; }
}
"""

COMMON = """
syntax = "proto3";
package common;
message Address { string city = 1; uint32 zip = 2; }
"""


def _codec() -> ProtoCodec:
    return ProtoCodec(ORDERS, imports={"common.proto": COMMON})


def test_parse_and_decode_full_message():
    codec = _codec()
    msg = codec.schema.message_by_indexes([0])
    assert msg.full_name == "demo.orders.Order"
    body = encode_message(field_spec(msg), {
        "id": 42, "customer": "acme", "total": 9.5,
        "lines": [{"sku": "a", "qty": 2}, {"sku": "b", "qty": 3}],
        "status": 1,
        "counts": [{"key": "x", "value": 7}, {"key": "y", "value": 8}],
        "card": "visa", "blob": b"\x01\x02",
        "ship_to": {"city": "berlin", "zip": 10115},
        "marks": [3, -1],
    })
    out = codec.decode(body, [0])
    assert out == {
        "id": 42, "customer": "acme", "total": 9.5,
        "lines": [{"sku": "a", "qty": 2}, {"sku": "b", "qty": 3}],
        "status": "SHIPPED",          # enum decodes to its symbol name
        "counts": {"x": 7, "y": 8},   # map folds to a dict
        "card": "visa", "iban": "",   # oneof members are plain fields
        "blob": b"\x01\x02",
        "ship_to": {"city": "berlin", "zip": 10115},
        "marks": [3, -1],
    }


def test_proto3_defaults_for_absent_fields():
    """An empty body reads as all-defaults — what the reference sees
    through protoreflect's GetFieldByName (utils_protobuf.go)."""
    out = _codec().decode(b"", [0])
    assert out == {
        "id": 0, "customer": "", "total": 0.0, "lines": [],
        "status": "NEW", "counts": {}, "card": "", "iban": "",
        "blob": b"", "ship_to": None, "marks": [],
    }


def test_message_indexes_walk_nested_declarations():
    codec = _codec()
    inner = codec.schema.message_by_indexes([1, 0])
    assert inner.full_name == "demo.orders.Heartbeat.Inner"
    body = encode_message(field_spec(inner), {"ok": True})
    assert codec.decode(body, [1, 0]) == {"ok": True}
    with pytest.raises(ValueError, match="out of range"):
        codec.schema.message_by_indexes([5])


def test_message_indexes_codec_and_zero_shortcut():
    # the Confluent wire shortcut: a single 0 byte means [0]
    assert encode_message_indexes([0]) == b"\x00"
    for ix in ([0], [1], [1, 0], [2, 5, 1]):
        enc = encode_message_indexes(ix)
        dec, rest = extract_message_indexes(enc + b"BODY")
        assert (dec, rest) == (ix, b"BODY")
    with pytest.raises(ValueError, match="implausible"):
        extract_message_indexes(encode_message_indexes(list(range(200))))


def test_columns_match_reference_type_mapping():
    """types_protobuf.go:14 — scalars map to engine types,
    repeated/map/message → any, enum → string."""
    cols = dict((n, t) for n, t, _ in _codec().columns([0]))
    assert cols == {
        "id": "bigint", "customer": "string", "total": "double",
        "lines": "any", "status": "string", "counts": "any",
        "card": "string", "iban": "string", "blob": "binary",
        "ship_to": "any", "marks": "any",
    }
    assert PROTO_COLUMN_TYPES["sint64"] == "bigint"


def test_map_entries_with_omitted_default_values_backfill():
    """proto3 implicit presence: encoders omit default values inside
    map entries, so the decoder must backfill the default for enum,
    message, and scalar value types (code-review r11 pass 4)."""
    from transferia_spark.parsers.protowire import encode_varint

    codec = ProtoCodec("""
        syntax = "proto3";
        message M {
          map<string, Cat> cats = 1;
          map<string, Sub> subs = 2;
          map<string, int64> nums = 3;
          enum Cat { ODD = 0; EVEN = 1; }
          message Sub { int32 x = 1; }
        }
    """)

    def entry(field_num: int, key: str) -> bytes:
        # an entry message carrying ONLY the key (value omitted = default)
        body = encode_varint(1 << 3 | 2) + encode_varint(len(key)) \
            + key.encode()
        return encode_varint(field_num << 3 | 2) \
            + encode_varint(len(body)) + body

    out = codec.decode(entry(1, "a") + entry(2, "b") + entry(3, "c"))
    assert out == {
        "cats": {"a": "ODD"}, "subs": {"b": {"x": 0}}, "nums": {"c": 0}
    }


def test_message_field_with_wrong_wire_type_is_loud():
    codec = ProtoCodec(
        "syntax = \"proto3\"; message M { Sub s = 1; "
        "message Sub { int32 x = 1; } }"
    )
    from transferia_spark.parsers.protowire import encode_varint

    # field 1 arrives as a varint (wire type 0) where a message is
    # declared — must not read the value as a byte length
    with pytest.raises(ValueError, match="wire type 0"):
        codec.decode(encode_varint(1 << 3 | 0) + encode_varint(300))


def test_decode_memoizes_field_spec_per_message(monkeypatch):
    import transferia_spark.parsers.proto_schema as ps

    codec = _codec()
    calls = []
    real = ps.field_spec
    monkeypatch.setattr(
        ps, "field_spec", lambda m, d=frozenset(): (
            calls.append(m.full_name) or real(m, d))
    )
    for _ in range(5):
        codec.decode(b"", [0])
        codec.decode(b"", [1, 0])
    assert calls.count("demo.orders.Order") == 1
    assert calls.count("demo.orders.Heartbeat.Inner") == 1


def test_recursive_message_and_group_are_loud():
    rec = ProtoSchema(
        "syntax = \"proto3\"; message Node { Node next = 1; }"
    )
    with pytest.raises(ValueError, match="recursive"):
        field_spec(rec.messages[0])
    with pytest.raises(ValueError, match="group"):
        ProtoSchema(
            "syntax = \"proto2\"; message M { "
            "optional group G = 1 { optional int32 x = 2; } }"
        )


def test_unknown_type_reference_is_loud():
    with pytest.raises(ValueError, match="unknown proto type"):
        ProtoSchema("message M { Missing f = 1; }")


def test_scoping_innermost_wins_and_leading_dot_is_absolute():
    schema = ProtoSchema("""
        package p;
        message T { string tag = 1; }
        message Outer {
          message T { int64 tag = 1; }
          T inner_ref = 1;        // resolves to Outer.T
          .p.T outer_ref = 2;     // absolute → p.T
        }
    """)
    outer = schema.messages[1]
    assert outer.fields[0].resolved.full_name == "p.Outer.T"
    assert outer.fields[1].resolved.full_name == "p.T"


def test_packed_and_unpacked_repeated_scalars_agree():
    codec = ProtoCodec(
        "syntax = \"proto3\"; message V { repeated int64 xs = 1; }"
    )
    spec = field_spec(codec.schema.messages[0])
    unpacked = encode_message(spec, {"xs": [1, 2, 300]})
    # packed form: one length-delimited run of varints
    from transferia_spark.parsers.protowire import encode_varint

    payload = b"".join(encode_varint(v) for v in (1, 2, 300))
    packed = encode_varint(1 << 3 | 2) + encode_varint(len(payload)) + payload
    assert codec.decode(unpacked) == codec.decode(packed) == {
        "xs": [1, 2, 300]
    }


def test_map_entry_occupies_confluent_nested_index_slot():
    """protoc materializes map<k,v> fields as synthetic <Field>Entry
    nested messages at their declaration position, and Confluent
    message-indexes are computed over those descriptor nested_type
    arrays — so Order (map `counts` declared before `message Line`)
    has nested slots [CountsEntry, Line] and a serializer addresses
    Line as [0, 1] (ADVICE r11: without the placeholder the walk
    decoded the wrong message or spuriously errored)."""
    codec = _codec()
    line = codec.schema.message_by_indexes([0, 1])
    assert line.full_name == "demo.orders.Order.Line"
    body = encode_message(field_spec(line), {"sku": "a1", "qty": 3})
    assert codec.decode(body, [0, 1]) == {"sku": "a1", "qty": 3}
    # addressing the synthetic entry itself is loud, not a bogus decode
    with pytest.raises(ValueError, match="synthetic map-entry"):
        codec.schema.message_by_indexes([0, 0])
    # the synthetic type registers under its descriptor full name,
    # with the protoc CamelCase convention for snake_case field names
    two = ProtoSchema("""
        syntax = "proto3";
        message M {
          map<string, string> my_attr_set = 1;
          message N { bool ok = 1; }
        }
    """)
    assert [m.full_name for m in two.messages[0].nested] == [
        "M.MyAttrSetEntry", "M.N",
    ]
    assert two.message_by_indexes([0, 1]).name == "N"
