"""Unit tests for the vendored minimal protobuf runtime (vendor/pbshim).

The shim's real differential check is end-to-end: the JVM state server
parses its bytes with protobuf-java in test_tws_meter_matches_batch.
These tests pin the wire format against HAND-COMPUTED canonical vectors
(spec: https://protobuf.dev/programming-guides/encoding/) and the
descriptor parser against the real generated StateMessage_pb2 module.
"""

from __future__ import annotations

import pytest

from transitdata_monitor_data_collector_spark.protobuf_compat import (
    ensure_protobuf,
    protobuf_available,
)

if not ensure_protobuf():  # pragma: no cover - shim tree damaged
    pytest.skip("protobuf shim failed to load", allow_module_level=True)

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402
from google.protobuf.internal import _mini_runtime as rt  # noqa: E402


def _is_shim() -> bool:
    import google.protobuf as gp

    return bool(getattr(gp, "PROTOBUF_SHIM", False))


# ---------------------------------------------------------------------------
# varint primitives
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "value,encoded",
    [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (300, b"\xac\x02"),  # the spec's worked example
        ((1 << 64) - 1, b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"),
        # -1 as two's complement int64: ten 0xff-ish bytes
        (-1 & ((1 << 64) - 1), b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"),
    ],
)
def test_varint_canonical_vectors(value, encoded):
    if not _is_shim():
        pytest.skip("internals only exist in the shim")
    out = bytearray()
    rt.encode_varint(out, value)
    assert bytes(out) == encoded
    decoded, pos = rt.decode_varint(encoded, 0)
    assert decoded == value and pos == len(encoded)


# ---------------------------------------------------------------------------
# canonical message encodings (hand-computed from the public spec)
# ---------------------------------------------------------------------------

def test_scalar_message_canonical_bytes():
    # StateRequest.version is field 1, int32 -> tag 0x08
    assert sm.StateRequest(version=2).SerializeToString() == b"\x08\x02"
    # StateCallCommand.stateName field 1 string -> tag 0x0a, len, utf8
    cmd = sm.StateCallCommand(stateName="m")
    assert cmd.SerializeToString() == b"\x0a\x01m"
    # SetImplicitKey.key field 1 bytes
    assert sm.SetImplicitKey(key=b"\x00\xff").SerializeToString() == (
        b"\x0a\x02\x00\xff"
    )


def test_nested_oneof_canonical_bytes():
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        ),
    )
    # 08 02 | 12 04 (field 2 LEN) | 0a 02 (setHandleState) | 08 01 (CREATED)
    assert req.SerializeToString() == b"\x08\x02\x12\x04\x0a\x02\x08\x01"


def test_negative_int64_roundtrip():
    msg = sm.RegisterTimer(expiryTimestampMs=-1)
    data = msg.SerializeToString()
    assert data == b"\x08" + b"\xff" * 9 + b"\x01"
    back = sm.RegisterTimer()
    back.ParseFromString(data)
    assert back.expiryTimestampMs == -1


def test_repeated_bytes_roundtrip_and_defaults():
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"", b"ccc"], requireNextFetch=True
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(resp.SerializeToString())
    assert list(back.value) == [b"a", b"", b"ccc"]
    assert back.requireNextFetch is True
    assert back.statusCode == 0  # unset-on-wire -> default
    assert back.errorMessage == ""


def test_repeated_message_roundtrip():
    resp = sm.StateResponseWithMapIterator(
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=False,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_unknown_fields_are_skipped():
    # craft: known field statusCode=7 plus unknown field 99 (varint),
    # unknown field 98 (length-delimited)
    def tag(num, wt):
        out = bytearray()
        v = (num << 3) | wt
        while True:
            b = v & 0x7F
            v >>= 7
            out.append(b | (0x80 if v else 0))
            if not v:
                return bytes(out)

    payload = (
        b"\x08\x07"  # field 1 varint 7
        + tag(99, 0) + b"\x2a"  # unknown field 99 varint 42
        + tag(98, 2) + b"\x03abc"  # unknown field 98 LEN "abc"
    )
    msg = sm.StateResponse()
    msg.ParseFromString(payload)
    assert msg.statusCode == 7


def test_lazily_attached_submessage_serializes():
    cmd = sm.StateCallCommand()
    cmd.stateName = "meter"
    cmd.ttl.durationMs = 1234
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.stateName == "meter"
    assert back.ttl.durationMs == 1234


def test_enum_values_exposed_at_module_level():
    assert sm.PRE_INIT == 0
    assert sm.CREATED == 1
    assert sm.CLOSED == 5


def test_descriptor_matches_generated_module():
    d = sm.StateRequest.DESCRIPTOR
    assert d.full_name.endswith("state.StateRequest")
    by_name = d.fields_by_name
    assert by_name["version"].number == 1
    assert by_name["statefulProcessorCall"].number == 2
    assert by_name["timerRequest"].number == 5
    # oneof membership: every request arm shares the "method" oneof
    if _is_shim():
        assert by_name["statefulProcessorCall"].containing_oneof.name == "method"
        assert d.fields_by_number[3].name == "stateVariableRequest"


def test_has_field_and_which_oneof():
    if not _is_shim():
        pytest.skip("exercised via the real runtime elsewhere")
    req = sm.StateRequest(
        timerRequest=sm.TimerRequest(
            timerValueRequest=sm.TimerValueRequest(
                getWatermark=sm.GetWatermark()
            )
        )
    )
    assert req.WhichOneof("method") == "timerRequest"
    assert req.HasField("timerRequest")
    assert not req.HasField("statefulProcessorCall")


def test_packed_scalar_parse_accepted():
    if not _is_shim():
        pytest.skip("internals only exist in the shim")
    # parsers must accept packed encoding for repeated varints even though
    # we never emit it; fake a descriptor with a repeated int32 field
    desc = rt.Descriptor("Fake", "test.Fake")
    desc.add_field(
        rt.FieldDescriptor("xs", 1, rt.TYPE_INT32, rt.LABEL_REPEATED)
    )
    cls = rt.make_message_class(desc, __name__)
    msg = cls()
    msg.ParseFromString(b"\x0a\x03\x01\x02\x03")  # field 1 LEN [1,2,3]
    assert list(msg.xs) == [1, 2, 3]


def test_truncated_input_raises():
    if not _is_shim():
        pytest.skip("shim-specific error type")
    from google.protobuf.message import DecodeError

    with pytest.raises(DecodeError):
        sm.StateResponse().ParseFromString(b"\x0a\x05ab")  # LEN overruns


def test_shim_never_shadows_real_runtime():
    # protobuf_available() reflects whatever import currently resolves;
    # ensure_protobuf() must be a no-op beyond making it importable
    assert protobuf_available()
    assert ensure_protobuf()


def test_zigzag_vectors():
    if not _is_shim():
        pytest.skip("internals only exist in the shim")
    # spec table: 0->0, -1->1, 1->2, -2->3
    for raw, enc in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294)]:
        assert rt._zigzag_encode(raw) == enc
        assert rt._zigzag_decode(enc) == raw
