"""proto/vc.proto <-> hand-rolled codec synchronization gate.

The gRPC server speaks the protobuf wire format by hand (no grpc_tools
codegen in this image), so any evolution of proto/vc.proto must be
mirrored manually in runtime/grpcserver.py.  This test makes that
mirror mechanical: it parses the .proto text for every message's field
numbers/types and asserts the codec encodes/decodes exactly those
numbers with the length-delimited wire type the comment contract
promises.
"""

import os
import re

import numpy as np

from beatrice_vst_tpu.runtime import grpcserver as g

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_proto(path):
    """{message: {field_name: (number, type)}} from a proto3 file."""
    text = re.sub(r"//[^\n]*", "", open(path).read())
    messages = {}
    for m in re.finditer(r"message\s+(\w+)\s*\{", text):
        # walk to the matching brace (oneof blocks nest one level)
        depth, pos = 1, m.end()
        while depth and pos < len(text):
            if text[pos] == "{":
                depth += 1
            elif text[pos] == "}":
                depth -= 1
            pos += 1
        body = text[m.end():pos - 1]
        fields = {}
        for f in re.finditer(
                r"(?:^|\n)\s*(?:repeated\s+)?(\w+)\s+(\w+)\s*=\s*(\d+)\s*;",
                body):
            ftype, fname, fno = f.group(1), f.group(2), int(f.group(3))
            fields[fname] = (fno, ftype)
        messages[m.group(1)] = fields
    return messages


def test_proto_file_matches_codec():
    msgs = parse_proto(os.path.join(REPO, "proto", "vc.proto"))
    # the messages the server speaks
    for name in ("ClientMsg", "ServerMsg", "MetricsRequest", "MetricsReply"):
        assert name in msgs, name
    for name in ("ClientMsg", "ServerMsg"):
        assert msgs[name]["control_json"] == (1, "string"), msgs[name]
        assert msgs[name]["audio_f32"] == (2, "bytes"), msgs[name]
    assert msgs["MetricsReply"]["json"] == (1, "string")
    assert msgs["MetricsRequest"] == {}

    # every field the contract declares is length-delimited (string/bytes)
    # -- the only wire type the hand-rolled codec implements
    for name, fields in msgs.items():
        for fname, (fno, ftype) in fields.items():
            assert ftype in ("string", "bytes"), (
                f"{name}.{fname} is {ftype}: the hand-rolled codec only "
                "speaks wire type 2; extend _pb_fields before evolving "
                "the proto")


def test_codec_round_trips_proto_numbers():
    # encode with the codec, decode with the codec, and check the raw
    # bytes carry the .proto's field keys ((no << 3) | 2)
    jm = g._json_msg({"op": "hello", "sample_rate": 48000})
    assert jm[0] == (1 << 3) | 2
    kind, payload, dialect = g._decode_frame(jm)
    assert (kind, dialect) == ("json", "proto")
    assert b"hello" in payload

    am = g._audio_msg(np.ones(7, np.float32))
    assert am[0] == (2 << 3) | 2
    kind, payload, dialect = g._decode_frame(am)
    assert (kind, dialect) == ("audio", "proto")
    assert np.frombuffer(payload, np.float32).shape == (7,)

    # legacy dialect still disjoint on the first byte
    assert g._decode_frame(bytes([g.TAG_JSON]) + b"{}")[2] == "legacy"
    assert g._decode_frame(bytes([g.TAG_AUDIO]) + b"\0\0\0\0")[2] == "legacy"
