"""Hand-assemble a pyarrow-0.14 ``serialize`` golden blob, byte by byte.

Purpose (round-3 verdict item #4): `data/legacy_arrow.py` was previously
validated only against its own in-repo emitter (`serialize_legacy`) — a
shared misconception about the wire format would pass every test. This
script constructs a blob through a COMPLETELY DIFFERENT code path, writing
every container element by hand from the documented arrow-0.14 layout
(cpp/src/arrow/python/serialize.cc::SerializedPyObject::WriteTo):

    [int32 num_tensors][int32 num_sparse][int32 num_ndarrays][int32 num_buffers]
    <pad to 8>
    record-batch stream, LEGACY pre-0.15 framing:
        [int32 metadata_size][metadata flatbuffer][body]  per message
        [int32 0] EOS
    per tensor, then per ndarray: <pad to 64> tensor message (legacy framing)
    <pad to 64> per buffer: [int64 size][raw bytes]

It does NOT call legacy_arrow.serialize_legacy, pa.ipc.new_stream's
use_legacy_format path, or legacy_arrow._build_union: the union arrays are
constructed explicitly per nesting level (mirroring deserialize.cc child
naming), the messages are hand-framed from raw Message.metadata/body
buffers, and all padding/EOS/length fields are literal bytes written here.
The only delegated piece is the inner flatbuffers themselves (schema /
record-batch / tensor metadata), which both this script and the reader
obtain from pa.ipc — arrow's own cross-version IPC guarantee covers those.

Output: tests/fixtures/legacy_arrow_golden.bin (committed binary fixture).
The expected decoded payload is duplicated in tests/test_legacy_golden.py.

Run:  python tools/make_golden_legacy_blob.py [out_path]
"""

from __future__ import annotations

import struct
import sys

import numpy as np
import pyarrow as pa

STREAM_ALIGN = 8
TENSOR_ALIGN = 64


# ---------------------------------------------------------------------------
# payload — shaped like a TED-db record ([words, arrays..., aux_info dict])
# plus the component kinds the in-repo emitter can NOT produce (a pa.Tensor
# component and a raw-buffer component), so the fixture is strictly stronger
# than any emitter round-trip.
# ---------------------------------------------------------------------------

def payload_arrays():
    poses = np.arange(12, dtype=np.float32).reshape(3, 4)
    vec = np.linspace(-1.0, 1.0, 6, dtype=np.float32).reshape(2, 3)
    audio = (np.arange(8, dtype=np.int16) * 3)
    tensor = np.array([[7, -2], [0, 41]], dtype=np.int64)
    return poses, vec, audio, tensor


BUFFER_PAYLOAD = b"BUFDATA!"


# ---------------------------------------------------------------------------
# hand-built union column (explicit per level; deserialize.cc child naming)
# ---------------------------------------------------------------------------

def _dense_union(type_names, type_ids, offsets, children):
    return pa.UnionArray.from_dense(
        pa.array(type_ids, pa.int8()),
        pa.array(offsets, pa.int32()),
        children,
        type_names,
        list(range(len(type_names))),
    )


def build_batch() -> pa.RecordBatch:
    # L3: the word-triple scalars: "hello" 0.5 0.9 "world" 1.0 1.5
    l3 = _dense_union(
        ["string", "double"],
        [0, 1, 1, 0, 1, 1],
        [0, 0, 1, 1, 2, 3],
        [pa.array(["hello", "world"], pa.string()),
         pa.array([0.5, 0.9, 1.0, 1.5], pa.float64())],
    )
    # L2: two word triples, each a "list"
    l2 = _dense_union(
        ["list"], [0, 0], [0, 1],
        [pa.ListArray.from_arrays(pa.array([0, 3, 6], pa.int32()), l3)],
    )
    # tuple contents: (1, 2.5, "t")
    tup_inner = _dense_union(
        ["int", "double", "string"],
        [0, 1, 2], [0, 0, 0],
        [pa.array([1], pa.int64()), pa.array([2.5], pa.float64()),
         pa.array(["t"], pa.string())],
    )
    # dict {"vid": "abc123", "start_frame_no": 120, "end_frame_no": 154,
    #       "fps": 15.0} -> struct{keys: list<union>, vals: list<union>}
    dict_keys_u = _dense_union(
        ["string"], [0, 0, 0, 0], [0, 1, 2, 3],
        [pa.array(["vid", "start_frame_no", "end_frame_no", "fps"],
                  pa.string())],
    )
    dict_vals_u = _dense_union(
        ["string", "int", "double"],
        [0, 1, 1, 2], [0, 0, 1, 0],
        [pa.array(["abc123"], pa.string()),
         pa.array([120, 154], pa.int64()),
         pa.array([15.0], pa.float64())],
    )
    dict_struct = pa.StructArray.from_arrays(
        [pa.ListArray.from_arrays(pa.array([0, 4], pa.int32()), dict_keys_u),
         pa.ListArray.from_arrays(pa.array([0, 4], pa.int32()), dict_vals_u)],
        ["keys", "vals"],
    )
    # L1: the 11 payload items
    #   [words, nd0, nd1, nd2, dict, True, None, tuple, bytes, tensor, buffer]
    l1 = _dense_union(
        ["list", "ndarray", "dict", "bool", "none", "tuple", "bytes",
         "tensor", "buffer"],
        [0, 1, 1, 1, 2, 3, 4, 5, 6, 7, 8],
        [0, 0, 1, 2, 0, 0, 0, 0, 0, 0, 0],
        [
            pa.ListArray.from_arrays(pa.array([0, 2], pa.int32()), l2),
            pa.array([0, 1, 2], pa.int32()),          # ndarray indices
            dict_struct,
            pa.array([True], pa.bool_()),
            pa.array([None], pa.null()),
            pa.ListArray.from_arrays(pa.array([0, 3], pa.int32()), tup_inner),
            pa.array([BUFFER_PAYLOAD[:0] + b"\x00\x01binary"], pa.binary()),
            pa.array([0], pa.int32()),                # tensor index
            pa.array([0], pa.int32()),                # buffer index
        ],
    )
    # the payload object itself (a list of the 11 items)
    payload_u = _dense_union(
        ["list"], [0], [0],
        [pa.ListArray.from_arrays(pa.array([0, 11], pa.int32()), l1)],
    )
    # L0: python serialize() wraps the object as [obj] — a 1-element list
    l0 = _dense_union(
        ["list"], [0], [0],
        [pa.ListArray.from_arrays(pa.array([0, 1], pa.int32()), payload_u)],
    )
    return pa.RecordBatch.from_arrays([l0], ["list"])


# ---------------------------------------------------------------------------
# hand framing: pre-0.15 encapsulated message = int32 size + metadata + body
# ---------------------------------------------------------------------------

def frame_legacy(msg: "pa.Message") -> bytes:
    """Frame a message the way arrow < 0.15 wrote it: [int32 metadata_size]
    [metadata flatbuffer, padded so size-prefix+metadata is 8-aligned][body].
    The size field includes the padding (arrow IPC spec)."""
    meta = msg.metadata.to_pybytes()
    pad = (-(4 + len(meta))) % STREAM_ALIGN
    body = b"" if msg.body is None else msg.body.to_pybytes()
    return struct.pack("<i", len(meta) + pad) + meta + b"\x00" * pad + body


def split_messages(stream_bytes: bytes, n: int):
    reader = pa.BufferReader(stream_bytes)
    return [pa.ipc.read_message(reader) for _ in range(n)]


def build_blob() -> bytes:
    poses, vec, audio, tensor = payload_arrays()
    batch = build_batch()

    # source messages with V4 metadata (what 0.14 wrote), MODERN framing —
    # the legacy framing below is hand-written, not the writer's
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(
        metadata_version=pa.ipc.MetadataVersion.V4, use_legacy_format=False
    )
    w = pa.ipc.new_stream(sink, batch.schema, options=opts)
    w.write_batch(batch)
    w.close()
    schema_msg, batch_msg = split_messages(sink.getvalue().to_pybytes(), 2)

    def tensor_msg(arr):
        tsink = pa.BufferOutputStream()
        pa.ipc.write_tensor(pa.Tensor.from_numpy(np.ascontiguousarray(arr)),
                            tsink)
        return split_messages(tsink.getvalue().to_pybytes(), 1)[0]

    out = bytearray()
    # header: num_tensors, num_sparse_tensors, num_ndarrays, num_buffers
    out += struct.pack("<4i", 1, 0, 3, 1)
    out += b"\x00" * ((-len(out)) % STREAM_ALIGN)
    assert len(out) == 16

    # record-batch stream, legacy framing, explicit 4-byte EOS
    out += frame_legacy(schema_msg)
    out += frame_legacy(batch_msg)
    out += b"\x00\x00\x00\x00"

    # tensor components first, then ndarray components, each 64-aligned
    for arr in (tensor, poses, vec, audio):
        out += b"\x00" * ((-len(out)) % TENSOR_ALIGN)
        out += frame_legacy(tensor_msg(arr))

    # buffer block: 64-aligned start, [int64 size][bytes] each
    out += b"\x00" * ((-len(out)) % TENSOR_ALIGN)
    out += struct.pack("<q", len(BUFFER_PAYLOAD)) + BUFFER_PAYLOAD
    return bytes(out)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        "tests/fixtures/legacy_arrow_golden.bin"
    blob = build_blob()
    with open(out_path, "wb") as f:
        f.write(blob)
    print(f"wrote {len(blob)} bytes to {out_path}")

    # self-check: decode through the reader under test and print the shape
    sys.path.insert(0, ".")
    from speech2affective_gestures_tpu.data import legacy_arrow
    obj = legacy_arrow.deserialize(blob)
    print("decoded:", [type(x).__name__ for x in obj])


if __name__ == "__main__":
    main()
