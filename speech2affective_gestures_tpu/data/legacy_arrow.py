"""Pure-python reader for pyarrow<1.0 ``pyarrow.serialize`` blobs.

The original TED-db lmdb caches were written with pyarrow 0.14.0's legacy
``serialize`` API (reference requirements.txt pins pyarrow==0.14.0; records
written at utils/data_preprocessor.py:175-178 and read back at
loader_v2.py:~500 with ``pyarrow.deserialize``). pyarrow >= 4 removed
(de)serialize entirely, so in any modern environment those caches were
unreadable — this module restores read capability using only a modern
pyarrow's *stable* IPC primitives.

Blob layout (arrow 0.14 ``SerializedPyObject::WriteTo``,
cpp/src/arrow/python/serialize.cc):

    [int32 num_tensors][int32? num_sparse_tensors]
    [int32 num_ndarrays][int32 num_buffers]
    <pad to 8>
    RecordBatch stream (legacy framing, metadata V4):
        schema message + one batch (single dense-union column "list",
        length 1 = the [obj] wrapper the python serialize() adds) + EOS
    for each tensor, then each ndarray:
        <pad to 64> tensor IPC message
    for each buffer: int64 size + raw bytes

Arrow guarantees modern readers keep reading legacy-framed / V4 messages,
so the container is parsed here and the heavy lifting (record batch,
tensors) is delegated to ``pa.ipc``. Header variants (with/without the
sparse-tensor count, which landed mid-0.x) are auto-detected by attempting
the stream parse.

Python objects are rebuilt from the dense union by dispatching on each
child's *arrow type* and disambiguating sequence kinds by *field name*
("list"/"tuple"/"set"; struct = dict with keys/vals lists; int32 children
named "tensor"/"ndarray"/"buffer" index the out-of-band components) —
mirroring arrow 0.14 cpp/src/arrow/python/deserialize.cc::GetValue.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

try:
    import pyarrow as pa
except ImportError:  # pragma: no cover - pyarrow is baked into this image
    pa = None

_ALIGN_STREAM = 8
_ALIGN_TENSOR = 64


class LegacyFormatError(ValueError):
    pass


def _align(offset: int, alignment: int) -> int:
    return (offset + alignment - 1) & ~(alignment - 1)


def _try_header(buf: bytes, n_counts: int):
    """Parse `n_counts` little-endian int32 counts + pad-to-8; returns
    (counts, stream_offset) or None if implausible."""
    size = 4 * n_counts
    if len(buf) < size:
        return None
    counts = struct.unpack(f"<{n_counts}i", buf[:size])
    if any(c < 0 or c > 10_000_000 for c in counts):
        return None
    return counts, _align(size, _ALIGN_STREAM)


def _read_batch(buf: bytes, offset: int):
    """Read the single record batch by walking IPC messages one at a time,
    returning (batch, exact_end_offset_after_EOS).

    `pa.ipc.read_message` consumes exactly one framed message (it handles
    both pre-0.15 legacy framing — what 0.14 wrote — and the continuation
    framing), so `reader.tell()` is exact, unlike the buffered stream
    reader whose tell() can overshoot. The EOS marker after the batch is
    parsed explicitly: 4 bytes (int32 0, legacy) or 8 bytes
    (0xFFFFFFFF + int32 0, continuation)."""
    reader = pa.BufferReader(buf)
    reader.seek(offset)
    schema_msg = pa.ipc.read_message(reader)
    schema = pa.ipc.read_schema(schema_msg)
    batch_msg = pa.ipc.read_message(reader)
    batch = pa.ipc.read_record_batch(batch_msg, schema)
    pos = reader.tell()
    # stream EOS (arrow 0.14 WriteRecordBatchStream closes the stream):
    if buf[pos:pos + 8] == b"\xff\xff\xff\xff\x00\x00\x00\x00":
        pos += 8
    elif buf[pos:pos + 4] == b"\x00\x00\x00\x00":
        pos += 4
    else:
        raise LegacyFormatError(
            f"no stream-EOS marker at offset {pos} after the record batch"
        )
    return batch, pos


def _read_tensors(buf: bytes, offset: int, count: int):
    """Read `count` tensor IPC messages from `offset`, each at the exact
    64-byte-aligned position the 0.14 writer produced (serialize.cc
    WriteTo: AlignStream(kTensorAlignment=64) before the block and after
    every WriteTensor). A tensor that fails to parse at its deterministic
    offset gets ONE fallback probe at the next 64-byte boundary (arrow
    builds with slightly different padding conventions), with a warning;
    anything else is a format error, raised loudly."""
    tensors = []
    reader = pa.BufferReader(buf)
    pos = offset
    for k in range(count):
        pos = _align(pos, _ALIGN_TENSOR)
        if pos >= len(buf):
            raise LegacyFormatError(
                f"tensor component {k}/{count}: offset {pos} past end of blob"
            )
        try:
            reader.seek(pos)
            t = pa.ipc.read_tensor(reader)
        except (pa.ArrowInvalid, OSError) as e:
            fallback = pos + _ALIGN_TENSOR
            try:
                reader.seek(fallback)
                t = pa.ipc.read_tensor(reader)
            except Exception:
                raise LegacyFormatError(
                    f"tensor component {k}/{count} failed to parse at its "
                    f"aligned offset {pos} (and at the one-shot fallback "
                    f"{fallback}): {e}"
                ) from e
            import warnings

            warnings.warn(
                f"legacy blob: tensor component {k} found at {fallback}, "
                f"64 bytes past the predicted offset {pos} (non-0.14 "
                "padding convention?)", stacklevel=3,
            )
        pos = reader.tell()
        tensors.append(t.to_numpy())
    return tensors, pos


def _union_children(arr: "pa.UnionArray"):
    ty = arr.type
    return {ty.type_codes[i]: ty.field(i).name for i in range(ty.num_fields)}


def _from_scalar(scalar, field_name: str, comps: dict) -> Any:
    """One dense-union element -> python object (deserialize.cc::GetValue)."""
    value = scalar.value
    if value is None or not scalar.is_valid:
        return None
    ty = value.type
    if pa.types.is_int32(ty) and field_name in ("tensor", "ndarray", "buffer"):
        pool = {"tensor": "tensors", "ndarray": "ndarrays",
                "buffer": "buffers"}[field_name]
        idx = value.as_py()
        if idx >= len(comps[pool]):
            raise LegacyFormatError(
                f"{field_name} component index {idx} out of range "
                f"({len(comps[pool])} {pool} in header)"
            )
        return comps[pool][idx]
    if pa.types.is_struct(ty):  # dict: field 0 = keys list, field 1 = vals
        keys = _from_list_scalar(value["keys"], comps)
        vals = _from_list_scalar(value["vals"], comps)
        d = dict(zip(keys, vals))
        return _maybe_custom(d)
    if pa.types.is_list(ty):
        items = _from_list_scalar(value, comps)
        if field_name == "tuple":
            return tuple(items)
        if field_name == "set":
            return set(items)
        return items
    if pa.types.is_string(ty) or pa.types.is_binary(ty) or \
            pa.types.is_boolean(ty) or pa.types.is_integer(ty) or \
            pa.types.is_floating(ty):
        return value.as_py()
    if pa.types.is_date64(ty) or pa.types.is_timestamp(ty):
        return value.as_py()
    return value.as_py()


def _from_list_scalar(list_scalar, comps: dict) -> list:
    out = []
    for element in list_scalar:
        if element is None or not element.is_valid:
            out.append(None)
            continue
        name = _scalar_field_name(element)
        out.append(_from_scalar(element, name, comps))
    return out


def _scalar_field_name(union_scalar) -> str:
    ty = union_scalar.type
    code = union_scalar.type_code
    for i in range(ty.num_fields):
        if ty.type_codes[i] == code:
            return ty.field(i).name
    return ""


def _maybe_custom(d: dict) -> Any:
    """0.14's python-level fallback serializes unknown types through the
    SerializationContext as dicts tagged "_pytype_". Only numpy scalars are
    reconstructed here (the only tagged type TED data can contain); anything
    else raises so corruption is loud, not silent."""
    tag = d.get("_pytype_")
    if tag is None:
        return d
    if isinstance(tag, bytes):
        tag = tag.decode()
    if tag.startswith("np.") or tag.startswith("numpy."):
        data = d.get("data")
        dtype = d.get("dtype")
        if dtype is not None:
            return np.dtype(str(dtype)).type(data)
    raise LegacyFormatError(f"unsupported custom-serialized type {tag!r}")


def deserialize(data: bytes) -> Any:
    """Modern-environment replacement for ``pyarrow.deserialize`` (legacy
    0.14 blobs). Supports everything the TED caches contain: nested
    lists/tuples/dicts/sets, str/bytes/bool/int/float/None, numpy arrays."""
    if pa is None:
        raise ImportError("pyarrow is required for legacy deserialization")
    buf = bytes(data)

    errors = []
    # header variants: 0.14.0 writes 4 counts (tensors, sparse, ndarrays,
    # buffers); earliest 0.x wrote 3. Try the 0.14 layout first. Each
    # variant's FULL walk is attempted — a mid-walk failure under one
    # header interpretation (e.g. a 3-count blob with buffers misread as
    # 4-count) must not pre-empt the other; only when every variant fails
    # is the combined cause list raised.
    for n_counts in (4, 3):
        parsed = _try_header(buf, n_counts)
        if parsed is None:
            errors.append(f"{n_counts}-count header: too short/implausible")
            continue
        counts, offset = parsed
        if n_counts == 4:
            num_tensors, num_sparse, num_ndarrays, num_buffers = counts
            if num_sparse:
                # either a genuine sparse-tensor blob (unsupported, never
                # produced by the TED pipeline) or a 3-count header read
                # as 4 counts — try the next variant
                errors.append(
                    "4-count header: nonzero sparse-tensor count "
                    f"({num_sparse}) — sparse tensors are not supported"
                )
                continue
        else:
            num_tensors, num_ndarrays, num_buffers = counts
        try:
            return _decode_with_counts(
                buf, offset, num_tensors, num_ndarrays, num_buffers
            )
        except (LegacyFormatError, pa.ArrowInvalid, OSError) as e:
            errors.append(f"{n_counts}-count header: {e}")
    raise LegacyFormatError(
        "unrecognized legacy serialize blob: " + "; ".join(errors)
    )


def _decode_with_counts(buf: bytes, offset: int, num_tensors: int,
                        num_ndarrays: int, num_buffers: int) -> Any:
    """Walk one header interpretation end-to-end; raises LegacyFormatError
    (or ArrowInvalid/OSError from pa.ipc) if the blob is inconsistent under
    these counts."""
    batch, pos = _read_batch(buf, offset)
    tensors, pos = _read_tensors(buf, pos, num_tensors)
    ndarrays, pos = _read_tensors(buf, pos, num_ndarrays)
    buffers = []
    # the buffer block always starts 64-aligned: the writer aligns
    # after the stream and after every tensor (serialize.cc WriteTo)
    pos = _align(pos, _ALIGN_TENSOR)
    for b_idx in range(num_buffers):
        try:
            (size,) = struct.unpack_from("<q", buf, pos)
        except struct.error as e:
            raise LegacyFormatError(
                f"buffer component {b_idx}/{num_buffers}: size field at "
                f"{pos} past end of blob"
            ) from e
        pos += 8
        if size < 0 or pos + size > len(buf):
            raise LegacyFormatError(
                f"buffer component {b_idx}/{num_buffers}: size {size} at "
                f"{pos} exceeds blob length {len(buf)}"
            )
        buffers.append(buf[pos:pos + size])
        pos += size
    comps = {"tensors": tensors, "ndarrays": ndarrays, "buffers": buffers}

    col = batch.column(0)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.UnionArray):
        raise LegacyFormatError(
            f"expected a union column, got {col.type}"
        )
    # element 0 is python serialize()'s [obj] wrapper
    wrapper = _from_scalar(col[0], _scalar_field_name(col[0]), comps)
    if not isinstance(wrapper, list) or len(wrapper) != 1:
        raise LegacyFormatError("missing top-level [obj] wrapper")
    return wrapper[0]


# ---------------------------------------------------------------------------
# fixture writer: byte-compatible-by-construction emitter of the SAME layout
# (used by tests to round-trip; also lets tools/export_ted_cache.py fixtures
# exist without a pyarrow-0.14 environment)
# ---------------------------------------------------------------------------

def _build_union(objs: list, comps: dict):
    """Build a dense union over `objs` with 0.14's child naming."""
    type_ids, offsets = [], []
    children: dict[str, list] = {}
    order: list[str] = []

    def child(name):
        if name not in children:
            children[name] = []
            order.append(name)
        return children[name]

    sub_arrays: dict[str, Any] = {}
    for obj in objs:
        if isinstance(obj, bool):
            name, store = "bool", obj
        elif isinstance(obj, (int, np.integer)):
            name, store = "int", int(obj)
        elif isinstance(obj, (float, np.floating)):
            name, store = "double", float(obj)
        elif isinstance(obj, str):
            name, store = "string", obj
        elif isinstance(obj, bytes):
            name, store = "bytes", obj
        elif isinstance(obj, np.ndarray):
            name, store = "ndarray", len(comps["ndarrays"])
            comps["ndarrays"].append(obj)
        elif isinstance(obj, tuple):
            name, store = "tuple", list(obj)
        elif isinstance(obj, set):
            name, store = "set", sorted(obj)
        elif isinstance(obj, list):
            name, store = "list", obj
        elif isinstance(obj, dict):
            name, store = "dict", obj
        elif obj is None:
            name, store = "none", None
        else:
            raise TypeError(f"fixture writer cannot serialize {type(obj)}")
        lst = child(name)
        type_ids.append(name)
        offsets.append(len(lst))
        lst.append(store)

    for name in order:
        vals = children[name]
        if name == "bool":
            sub_arrays[name] = pa.array(vals, pa.bool_())
        elif name == "int":
            sub_arrays[name] = pa.array(vals, pa.int64())
        elif name == "double":
            sub_arrays[name] = pa.array(vals, pa.float64())
        elif name == "string":
            sub_arrays[name] = pa.array(vals, pa.string())
        elif name == "bytes":
            sub_arrays[name] = pa.array(vals, pa.binary())
        elif name in ("ndarray", "tensor", "buffer"):
            sub_arrays[name] = pa.array(vals, pa.int32())
        elif name == "none":
            sub_arrays[name] = pa.array(vals, pa.null())
        elif name in ("list", "tuple", "set"):
            flat, offs = [], [0]
            for v in vals:
                flat.extend(v)
                offs.append(len(flat))
            inner = _build_union(flat, comps)
            sub_arrays[name] = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), inner
            )
        elif name == "dict":
            keys_flat, vals_flat = [], []
            koffs, voffs = [0], [0]
            for d in vals:
                keys_flat.extend(d.keys())
                vals_flat.extend(d.values())
                koffs.append(len(keys_flat))
                voffs.append(len(vals_flat))
            karr = pa.ListArray.from_arrays(
                pa.array(koffs, pa.int32()), _build_union(keys_flat, comps)
            )
            varr = pa.ListArray.from_arrays(
                pa.array(voffs, pa.int32()), _build_union(vals_flat, comps)
            )
            sub_arrays[name] = pa.StructArray.from_arrays(
                [karr, varr], ["keys", "vals"]
            )
    code_of = {name: i for i, name in enumerate(order)}
    return pa.UnionArray.from_dense(
        pa.array([code_of[n] for n in type_ids], pa.int8()),
        pa.array(offsets, pa.int32()),
        [sub_arrays[n] for n in order],
        order,
        list(range(len(order))),
    )


def serialize_legacy(obj: Any, header_counts: int = 4,
                     legacy_framing: bool = True) -> bytes:
    """Write `obj` in the 0.14 serialize layout (legacy IPC framing, V4
    metadata). Produced for tests/fixtures; real 0.14 blobs are read-only.

    legacy_framing=False emits the post-0.15 continuation framing instead
    (8-byte EOS, tensors keep the 0xFFFFFFFF marker) — never produced by
    0.14 itself, but exercises the reader's framing autodetection."""
    comps = {"ndarrays": []}
    union = _build_union([[obj]], comps)  # [obj] wrapper like serialize()
    batch = pa.RecordBatch.from_arrays([union], ["list"])

    out = bytearray()
    counts = ([0, 0, len(comps["ndarrays"]), 0] if header_counts == 4
              else [0, len(comps["ndarrays"]), 0])
    out += struct.pack(f"<{header_counts}i", *counts)
    out += b"\x00" * (_align(len(out), _ALIGN_STREAM) - len(out))

    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(
        metadata_version=pa.ipc.MetadataVersion.V4,
        use_legacy_format=legacy_framing,
    )
    writer = pa.ipc.new_stream(sink, batch.schema, options=opts)
    writer.write_batch(batch)
    writer.close()
    out += sink.getvalue().to_pybytes()

    for arr in comps["ndarrays"]:
        out += b"\x00" * (_align(len(out), _ALIGN_TENSOR) - len(out))
        tsink = pa.BufferOutputStream()
        pa.ipc.write_tensor(pa.Tensor.from_numpy(np.ascontiguousarray(arr)),
                            tsink)
        tbytes = tsink.getvalue().to_pybytes()
        # write_tensor emits modern framing (0xFFFFFFFF continuation);
        # 0.14 wrote legacy framing — strip the marker to match
        if legacy_framing and tbytes[:4] == b"\xff\xff\xff\xff":
            tbytes = tbytes[4:]
        out += tbytes
    return bytes(out)
