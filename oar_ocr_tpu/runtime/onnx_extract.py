"""Minimal ONNX initializer extraction (protobuf wire format).

The reference consumes upstream ``.onnx`` artifacts whole through ONNX
Runtime (oar-ocr-core/src/core/inference/ort_infer_execution.rs:121);
this framework re-expresses every topology natively (flax modules) and
only needs the WEIGHTS, so a small wire-format reader replaces the
``onnx``/protobuf dependency (not available in this environment):

    ModelProto.graph (field 7) → GraphProto.initializer (field 5,
    repeated TensorProto) → {name: np.ndarray}

TensorProto fields read: dims (1), data_type (2), float_data (4),
int32_data (5), int64_data (7), name (8), raw_data (9), double_data
(10). Nodes, attributes and subgraphs are skipped by wire type; models
whose weights live in control-flow subgraphs or sparse initializers are
out of scope (no PP-OCR/layout deploy export uses either — they are
plain feed-forward graphs).

Used by tools/fetch_and_verify.py: the one-command
download → extract → convert → predict → parity path for real
checkpoints (VERDICT r4 item 8).
"""

from __future__ import annotations

import struct
from typing import Dict, Optional, Tuple

import numpy as np

# TensorProto.DataType → numpy (onnx.proto3 enum values)
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _read_varint(buf, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf, start: int = 0, end: Optional[int] = None):
    """Iterate (field_number, wire_type, value) over one message's bytes.
    value: int (wt 0), bytes-like slice (wt 2), 8 raw bytes (wt 1),
    4 raw bytes (wt 5)."""
    end = len(buf) if end is None else end
    i = start
    while i < end:
        key, i = _read_varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")
        yield fn, wt, v


def _varints(buf) -> list:
    out = []
    i = 0
    n = len(buf)
    while i < n:
        v, i = _read_varint(buf, i)
        out.append(v)
    return out


def _to_signed64(v: int) -> int:
    """Protobuf varints are two's-complement 64-bit for plain int64."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _parse_tensor(buf) -> Tuple[str, np.ndarray]:
    dims = []
    dtype_code = 1
    name = ""
    raw = None
    f32_parts, f64_parts = [], []
    i32_vals, i64_vals = [], []
    for fn, wt, v in _fields(buf):
        if fn == 1:                                     # dims
            if wt == 0:
                dims.append(_to_signed64(v))
            else:                                       # packed
                dims.extend(_to_signed64(x) for x in _varints(v))
        elif fn == 2 and wt == 0:                       # data_type
            dtype_code = v
        elif fn == 8 and wt == 2:                       # name
            name = bytes(v).decode("utf-8")
        elif fn == 9 and wt == 2:                       # raw_data
            raw = bytes(v)
        elif fn == 4:                                   # float_data
            f32_parts.append(bytes(v) if wt == 2 else struct.pack("<f", *(
                struct.unpack("<f", bytes(v)))))
        elif fn == 10:                                  # double_data
            f64_parts.append(bytes(v) if wt == 2 else bytes(v))
        elif fn == 5:                                   # int32_data
            i32_vals.extend(_varints(v) if wt == 2 else [v])
        elif fn == 7:                                   # int64_data
            i64_vals.extend(_varints(v) if wt == 2 else [v])
    dt = _DTYPES.get(dtype_code)
    if dt is None:
        raise ValueError(
            f"initializer {name!r}: unsupported data_type {dtype_code}")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dt)
    elif f32_parts:
        arr = np.frombuffer(b"".join(f32_parts), dtype=np.float32).astype(
            dt, copy=False)
    elif f64_parts:
        arr = np.frombuffer(b"".join(f64_parts), dtype=np.float64).astype(
            dt, copy=False)
    elif i64_vals:
        arr = np.array([_to_signed64(v) for v in i64_vals],
                       np.int64).astype(dt, copy=False)
    elif i32_vals:
        # int32_data also carries f16/bool/u8 payloads per the spec
        vals = np.array([_to_signed64(v) for v in i32_vals], np.int64)
        if dtype_code == 10:                            # float16 in u16
            arr = vals.astype(np.uint16).view(np.float16)
        else:
            arr = vals.astype(dt)
    else:
        arr = np.zeros((0,), dt)
    return name, arr.reshape(dims).copy()


def extract_initializers(path_or_bytes) -> Dict[str, np.ndarray]:
    """Read an ONNX model file (path or bytes) and return its graph
    initializers as ``{tensor_name: ndarray}``. The topology is ignored
    — this framework's models are native re-expressions; conversion maps
    (runtime/ppocr_maps.py, runtime/convert_maps.py) consume exactly
    these deploy-format names."""
    if isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
        data = memoryview(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = memoryview(f.read())
    out: Dict[str, np.ndarray] = {}
    found_graph = False
    for fn, wt, v in _fields(data):
        if fn == 7 and wt == 2:                         # ModelProto.graph
            found_graph = True
            for gfn, gwt, gv in _fields(v):
                if gfn == 5 and gwt == 2:               # initializer
                    name, arr = _parse_tensor(gv)
                    out[name] = arr
                elif gfn == 15 and gwt == 2:            # sparse_initializer
                    raise ValueError(
                        "sparse ONNX initializers are not supported")
    if not found_graph:
        raise ValueError("no GraphProto found — not an ONNX model?")
    return out
