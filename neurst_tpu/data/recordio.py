# Copyright 2026 The NeurST-TPU Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.
"""TFRecord-compatible record IO without a TensorFlow dependency.

The reference stores preprocessed corpora as TFRecord files of
``tf.train.Example`` protos (``/root/reference/neurst/data/dataset_utils.py``,
``neurst/cli/create_tfrecords.py``).  To keep those files (and the
recipes that produce them) usable, this module implements:

* the TFRecord framing format (length + masked crc32c of length, data,
  masked crc32c of data);
* a minimal protobuf wire-format codec for ``tf.train.Example``
  (features: map<string, Feature>, Feature = oneof {bytes_list,
  float_list, int64_list}).

Both directions (read/write) round-trip with TensorFlow's own readers
and writers.  crc32c uses the native ``google_crc32c`` wheel when
available, with a pure-python table fallback.
"""

import glob as _glob
import os
import struct
from typing import Dict, Iterator, List, Optional, Union

import numpy as np

__all__ = ["RecordWriter", "record_iterator", "parse_example",
           "build_example", "glob_record_files"]

try:
    import google_crc32c

    def _crc32c(data: bytes) -> int:
        return google_crc32c.value(data)
except ImportError:  # pragma: no cover
    _CRC_TABLE = None

    def _make_table():
        poly = 0x82F63B78
        table = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (poly if crc & 1 else 0)
            table.append(crc)
        return table

    def _crc32c(data: bytes) -> int:
        global _CRC_TABLE
        if _CRC_TABLE is None:
            _CRC_TABLE = _make_table()
        crc = 0xFFFFFFFF
        for b in data:
            crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
        return crc ^ 0xFFFFFFFF


_MASK_DELTA = 0xA282EAD8


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF)


# --------------------------------------------------------------------- #
# TFRecord framing
# --------------------------------------------------------------------- #

class RecordWriter(object):
    """Writes TFRecord-framed records to a file."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "wb")

    def write(self, record: bytes):
        header = struct.pack("<Q", len(record))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(record)
        self._f.write(struct.pack("<I", _masked_crc(record)))

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()


def record_iterator(path: str, check_crc: bool = False) -> Iterator[bytes]:
    """Yields raw record payloads from a TFRecord file.

    Every corruption mode raises IOError (never OverflowError /
    MemoryError / struct.error): the declared length is bounded by the
    remaining file size before being used as a read size, and the crc
    fields are length-checked before unpacking.
    """
    with open(path, "rb") as f:
        file_size = os.fstat(f.fileno()).st_size
        while True:
            header = f.read(8)
            if not header:
                return
            if len(header) != 8:
                raise IOError(f"Truncated record header in {path}")
            (length,) = struct.unpack("<Q", header)
            # a corrupted length field must not drive a giant read
            if length > file_size - f.tell():
                raise IOError(
                    f"Implausible record length {length} in {path}")
            len_crc = f.read(4)
            if len(len_crc) != 4:
                raise IOError(f"Truncated record length crc in {path}")
            if check_crc and struct.unpack("<I", len_crc)[0] != _masked_crc(header):
                raise IOError(f"Corrupted record length crc in {path}")
            data = f.read(length)
            if len(data) != length:
                raise IOError(f"Truncated record in {path}")
            data_crc = f.read(4)
            if len(data_crc) != 4:
                raise IOError(f"Truncated record data crc in {path}")
            if check_crc and struct.unpack("<I", data_crc)[0] != _masked_crc(data):
                raise IOError(f"Corrupted record data crc in {path}")
            yield data


def glob_record_files(file_path) -> List[str]:
    """Expands dirs (``*train*``), plain files, and prefix globs."""
    from neurst_tpu.utils.configurable import flatten_string_list
    out = []
    for f in flatten_string_list(file_path):
        if os.path.isdir(f):
            out.extend(sorted(_glob.glob(os.path.join(f, "*train*"))))
        elif os.path.exists(f):
            out.append(f)
        else:
            out.extend(sorted(_glob.glob(f + "*")))
    return out


# --------------------------------------------------------------------- #
# Minimal tf.train.Example protobuf wire codec
#
# message Example { Features features = 1; }
# message Features { map<string, Feature> feature = 1; }
# message Feature { oneof kind { BytesList b = 1; FloatList f = 2;
#                               Int64List i = 3; } }
# message BytesList { repeated bytes value = 1; }
# message FloatList { repeated float value = 1 [packed=true]; }
# message Int64List { repeated int64 value = 1 [packed=true]; }
# --------------------------------------------------------------------- #

def _write_varint(out: bytearray, value: int):
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return


def _read_varint(buf: bytes, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _tag(field_number: int, wire_type: int) -> int:
    return (field_number << 3) | wire_type


def _encode_len_delimited(out: bytearray, field_number: int, payload: bytes):
    _write_varint(out, _tag(field_number, 2))
    _write_varint(out, len(payload))
    out.extend(payload)


def _encode_bytes_list(values: List[bytes]) -> bytes:
    out = bytearray()
    for v in values:
        _encode_len_delimited(out, 1, v)
    return bytes(out)


def _encode_float_list(values) -> bytes:
    arr = np.asarray(values, dtype="<f4")
    out = bytearray()
    _write_varint(out, _tag(1, 2))
    payload = arr.tobytes()
    _write_varint(out, len(payload))
    out.extend(payload)
    return bytes(out)


def _encode_int64_list(values) -> bytes:
    out = bytearray()
    _write_varint(out, _tag(1, 2))
    body = bytearray()
    for v in values:
        _write_varint(body, int(v) & 0xFFFFFFFFFFFFFFFF)
    _write_varint(out, len(body))
    out.extend(body)
    return bytes(out)


def build_example(features: Dict[str, Union[List[bytes], np.ndarray, list]]) -> bytes:
    """Serializes {name: values} into a tf.train.Example proto.

    Value kinds are inferred: bytes/str -> bytes_list; float arrays ->
    float_list; ints -> int64_list.
    """
    feats = bytearray()
    for name, values in features.items():
        if isinstance(values, (bytes, str)):
            values = [values]
        if isinstance(values, np.ndarray):
            if values.dtype.kind == "f":
                feature_payload = _encode_float_list(values.reshape(-1))
                field_no = 2
            elif values.dtype.kind in ("i", "u"):
                feature_payload = _encode_int64_list(values.reshape(-1).tolist())
                field_no = 3
            else:
                raise ValueError(f"Unsupported ndarray dtype {values.dtype}")
        elif len(values) > 0 and isinstance(values[0], (bytes, str)):
            encoded = [v.encode("utf-8") if isinstance(v, str) else v
                       for v in values]
            feature_payload = _encode_bytes_list(encoded)
            field_no = 1
        elif len(values) > 0 and isinstance(values[0], float):
            feature_payload = _encode_float_list(values)
            field_no = 2
        else:
            feature_payload = _encode_int64_list(values)
            field_no = 3

        feature = bytearray()
        _encode_len_delimited(feature, field_no, feature_payload)
        entry = bytearray()
        _encode_len_delimited(entry, 1, name.encode("utf-8"))
        _encode_len_delimited(entry, 2, bytes(feature))
        _encode_len_delimited(feats, 1, bytes(entry))

    example = bytearray()
    _encode_len_delimited(example, 1, bytes(feats))
    return bytes(example)


def _parse_packed_or_repeated(buf: bytes, kind: str):
    """Parses a BytesList/FloatList/Int64List body."""
    pos = 0
    n = len(buf)
    if kind == "bytes":
        values = []
        while pos < n:
            tag, pos = _read_varint(buf, pos)
            assert tag == _tag(1, 2), f"unexpected tag {tag} in bytes_list"
            ln, pos = _read_varint(buf, pos)
            values.append(buf[pos:pos + ln])
            pos += ln
        return values
    if kind == "float":
        values = []
        while pos < n:
            tag, pos = _read_varint(buf, pos)
            wire = tag & 7
            if wire == 2:  # packed
                ln, pos = _read_varint(buf, pos)
                values.append(np.frombuffer(buf, dtype="<f4",
                                            count=ln // 4, offset=pos))
                pos += ln
            elif wire == 5:  # unpacked fixed32
                values.append(np.frombuffer(buf, dtype="<f4", count=1,
                                            offset=pos))
                pos += 4
            else:
                raise IOError("bad float_list wire type")
        if not values:
            return np.zeros([0], np.float32)
        return np.concatenate(values).astype(np.float32)
    if kind == "int64":
        values = []
        while pos < n:
            tag, pos = _read_varint(buf, pos)
            wire = tag & 7
            if wire == 2:  # packed
                ln, pos = _read_varint(buf, pos)
                end = pos + ln
                while pos < end:
                    v, pos = _read_varint(buf, pos)
                    if v >= 1 << 63:
                        v -= 1 << 64
                    values.append(v)
            elif wire == 0:
                v, pos = _read_varint(buf, pos)
                if v >= 1 << 63:
                    v -= 1 << 64
                values.append(v)
            else:
                raise IOError("bad int64_list wire type")
        return np.asarray(values, dtype=np.int64)
    raise ValueError(kind)


def parse_example(serialized: bytes) -> Dict[str, Union[List[bytes], np.ndarray]]:
    """Parses a serialized tf.train.Example into {name: values}."""
    pos = 0
    n = len(serialized)
    result: Dict[str, Union[List[bytes], np.ndarray]] = {}
    while pos < n:
        tag, pos = _read_varint(serialized, pos)
        if tag != _tag(1, 2):  # skip unknown fields
            pos = _skip_field(serialized, pos, tag)
            continue
        ln, pos = _read_varint(serialized, pos)
        features_buf = serialized[pos:pos + ln]
        pos += ln
        fpos = 0
        fn = len(features_buf)
        while fpos < fn:
            ftag, fpos = _read_varint(features_buf, fpos)
            if ftag != _tag(1, 2):
                fpos = _skip_field(features_buf, fpos, ftag)
                continue
            entry_len, fpos = _read_varint(features_buf, fpos)
            entry = features_buf[fpos:fpos + entry_len]
            fpos += entry_len
            name, feature_buf = _parse_map_entry(entry)
            result[name] = _parse_feature(feature_buf)
    return result


def _parse_map_entry(entry: bytes):
    pos = 0
    name = None
    feature_buf = b""
    while pos < len(entry):
        tag, pos = _read_varint(entry, pos)
        ln, pos = _read_varint(entry, pos)
        payload = entry[pos:pos + ln]
        pos += ln
        if tag == _tag(1, 2):
            name = payload.decode("utf-8")
        elif tag == _tag(2, 2):
            feature_buf = payload
    return name, feature_buf


def _parse_feature(buf: bytes):
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        ln, pos = _read_varint(buf, pos)
        payload = buf[pos:pos + ln]
        pos += ln
        if tag == _tag(1, 2):
            return _parse_packed_or_repeated(payload, "bytes")
        if tag == _tag(2, 2):
            return _parse_packed_or_repeated(payload, "float")
        if tag == _tag(3, 2):
            return _parse_packed_or_repeated(payload, "int64")
    return []


def _skip_field(buf: bytes, pos: int, tag: int) -> int:
    wire = tag & 7
    if wire == 0:
        _, pos = _read_varint(buf, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire == 5:
        pos += 4
    else:
        raise IOError(f"Cannot skip wire type {wire}")
    return pos
