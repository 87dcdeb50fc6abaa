"""Self-contained NetCDF classic (CDF-2 / 64-bit-offset) writer and reader.

The reference stores every snapshot (= checkpoint) as a NetCDF dataset with
dimensions ``n3, n2, n1``, double coordinate variables named like the
dimensions, double field variables ``u, p, gl``, and a global-attribute
block carrying the full computation state (``intertrack.c:2327-2455``).
This image has no netCDF library, so the classic file format is implemented
directly (~200 lines); files are readable by ncdump/scipy/xarray and by
this module (for `continue_series` resume and icond loading).

Layout written: header (dims, global attrs, var metadata), then
non-record variable data in definition order, 4-byte aligned — the classic
format specification (CDF magic, NC_DIMENSION=0x0A, NC_VARIABLE=0x0B,
NC_ATTRIBUTE=0x0C).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

_DTYPE_TO_NC = {
    np.dtype(">i1"): NC_BYTE, np.dtype("S1"): NC_CHAR,
    np.dtype(">i2"): NC_SHORT, np.dtype(">i4"): NC_INT,
    np.dtype(">f4"): NC_FLOAT, np.dtype(">f8"): NC_DOUBLE,
}
_NC_TO_DTYPE = {v: k for k, v in _DTYPE_TO_NC.items()}
_NC_SIZE = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4,
            NC_DOUBLE: 8}

AttrValue = Union[int, float, str, np.ndarray]


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


def _enc_name(name: str) -> bytes:
    b = name.encode()
    return struct.pack(">i", len(b)) + b + b"\x00" * _pad4(len(b))


def _nc_type_of(value: AttrValue) -> Tuple[int, np.ndarray]:
    if isinstance(value, str):
        return NC_CHAR, np.frombuffer(value.encode(), dtype="S1")
    arr = np.atleast_1d(np.asarray(value))
    if np.issubdtype(arr.dtype, np.integer):
        return NC_INT, arr.astype(">i4")
    return NC_DOUBLE, arr.astype(">f8")


def _enc_attrs(attrs: Dict[str, AttrValue]) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)
    out = [struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))]
    for name, value in attrs.items():
        nct, arr = _nc_type_of(value)
        data = arr.tobytes()
        out.append(_enc_name(name))
        out.append(struct.pack(">ii", nct, len(arr)))
        out.append(data + b"\x00" * _pad4(len(data)))
    return b"".join(out)


def write_netcdf(
    path: str,
    dims: Dict[str, int],
    variables: Sequence[Tuple[str, Sequence[str], np.ndarray]],
    attrs: Dict[str, AttrValue],
) -> None:
    """Write a classic 64-bit-offset NetCDF file.

    ``variables`` is a sequence of (name, dim_names, data); data is written
    as float64 unless it has an integer dtype (then int32).
    """
    dim_names = list(dims)
    dim_ids = {n: i for i, n in enumerate(dim_names)}

    header = [b"CDF\x02", struct.pack(">i", 0)]  # magic + numrecs
    # dimensions
    header.append(struct.pack(">ii", _NC_DIMENSION, len(dims)))
    for n in dim_names:
        header.append(_enc_name(n) + struct.pack(">i", dims[n]))
    # global attributes
    header.append(_enc_attrs(attrs))

    # variable metadata: compute sizes first, offsets filled after header size
    var_meta = []
    for name, vdims, data in variables:
        arr = np.asarray(data)
        if np.issubdtype(arr.dtype, np.integer):
            arr = arr.astype(">i4")
            nct = NC_INT
        else:
            arr = arr.astype(">f8")
            nct = NC_DOUBLE
        expected = tuple(dims[d] for d in vdims)
        if arr.shape != expected:
            raise ValueError(
                f"variable {name!r}: shape {arr.shape} != dims {expected}")
        vsize = arr.size * _NC_SIZE[nct]
        vsize += _pad4(vsize)
        var_meta.append((name, vdims, arr, nct, vsize))

    # size of the var_list block (needed to know where data begins):
    var_block = [struct.pack(">ii", _NC_VARIABLE, len(var_meta))]
    fixed_entries = []
    for name, vdims, arr, nct, vsize in var_meta:
        entry = [_enc_name(name), struct.pack(">i", len(vdims))]
        for d in vdims:
            entry.append(struct.pack(">i", dim_ids[d]))
        entry.append(struct.pack(">ii", 0, 0))   # no per-var attributes
        entry.append(struct.pack(">ii", nct, vsize))
        fixed_entries.append(b"".join(entry))
    header_size = (sum(len(h) for h in header)
                   + len(var_block[0])
                   + sum(len(e) + 8 for e in fixed_entries))  # +8: begin (i64)

    offset = header_size
    begins = []
    for _, _, _, _, vsize in var_meta:
        begins.append(offset)
        offset += vsize

    with open(path, "wb") as f:
        for h in header:
            f.write(h)
        f.write(var_block[0])
        for entry, begin in zip(fixed_entries, begins):
            f.write(entry)
            f.write(struct.pack(">q", begin))
        for (_, _, arr, nct, vsize) in var_meta:
            raw = arr.tobytes()
            f.write(raw + b"\x00" * _pad4(len(raw)))


@dataclasses.dataclass
class NetCDFData:
    dims: Dict[str, int]
    variables: Dict[str, np.ndarray]
    var_dims: Dict[str, Tuple[str, ...]]
    attrs: Dict[str, AttrValue]


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def i4(self) -> int:
        return struct.unpack(">i", self.read(4))[0]

    def i8(self) -> int:
        return struct.unpack(">q", self.read(8))[0]

    def name(self) -> str:
        n = self.i4()
        s = self.read(n).decode()
        self.read(_pad4(n))
        return s

    def attr_value(self):
        nct = self.i4()
        nelems = self.i4()
        size = nelems * _NC_SIZE[nct]
        raw = self.read(size)
        self.read(_pad4(size))
        if nct == NC_CHAR:
            return raw.decode(errors="replace")
        arr = np.frombuffer(raw, dtype=_NC_TO_DTYPE[nct])
        if len(arr) == 1:
            return arr[0].item()
        return np.array(arr)


def read_netcdf(path: str) -> NetCDFData:
    """Read a classic NetCDF (CDF-1 or CDF-2) file written by this module
    (or any writer using non-record variables)."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    magic = r.read(4)
    if magic[:3] != b"CDF" or magic[3] not in (1, 2):
        raise ValueError(f"{path}: not a classic NetCDF file")
    offsets64 = magic[3] == 2
    r.i4()  # numrecs

    dims: Dict[str, int] = {}
    tag = r.i4()
    count = r.i4()
    dim_names: List[str] = []
    if tag == _NC_DIMENSION:
        for _ in range(count):
            n = r.name()
            dims[n] = r.i4()
            dim_names.append(n)

    attrs: Dict[str, AttrValue] = {}
    tag, count = r.i4(), r.i4()
    if tag == _NC_ATTRIBUTE:
        for _ in range(count):
            n = r.name()
            attrs[n] = r.attr_value()

    variables: Dict[str, np.ndarray] = {}
    var_dims: Dict[str, Tuple[str, ...]] = {}
    tag, count = r.i4(), r.i4()
    if tag == _NC_VARIABLE:
        for _ in range(count):
            vname = r.name()
            ndims = r.i4()
            vdims = tuple(dim_names[r.i4()] for _ in range(ndims))
            # per-var attributes (skipped into the void)
            atag, acount = r.i4(), r.i4()
            if atag == _NC_ATTRIBUTE:
                for _ in range(acount):
                    r.name()
                    r.attr_value()
            nct = r.i4()
            r.i4()  # vsize
            begin = r.i8() if offsets64 else r.i4()
            shape = tuple(dims[d] for d in vdims)
            n_items = int(np.prod(shape)) if shape else 1
            raw = buf[begin:begin + n_items * _NC_SIZE[nct]]
            arr = np.frombuffer(raw, dtype=_NC_TO_DTYPE[nct]).reshape(shape)
            variables[vname] = arr.astype(arr.dtype.newbyteorder("="))
            var_dims[vname] = vdims

    return NetCDFData(dims=dims, variables=variables, var_dims=var_dims,
                      attrs=attrs)
