"""NetCDF-3 (classic) codec — stdlib + numpy, no netCDF4/scipy needed.

The reference ingests Met Office gridded weather from netCDF via the
netCDF4 library (``airflow/dags/ingest_weather_data.py:114-181``). That
library (and its HDF5 stack) is not available here, but the CLASSIC
NetCDF-3 container is a small, fully-documented big-endian binary
format (magic ``CDF\\x01``), so this module implements the edge
directly: :func:`parse_netcdf3` reads the header (dimensions, variable
table with shapes/types/offsets) and materializes each variable as a
numpy array; :func:`write_netcdf3` produces conformant files for
fixtures and tests. Together with ``sources/spatial.py`` (the
distributed nearest-grid-cell extraction) the whole S9 weather path —
binary grid file → arrays → Spark relation → spatial join — runs
inside the correctness gate (``q_netcdf_weather``).

Scope: non-record (fixed-shape) variables of types BYTE/SHORT/INT/
FLOAT/DOUBLE/CHAR, no attributes required (attribute lists are parsed
and skipped) — exactly the subset gridded snapshot files use. Record
(unlimited-dimension) variables raise a clear error.
"""

from __future__ import annotations

import struct

import numpy as np

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

#: nc_type → (struct/character code, byte size)
_TYPES = {
    1: ("b", 1),  # NC_BYTE
    2: ("S1", 1),  # NC_CHAR
    3: (">i2", 2),  # NC_SHORT
    4: (">i4", 4),  # NC_INT
    5: (">f4", 4),  # NC_FLOAT
    6: (">f8", 8),  # NC_DOUBLE
}
_REV_TYPES = {"int8": 1, "int16": 3, "int32": 4, "float32": 5, "float64": 6}


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def _name_bytes(s: str) -> bytes:
    e = s.encode()
    return struct.pack(">i", len(e)) + _pad4(e)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.data, self.pos)
        self.pos += 4
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.data[self.pos : self.pos + n].decode()
        self.pos += n + ((4 - n % 4) % 4)
        return s

    def skip_attrs(self) -> None:
        tag, count = self.i4(), self.i4()
        if tag == 0 and count == 0:
            return
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute-list tag {tag:#x}")
        for _ in range(count):
            self.name()
            nc_type = self.i4()
            nelems = self.i4()
            _, size = _TYPES[nc_type]
            total = nelems * size
            self.pos += total + ((4 - total % 4) % 4)


def parse_netcdf3(path: str) -> dict[str, tuple[tuple[str, ...], np.ndarray]]:
    """Read a classic NetCDF-3 file → {var_name: (dim_names, array)}."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:3] != b"CDF" or data[3] not in (1, 2):
        raise ValueError("not a classic NetCDF file (bad magic)")
    offset_width = data[3]  # 1 → 32-bit offsets, 2 → 64-bit
    r = _Reader(data)
    r.pos = 4
    numrecs = r.i4()
    # dimensions
    tag, ndims = r.i4(), r.i4()
    dims: list[tuple[str, int]] = []
    if tag == _NC_DIMENSION:
        for _ in range(ndims):
            dims.append((r.name(), r.i4()))
    elif not (tag == 0 and ndims == 0):
        raise ValueError(f"bad dimension-list tag {tag:#x}")
    r.skip_attrs()  # global attributes
    # variables
    tag, nvars = r.i4(), r.i4()
    out: dict[str, tuple[tuple[str, ...], np.ndarray]] = {}
    if tag == 0 and nvars == 0:
        return out
    if tag != _NC_VARIABLE:
        raise ValueError(f"bad variable-list tag {tag:#x}")
    for _ in range(nvars):
        vname = r.name()
        vnd = r.i4()
        dimids = [r.i4() for _ in range(vnd)]
        r.skip_attrs()
        nc_type = r.i4()
        r.i4()  # vsize (padded; recomputed below)
        if offset_width == 1:
            begin = r.i4()
        else:
            (begin,) = struct.unpack_from(">q", r.data, r.pos)
            r.pos += 8
        shape = tuple(dims[d][1] for d in dimids)
        dnames = tuple(dims[d][0] for d in dimids)
        if any(s == 0 for s in shape) and numrecs:
            raise NotImplementedError(
                "record (unlimited-dimension) variables are out of scope"
            )
        dtype, size = _TYPES[nc_type]
        count = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(
            data, dtype=dtype, count=count, offset=begin
        ).reshape(shape)
        out[vname] = (dnames, arr)
    return out


def write_netcdf3(
    path: str, dims: dict[str, int], variables: dict[str, tuple[tuple[str, ...], "np.ndarray"]]
) -> str:
    """Write a classic (CDF-1) NetCDF-3 file of fixed-shape variables.
    ``variables``: name → (dim_names, array); dtypes int8/16/32,
    float32/64."""
    dim_names = list(dims)
    dim_index = {n: i for i, n in enumerate(dim_names)}

    header = bytearray()
    header += b"CDF\x01" + struct.pack(">i", 0)  # numrecs = 0
    header += struct.pack(">ii", _NC_DIMENSION, len(dim_names))
    for n in dim_names:
        header += _name_bytes(n) + struct.pack(">i", dims[n])
    header += struct.pack(">ii", 0, 0)  # no global attributes

    # variable table with placeholder begins, patched after sizing
    header += struct.pack(">ii", _NC_VARIABLE, len(variables))
    begin_slots: list[tuple[int, int]] = []  # (slot offset, vsize)
    for name, (dnames, arr) in variables.items():
        nc_type = _REV_TYPES[str(arr.dtype.name)]
        _, size = _TYPES[nc_type]
        vsize = int(np.prod(arr.shape)) * size if arr.shape else size
        vsize_padded = vsize + ((4 - vsize % 4) % 4)
        header += _name_bytes(name)
        header += struct.pack(">i", len(dnames))
        for d in dnames:
            header += struct.pack(">i", dim_index[d])
        header += struct.pack(">ii", 0, 0)  # no variable attributes
        header += struct.pack(">i", nc_type)
        header += struct.pack(">i", vsize_padded)
        begin_slots.append((len(header), vsize_padded))
        header += struct.pack(">i", 0)  # begin placeholder

    begin = len(header)
    for slot, vsize_padded in begin_slots:
        struct.pack_into(">i", header, slot, begin)
        begin += vsize_padded

    with open(path, "wb") as f:
        f.write(header)
        for name, (dnames, arr) in variables.items():
            nc_type = _REV_TYPES[str(arr.dtype.name)]
            dtype, _ = _TYPES[nc_type]
            raw = np.ascontiguousarray(arr, dtype=dtype).tobytes()
            f.write(_pad4(raw))
    return path
