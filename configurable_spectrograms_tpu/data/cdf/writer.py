"""Writer for single-file CDF V3 files (synthetic fixtures and exports).

Produces spec-conformant CDF V3.7 single-file containers with z-variables,
optional per-variable GZIP compression (CVVR), optional whole-file
compression (CCR), and global attributes.  Used by the synthetic FAST
fixture generator (the reference repo ships no data, so tests and
benchmarks generate their own CDFs) and round-trip tested against
:mod:`configurable_spectrograms_tpu.data.cdf.reader`.
"""

from __future__ import annotations

import gzip
import struct
from typing import Any

import numpy as np

_ENCODING_IBMPC = 6  # little-endian variable data

_NP_TO_CDF: dict[str, int] = {
    "int8": 1,
    "int16": 2,
    "int32": 4,
    "int64": 8,
    "uint8": 11,
    "uint16": 12,
    "uint32": 14,
    "float32": 21,
    "float64": 22,
}


def _pack_name(name: str) -> bytes:
    raw = name.encode("latin-1")[:256]
    return raw + b"\x00" * (256 - len(raw))


class _Builder:
    def __init__(self) -> None:
        self.chunks: list[bytes] = []
        self.pos = 0

    def add(self, data: bytes) -> int:
        off = self.pos
        self.chunks.append(data)
        self.pos += len(data)
        return off

    def patch(self, chunk_index: int, offset_in_chunk: int, value: int, fmt: str = ">q") -> None:
        c = bytearray(self.chunks[chunk_index])
        struct.pack_into(fmt, c, offset_in_chunk, value)
        self.chunks[chunk_index] = bytes(c)


def _record(rtype: int, body: bytes) -> bytes:
    return struct.pack(">qi", 12 + len(body), rtype) + body


def write_cdf(
    path: str,
    variables: dict[str, np.ndarray],
    global_attrs: dict[str, Any] | None = None,
    compress: str = "none",
    row_major: bool = True,
) -> str:
    """Write *variables* to a single-file CDF V3 at *path*.

    Parameters
    ----------
    path : str
        Output file path.
    variables : dict of {str: numpy.ndarray}
        Variable name -> array; axis 0 is the record dimension, the
        remaining axes become the z-variable dimensions.
    global_attrs : dict or None
        Global attributes (str or scalar values).
    compress : {'none', 'gzip', 'file'}
        ``'gzip'`` compresses each variable's records into a CVVR;
        ``'file'`` wraps the whole container in a CCR.
    row_major : bool, default True
        Record-interior element order.

    Returns
    -------
    str
        The *path* written.
    """
    if compress not in ("none", "gzip", "file"):
        raise ValueError(f"unsupported compress mode {compress!r}")
    b = _Builder()
    b.add(struct.pack(">II", 0xCDF30001, 0x0000FFFF))

    # --- CDR ---------------------------------------------------------------
    flags = 0x2 | (0x1 if row_major else 0x0)  # single-file (+ row-major)
    cdr_body = bytearray()
    cdr_body += struct.pack(">q", 0)  # GDRoffset (patched)
    cdr_body += struct.pack(">iiii", 3, 7, _ENCODING_IBMPC, flags)
    cdr_body += struct.pack(">iiiii", 0, 0, 0, 3, 0)  # rfuA,rfuB,Increment,Identifier,rfuE
    cdr_body += b"\x00" * 256  # copyright
    cdr_index = len(b.chunks)
    b.add(_record(1, bytes(cdr_body)))

    # --- GDR (patched later with heads/eof) ---------------------------------
    names = list(variables)
    gdr_body = bytearray()
    gdr_body += struct.pack(">qqqq", 0, 0, 0, 0)  # rVDRhead, zVDRhead, ADRhead, eof
    gdr_body += struct.pack(">iiii", 0, 0, -1, 0)  # NrVars, NumAttr, rMaxRec, rNumDims
    gdr_body += struct.pack(">i", len(names))  # NzVars
    gdr_body += struct.pack(">q", 0)  # UIRhead
    gdr_body += struct.pack(">iii", 0, 0, 0)  # rfuC, LeapSecondLastUpdated, rfuE
    gdr_index = len(b.chunks)
    gdr_off = b.add(_record(2, bytes(gdr_body)))
    b.patch(cdr_index, 12, gdr_off)

    # --- variables -----------------------------------------------------------
    zvdr_head = 0
    prev_vdr_index: int | None = None
    per_var_gzip = compress == "gzip"
    for num, name in enumerate(names):
        arr = np.ascontiguousarray(variables[name]) if row_major else np.asfortranarray(variables[name])
        if arr.dtype.name not in _NP_TO_CDF:
            raise ValueError(f"variable {name!r}: unsupported dtype {arr.dtype}")
        data_type = _NP_TO_CDF[arr.dtype.name]
        n_rec = int(arr.shape[0]) if arr.ndim else 1
        dims = tuple(int(s) for s in arr.shape[1:])
        le = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
        rec_bytes = le.tobytes(order="C" if row_major else "F")

        vdr_body = bytearray()
        vdr_body += struct.pack(">q", 0)  # VDRnext (patched)
        vdr_body += struct.pack(">ii", data_type, n_rec - 1)  # DataType, MaxRec
        vdr_body += struct.pack(">qq", 0, 0)  # VXRhead, VXRtail (patched)
        vdr_flags = 0x1 | (0x4 if per_var_gzip else 0)  # rec-vary (+compressed)
        vdr_body += struct.pack(">ii", vdr_flags, 0)  # Flags, SRecords
        vdr_body += struct.pack(">iii", 0, 0, -1)  # rfuB, rfuC, rfuF
        vdr_body += struct.pack(">ii", 1, num)  # NumElems, Num
        vdr_body += struct.pack(">q", 0)  # CPRorSPRoffset (patched if gzip)
        vdr_body += struct.pack(">i", n_rec)  # BlockingFactor
        vdr_body += _pack_name(name)
        vdr_body += struct.pack(">i", len(dims))
        for d in dims:
            vdr_body += struct.pack(">i", d)
        for _ in dims:
            vdr_body += struct.pack(">i", -1)  # DimVarys: true
        vdr_index = len(b.chunks)
        vdr_off = b.add(_record(8, bytes(vdr_body)))
        if prev_vdr_index is None:
            zvdr_head = vdr_off
        else:
            b.patch(prev_vdr_index, 12, vdr_off)  # prior VDRnext
        prev_vdr_index = vdr_index

        if per_var_gzip:
            cpr_body = struct.pack(">iiii", 5, 0, 1, 6)  # GZIP, rfuA, pCount, level
            cpr_off = b.add(_record(11, cpr_body))
            b.patch(vdr_index, 12 + 8 + 8 + 16 + 8 + 12 + 8, cpr_off)
            cdata = gzip.compress(rec_bytes, compresslevel=6)
            cvvr_body = struct.pack(">iq", 0, len(cdata)) + cdata
            data_off = b.add(_record(13, cvvr_body))
        else:
            data_off = b.add(_record(7, rec_bytes))

        vxr_body = bytearray()
        vxr_body += struct.pack(">q", 0)  # VXRnext
        vxr_body += struct.pack(">ii", 1, 1)  # Nentries, NusedEntries
        vxr_body += struct.pack(">i", 0)  # First
        vxr_body += struct.pack(">i", n_rec - 1)  # Last
        vxr_body += struct.pack(">q", data_off)
        vxr_off = b.add(_record(6, bytes(vxr_body)))
        b.patch(vdr_index, 12 + 8 + 8, vxr_off)  # VXRhead
        b.patch(vdr_index, 12 + 8 + 8 + 8, vxr_off)  # VXRtail

    # --- global attributes -----------------------------------------------------
    gattrs = dict(global_attrs or {})
    adr_head = 0
    prev_adr_index: int | None = None
    for attr_num, (aname, avalue) in enumerate(gattrs.items()):
        adr_body = bytearray()
        adr_body += struct.pack(">q", 0)  # ADRnext (patched)
        adr_body += struct.pack(">q", 0)  # AgrEDRhead (patched below)
        adr_body += struct.pack(">ii", 1, attr_num)  # Scope=global, Num
        adr_body += struct.pack(">ii", 1, 0)  # NgrEntries, MAXgrEntry
        adr_body += struct.pack(">i", 0)  # rfuA
        adr_body += struct.pack(">q", 0)  # AzEDRhead
        adr_body += struct.pack(">iii", 0, -1, 0)  # NzEntries, MAXzEntry, rfuE
        adr_body += _pack_name(aname)
        adr_index = len(b.chunks)
        adr_off = b.add(_record(4, bytes(adr_body)))
        if prev_adr_index is None:
            adr_head = adr_off
        else:
            b.patch(prev_adr_index, 12, adr_off)
        prev_adr_index = adr_index

        if isinstance(avalue, str):
            raw = avalue.encode("latin-1")
            a_dtype, a_elems = 51, max(1, len(raw))
            payload = raw
        else:
            val = np.asarray(avalue)
            a_dtype = _NP_TO_CDF[val.dtype.name]
            a_elems = int(val.size)
            payload = val.astype(val.dtype.newbyteorder("<"), copy=False).tobytes()
        aedr_body = bytearray()
        aedr_body += struct.pack(">q", 0)  # AEDRnext
        aedr_body += struct.pack(">ii", attr_num, a_dtype)
        aedr_body += struct.pack(">ii", 0, a_elems)  # Num (entry), NumElems
        aedr_body += struct.pack(">iiiii", 0, 0, 0, 0, 0)  # NumStrings + rfu
        aedr_body += payload
        aedr_off = b.add(_record(5, bytes(aedr_body)))
        b.patch(adr_index, 12 + 8, aedr_off)  # AgrEDRhead

    # patch GDR: zVDRhead, ADRhead, eof, NumAttr
    eof = b.pos
    b.patch(gdr_index, 12 + 8, zvdr_head)
    b.patch(gdr_index, 12 + 16, adr_head)
    b.patch(gdr_index, 12 + 24, eof)
    b.patch(gdr_index, 12 + 32 + 4, len(gattrs), fmt=">i")

    blob = b"".join(b.chunks)
    if compress == "file":
        body = blob[8:]
        cdata = gzip.compress(body, compresslevel=6)
        ccr_body = struct.pack(">qqi", 0, len(body), 0) + cdata  # CPRoffset, uSize, rfuA
        blob = struct.pack(">II", 0xCDF30001, 0xCCCC0001) + _record(10, ccr_body)
    with open(path, "wb") as f:
        f.write(blob)
    return path
