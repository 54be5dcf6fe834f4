#!/usr/bin/env python3
"""Independent MAT-file validator (round-15 verdict task 2).

Decodes MAT-5 and MAT v7.3 files using ONLY the Python standard library
(struct + zlib), implemented directly from the public specifications:

  * "MAT-File Format" (MathWorks, public PDF) for Level 5 files, and
  * "HDF5 File Format Specification Version 1.0/2.0" (The HDF Group)
    for the v7.3 HDF5 container.

Purpose: the repo's Scala reader (MatSource/H5Source) and writer
(MatSink) verify against EACH OTHER and hand-built fixtures — a
self-confirmation loop the round-14 verdict flagged. This script is a
second, structurally unrelated implementation in a different language:
MatSinkCrossCheckSpec shells out to it and diffs its JSON dump against
the values the Scala writer was asked to serialize, so a shared
misreading of either spec between the Scala reader and writer pair
fails loudly here. (True third-party goldens — h5py / MATLAB / octave /
h5dump — are not installable in this zero-egress container; this is the
strongest independent check available. If h5py ever becomes available,
prefer it.)

Usage: python3 tools/mat73_check.py FILE.mat
Emits one JSON object: {"version": "5"|"7.3", "vars": {name: var}}
where var = {"class": str, "dims": [int], "value": ...}:
  numeric -> flat column-major list of doubles (non-finite as strings)
  char    -> the row-major string
  cell    -> {"items": [var, ...]} preserving MATLAB column-major order
"""
import json
import struct
import sys
import zlib


def fail(msg):
    raise SystemExit(f"mat73_check: {msg}")


def num_json(x):
    # JSON has no NaN/Inf; the Scala side compares these as strings
    if x != x:
        return "NaN"
    if x == float("inf"):
        return "Inf"
    if x == float("-inf"):
        return "-Inf"
    return x


# --------------------------------------------------------------------------
# MAT Level 5
# --------------------------------------------------------------------------

MI_SIZES = {1: 1, 2: 1, 3: 2, 4: 2, 5: 4, 6: 4, 7: 4, 9: 8, 12: 8, 13: 8}
MI_FMT = {1: "b", 2: "B", 3: "h", 4: "H", 5: "i", 6: "I", 7: "f", 9: "d",
          12: "q", 13: "Q"}


def mat5_elements(buf, pos, end):
    """Yield (miType, payload) over a MAT-5 element stream."""
    while pos + 8 <= end:
        (tpe_word,) = struct.unpack_from("<I", buf, pos)
        if tpe_word >> 16:  # small element format
            tpe, n = tpe_word & 0xFFFF, tpe_word >> 16
            if n > 4:
                fail(f"small element claims {n} bytes at {pos}")
            yield tpe, buf[pos + 4:pos + 4 + n]
            pos += 8
        else:
            (n,) = struct.unpack_from("<I", buf, pos + 4)
            if pos + 8 + n > end:
                fail(f"element at {pos} claims {n} bytes past the end")
            yield tpe_word, buf[pos + 8:pos + 8 + n]
            pos += 8 + n
            if tpe_word != 15:  # miCOMPRESSED is the one unpadded kind
                pos += (8 - pos % 8) % 8


def mat5_numeric(tpe, payload):
    if tpe not in MI_FMT:
        fail(f"unsupported numeric mi type {tpe}")
    w = MI_SIZES[tpe]
    n = len(payload) // w
    vals = struct.unpack_from(f"<{n}{MI_FMT[tpe]}", payload, 0)
    return [float(v) for v in vals]


def mat5_char(tpe, payload, dims):
    if tpe == 16:  # miUTF8
        s = payload.decode("utf-8")
    elif tpe in (4, 17):  # miUINT16 / miUTF16
        s = payload.decode("utf-16-le")
    else:
        s = payload.decode("ascii")
    # column-major storage -> row-major string
    if len(dims) == 2 and dims[0] > 1 and dims[0] * dims[1] == len(s):
        m, n = dims
        s = "".join(s[j * m + i] for i in range(m) for j in range(n))
    return s


def mat5_matrix(payload):
    """Decode one miMATRIX payload -> (name, var-dict)."""
    it = mat5_elements(payload, 0, len(payload))
    tpe, flags = next(it)
    if tpe != 6 or len(flags) < 8:
        fail("matrix does not start with a miUINT32 array-flags element")
    clazz = flags[0]
    cplx = bool(flags[1] & 0x08)
    tpe, dimraw = next(it)
    dims = list(struct.unpack_from(f"<{len(dimraw) // 4}i", dimraw, 0))
    _, nameraw = next(it)
    name = nameraw.decode("ascii")
    if clazz == 1:  # mxCELL
        items = []
        for tpe, sub in it:
            if tpe != 14:
                fail(f"cell '{name}' holds a non-miMATRIX element")
            items.append(mat5_matrix(sub)[1])
        n = 1
        for d in dims:
            n *= d
        if len(items) != n:
            fail(f"cell '{name}' dims {dims} vs {len(items)} items")
        return name, {"class": "cell", "dims": dims, "items": items}
    if clazz == 4:  # mxCHAR
        tpe, data = next(it)
        s = mat5_char(tpe, data, dims)
        n = 1
        for d in dims:
            n *= d
        if len(s) != n:
            fail(f"char '{name}' dims {dims} vs {len(s)} code units")
        return name, {"class": "char", "dims": dims, "value": s}
    if 6 <= clazz <= 15:
        if cplx:
            fail(f"variable '{name}' is complex")
        tpe, data = next(it)
        vals = mat5_numeric(tpe, data)
        n = 1
        for d in dims:
            n *= d
        # EXACT count, both directions: a writer that overruns its data
        # element must fail the independent check, not silently truncate
        # (real MATLAB would see trailing garbage)
        if len(vals) != n:
            fail(f"matrix '{name}' dims {dims} vs {len(vals)} values")
        return name, {"class": "double", "dims": dims,
                      "value": [num_json(v) for v in vals]}
    fail(f"variable '{name}' has unsupported mxClass {clazz}")


def parse_mat5(buf):
    out = {}
    for tpe, payload in mat5_elements(buf, 128, len(buf)):
        if tpe == 15:
            payload = zlib.decompress(bytes(payload))
            inner = list(mat5_elements(payload, 0, len(payload)))
            if len(inner) != 1 or inner[0][0] != 14:
                fail("compressed element does not wrap one miMATRIX")
            tpe, payload = inner[0]
        if tpe == 14:
            name, var = mat5_matrix(payload)
            out[name] = var
    return out


# --------------------------------------------------------------------------
# HDF5 (the v7.3 container) — superblock v0, v1 object headers,
# symbol-table groups, contiguous layout: the subset MATLAB-style
# writers emit for class-list/score files.
# --------------------------------------------------------------------------

class H5:
    def __init__(self, buf):
        self.b = buf
        if buf[:8] != b"\x89HDF\r\n\x1a\n":
            fail("no HDF5 signature at the superblock offset")
        if buf[8] != 0:
            fail(f"superblock version {buf[8]} (only v0 implemented)")
        if buf[13] != 8 or buf[14] != 8:
            fail("offset/length sizes are not 8/8")
        # root symbol-table entry at +56: link name offset, header addr
        (self.root_header,) = struct.unpack_from("<Q", buf, 56 + 8)

    def u(self, fmt, off):
        return struct.unpack_from("<" + fmt, self.b, off)

    def object_header(self, addr):
        """v1 object header -> list of (msg type, body bytes)."""
        ver, _, nmsg = self.u("BBH", addr)
        if ver != 1:
            fail(f"object header at {addr} is version {ver}")
        (total,) = self.u("I", addr + 8)
        pos, end = addr + 16, addr + 16 + total
        msgs = []
        for _ in range(nmsg):
            if pos + 8 > end:
                fail(f"object header at {addr} truncates its messages")
            tpe, size, _flags = self.u("HHB", pos)
            msgs.append((tpe, self.b[pos + 8:pos + 8 + size]))
            pos += 8 + size
        return msgs

    def group_entries(self, header_addr):
        """Symbol-table group -> {name: child object header addr}."""
        msgs = self.object_header(header_addr)
        st = [m for t, m in msgs if t == 0x0011]
        if not st:
            fail(f"object at {header_addr} is not a symbol-table group")
        btree, heap = struct.unpack_from("<QQ", st[0], 0)
        # local heap: data segment address at +24
        if self.b[heap:heap + 4] != b"HEAP":
            fail(f"no HEAP signature at {heap}")
        (heap_data,) = self.u("Q", heap + 24)
        out = {}
        for snod in self.btree_leaves(btree):
            if self.b[snod:snod + 4] != b"SNOD":
                fail(f"no SNOD signature at {snod}")
            (count,) = self.u("H", snod + 6)
            for k in range(count):
                e = snod + 8 + 40 * k
                name_off, child = struct.unpack_from("<QQ", self.b, e)
                name_at = heap_data + name_off
                zero = self.b.index(b"\x00", name_at)
                out[self.b[name_at:zero].decode("ascii")] = child
        return out

    def btree_leaves(self, btree, depth=0):
        if depth > 32:
            fail("B-tree deeper than 32 levels")
        if self.b[btree:btree + 4] != b"TREE":
            fail(f"no TREE signature at {btree}")
        node_type, level, used = self.u("BBH", btree + 4)
        if node_type != 0:
            fail(f"B-tree node type {node_type} (group nodes only)")
        kids = []
        for k in range(used):
            (child,) = self.u("Q", btree + 24 + 8 + k * 16)
            if level == 0:
                kids.append(child)
            else:
                kids.extend(self.btree_leaves(child, depth + 1))
        return kids

    def dataset(self, addr):
        """Dataset object header -> (dims, dtype, raw bytes, attrs)."""
        dims, dtype, raw, attrs = None, None, None, {}
        for tpe, body in self.object_header(addr):
            if tpe == 0x0001:  # dataspace
                ver, rank = body[0], body[1]
                if ver != 1:
                    fail(f"dataspace version {ver}")
                dims = list(struct.unpack_from(f"<{rank}Q", body, 8))
            elif tpe == 0x0003:  # datatype
                dtype = self.dtype(body)
            elif tpe == 0x0008:  # layout
                if body[0] != 3 or body[1] != 1:
                    fail("layout is not v3 contiguous")
                daddr, dsize = struct.unpack_from("<QQ", body, 2)
                raw = self.b[daddr:daddr + dsize]
                if len(raw) != dsize:
                    fail(f"contiguous data at {daddr} runs past the file")
            elif tpe == 0x000C:  # attribute v1
                name, val = self.attribute(body)
                attrs[name] = val
        if dims is None or dtype is None or raw is None:
            fail(f"dataset at {addr} lacks dataspace/datatype/layout")
        return dims, dtype, raw, attrs

    def dtype(self, body):
        cls, ver = body[0] & 0x0F, body[0] >> 4
        (size,) = struct.unpack_from("<I", body, 4)
        if ver != 1:
            fail(f"datatype version {ver}")
        if cls == 0:
            if body[1] & 0x08:
                fail("signed fixed-point (writer emits unsigned only)")
            return ("uint", size)
        if cls == 1:
            if size != 8:
                fail(f"float size {size} (only f8)")
            return ("f8", 8)
        if cls == 3:
            return ("str", size)
        if cls == 7:
            return ("ref", 8)
        fail(f"datatype class {cls} unsupported")

    def attribute(self, body):
        ver, _, name_sz, dt_sz, _ds_sz = struct.unpack_from("<BBHHH", body, 0)
        if ver != 1:
            fail(f"attribute version {ver}")
        p8 = lambda n: (n + 7) // 8 * 8
        pos = 8
        name = body[pos:pos + name_sz].split(b"\x00")[0].decode("ascii")
        pos += p8(name_sz)
        dtype = self.dtype(body[pos:pos + dt_sz])
        pos += p8(dt_sz)
        # skip the declared dataspace size (a non-scalar attribute's
        # dataspace exceeds 8 bytes; hardcoding 8 would misread the value)
        pos += p8(_ds_sz)
        kind, size = dtype
        if kind == "str":
            return name, body[pos:pos + size].decode("ascii")
        if kind == "uint":
            return name, int.from_bytes(body[pos:pos + size], "little")
        fail(f"attribute '{name}' has unexpected type {kind}")


def h5_value(h5, addr, depth=0):
    """Decode one dataset at addr into the MATLAB-semantic var dict."""
    if depth > 32:
        fail("cell nesting deeper than 32")
    dims, (kind, size), raw, attrs = h5.dataset(addr)
    mclass = attrs.get("MATLAB_class")
    mdims = [int(d) for d in reversed(dims)]  # HDF5 row-major -> MATLAB
    if attrs.get("MATLAB_empty") == 1:
        # dataset holds the MATLAB size vector as uint64
        if (kind, size) != ("uint", 8):
            fail("MATLAB_empty dataset is not uint64")
        sz = [int(v) for v in struct.unpack_from(f"<{len(raw) // 8}Q", raw, 0)]
        if mclass == "char":
            return {"class": "char", "dims": sz, "value": ""}
        if mclass == "cell":
            return {"class": "cell", "dims": sz, "items": []}
        return {"class": "double", "dims": sz, "value": []}
    if mclass == "char":
        if (kind, size) != ("uint", 2):
            fail("char dataset is not uint16 code units")
        s = raw.decode("utf-16-le")
        if len(mdims) == 2 and mdims[0] > 1 and mdims[0] * mdims[1] == len(s):
            m, n = mdims
            s = "".join(s[j * m + i] for i in range(m) for j in range(n))
        return {"class": "char", "dims": mdims, "value": s}
    if mclass == "cell":
        if kind != "ref":
            fail("cell dataset does not hold object references")
        refs = struct.unpack_from(f"<{len(raw) // 8}Q", raw, 0)
        items = [h5_value(h5, r, depth + 1) for r in refs]
        return {"class": "cell", "dims": mdims, "items": items}
    if kind != "f8":
        fail(f"numeric dataset has type {kind}{size}, not f8")
    vals = struct.unpack_from(f"<{len(raw) // 8}d", raw, 0)
    return {"class": "double", "dims": mdims,
            "value": [num_json(v) for v in vals]}


def parse_mat73(buf):
    h5 = H5(memoryview(buf)[512:].tobytes())
    out = {}
    for name, addr in h5.group_entries(h5.root_header).items():
        if name == "#refs#":
            continue  # cell targets, reached through references
        out[name] = h5_value(h5, addr)
    return out


# --------------------------------------------------------------------------

def main():
    if len(sys.argv) != 2:
        fail("usage: mat73_check.py FILE.mat")
    with open(sys.argv[1], "rb") as f:
        buf = f.read()
    if len(buf) < 128:
        fail("file shorter than the 128-byte MAT header")
    if buf[126:128] != b"IM":
        fail(f"endian tag {buf[126:128]!r} (little-endian 'IM' only)")
    version = buf[124] | (buf[125] << 8)
    if version == 0x0100:
        print(json.dumps({"version": "5", "vars": parse_mat5(buf)},
                         sort_keys=True))
    elif version == 0x0200:
        print(json.dumps({"version": "7.3", "vars": parse_mat73(buf)},
                         sort_keys=True))
    else:
        fail(f"MAT header version 0x{version:04x}")


if __name__ == "__main__":
    main()
