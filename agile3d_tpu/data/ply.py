"""PLY point-cloud I/O (replaces reference utils/ply.py:116-340).

Supports ascii / binary_little_endian / binary_big_endian vertex elements
with arbitrary scalar properties, plus triangle faces for meshes. Returns a
dict of property-name -> numpy array like the reference reader (the AGILE3D
scans carry x, y, z, R, G, B, label)."""

from __future__ import annotations

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}
_INV_DTYPES = {
    "int8": "char", "uint8": "uchar", "int16": "short", "uint16": "ushort",
    "int32": "int", "uint32": "uint", "float32": "float", "float64": "double",
}


def read_ply(path: str, with_faces: bool = False):
    """Read a PLY file. Returns a dict name->array for vertex properties;
    with_faces=True additionally returns an [F, 3] int face array."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype_str)])
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unexpected EOF in header")
            tokens = line.strip().split()
            if not tokens:
                continue
            key = tokens[0].decode()
            if key == "format":
                fmt = tokens[1].decode()
            elif key == "element":
                elements.append((tokens[1].decode(), int(tokens[2]), []))
            elif key == "property":
                if tokens[1] == b"list":
                    elements[-1][2].append(
                        (tokens[4].decode(), "list",
                         _PLY_DTYPES[tokens[2].decode()],
                         _PLY_DTYPES[tokens[3].decode()]))
                else:
                    elements[-1][2].append(
                        (tokens[-1].decode(), _PLY_DTYPES[tokens[1].decode()]))
            elif key == "end_header":
                break

        endian = {"binary_little_endian": "<", "binary_big_endian": ">"}.get(fmt)
        out: dict[str, np.ndarray] = {}
        faces = None
        for name, count, props in elements:
            if any(p[1] == "list" for p in props):
                # face element: uniform triangle lists assumed
                if endian:
                    cnt_dt = np.dtype(endian + props[0][2])
                    idx_dt = np.dtype(endian + props[0][3])
                    tri = []
                    for _ in range(count):
                        k = int(np.frombuffer(f.read(cnt_dt.itemsize), cnt_dt)[0])
                        tri.append(np.frombuffer(f.read(idx_dt.itemsize * k), idx_dt))
                    faces = np.vstack(tri) if tri else np.zeros((0, 3), int)
                else:
                    tri = []
                    for _ in range(count):
                        vals = f.readline().split()
                        tri.append([int(v) for v in vals[1: 1 + int(vals[0])]])
                    faces = np.asarray(tri)
                continue
            if endian:
                dt = np.dtype([(p[0], endian + p[1]) for p in props])
                data = np.frombuffer(f.read(dt.itemsize * count), dt)
            else:
                raw = np.loadtxt([f.readline() for _ in range(count)], ndmin=2)
                dt = np.dtype([(p[0], p[1]) for p in props])
                data = np.zeros(count, dt)
                for i, p in enumerate(props):
                    data[p[0]] = raw[:, i]
            for p in props:
                out[p[0]] = np.ascontiguousarray(data[p[0]])
    if with_faces:
        return out, faces
    return out


def write_ply(path: str, fields: dict[str, np.ndarray],
              faces: np.ndarray | None = None, binary: bool = True) -> None:
    """Write vertex properties (dict name->1D array, equal lengths) and
    optional [F, 3] faces."""
    names = list(fields)
    n = len(fields[names[0]])
    cols = {k: np.asarray(v) for k, v in fields.items()}
    for k, v in cols.items():
        if len(v) != n:
            raise ValueError(f"field {k} length {len(v)} != {n}")

    header = ["ply",
              "format binary_little_endian 1.0" if binary else "format ascii 1.0",
              f"element vertex {n}"]
    for k in names:
        header.append(f"property {_INV_DTYPES[cols[k].dtype.name]} {k}")
    if faces is not None:
        header.append(f"element face {len(faces)}")
        header.append("property list uchar int vertex_indices")
    header.append("end_header")

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if binary:
            dt = np.dtype([(k, "<" + cols[k].dtype.str[1:]) for k in names])
            rec = np.zeros(n, dt)
            for k in names:
                rec[k] = cols[k]
            f.write(rec.tobytes())
            if faces is not None:
                fdt = np.dtype([("n", "u1"), ("v", "<i4", (3,))])
                frec = np.zeros(len(faces), fdt)
                frec["n"] = 3
                frec["v"] = faces
                f.write(frec.tobytes())
        else:
            for i in range(n):
                f.write((" ".join(str(cols[k][i]) for k in names) + "\n").encode())
            if faces is not None:
                for tri in faces:
                    f.write((f"3 {tri[0]} {tri[1]} {tri[2]}\n").encode())
