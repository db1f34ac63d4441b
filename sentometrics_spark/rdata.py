"""Minimal pure-Python reader for R's ``save()`` serialization (.rda / .RData).

Exists so the engine can be cross-validated against the reference package's
*own shipped golden data* (``/root/reference/inst/extdata/test_data.rda``,
``/root/reference/data/{usnews,list_lexicons,list_valence_shifters}.rda``)
without an R runtime in the container.  Implements only what those files
need: the version-2 XDR ("RDX2") format with gzip or xz compression, and the
SEXP types that appear in data.frames / data.tables / named lists of
character & numeric columns.  The wire format is public knowledge
(documented in *R Internals* §"Serialization Formats" and R's
``src/main/serialize.c``).

Returned Python shapes:
  - pairlist at top level            -> dict {name: value}
  - VECSXP with class data.frame/
    data.table                       -> pandas.DataFrame
  - VECSXP with names                -> dict {name: value}
  - VECSXP without names             -> list
  - STRSXP                           -> list[str | None]
  - REALSXP                          -> numpy.float64 array (NA -> nan)
  - INTSXP                           -> numpy.float64 array (NA -> nan), or
                                        list[str|None] if it is a factor
  - LGLSXP                           -> list[bool | None]
"""

from __future__ import annotations

import gzip
import lzma
import struct

import numpy as np
import pandas as pd

# SEXP type codes (R Internals, public)
NILSXP, SYMSXP, LISTSXP, CLOSXP, ENVSXP, PROMSXP, LANGSXP = 0, 1, 2, 3, 4, 5, 6
SPECIALSXP, BUILTINSXP, CHARSXP, LGLSXP = 7, 8, 9, 10
INTSXP, REALSXP, CPLXSXP, STRSXP, DOTSXP = 13, 14, 15, 16, 17
VECSXP, EXPRSXP, BCODESXP, EXTPTRSXP, WEAKREFSXP, RAWSXP, S4SXP = (
    19, 20, 21, 22, 23, 24, 25)
# serialization pseudo-types
REFSXP, NILVALUE_SXP, GLOBALENV_SXP, UNBOUNDVALUE_SXP = 255, 254, 253, 252
MISSINGARG_SXP, BASENAMESPACE_SXP, NAMESPACESXP, PACKAGESXP = 251, 250, 249, 248
PERSISTSXP, EMPTYENV_SXP, BASEENV_SXP, ALTREP_SXP = 247, 242, 241, 238

_NA_INT = -2147483648
# R's NA_real_ is a NaN with this exact payload (R Internals, arithmetic.c)
_NA_REAL_BITS = 0x7FF00000000007A2


class RNull:
    """Marker for R NULL (distinct from NA)."""

    def __repr__(self) -> str:  # pragma: no cover
        return "RNull"


R_NULL = RNull()


class RObject:
    """A decoded SEXP plus its attributes (names/class/levels/...)."""

    __slots__ = ("value", "attrs")

    def __init__(self, value, attrs=None):
        self.value = value
        self.attrs = attrs or {}


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.o = 0
        self.refs: list = []

    # --- primitives (XDR = big-endian) ---------------------------------
    def _int(self) -> int:
        v = struct.unpack_from(">i", self.d, self.o)[0]
        self.o += 4
        return v

    def _ints(self, n: int) -> np.ndarray:
        a = np.frombuffer(self.d, dtype=">i4", count=n, offset=self.o)
        self.o += 4 * n
        return a.astype(np.int64)

    def _doubles(self, n: int) -> np.ndarray:
        a = np.frombuffer(self.d, dtype=">f8", count=n, offset=self.o)
        self.o += 8 * n
        return a.astype(np.float64)

    def _double_bits(self, n: int) -> np.ndarray:
        a = np.frombuffer(self.d, dtype=">u8", count=n, offset=self.o)
        self.o += 8 * n
        return a.astype(np.uint64)

    def _bytes(self, n: int) -> bytes:
        b = self.d[self.o:self.o + n]
        self.o += n
        return b

    # --- items ----------------------------------------------------------
    def read_header(self) -> None:
        if self._bytes(5) != b"RDX2\n":
            raise ValueError("not an RDX2 (version-2) .rda payload")
        if self._bytes(2) != b"X\n":
            raise ValueError("only the XDR ('X') format is supported")
        self._int()  # serialization version (2)
        self._int()  # writer R version
        self._int()  # minimal reader R version

    def read_item(self):
        flags = self._int()
        typ = flags & 255
        has_attr = bool(flags & 0x200)
        has_tag = bool(flags & 0x400)

        if typ == NILVALUE_SXP or typ == NILSXP:
            return R_NULL
        if typ in (GLOBALENV_SXP, EMPTYENV_SXP, BASEENV_SXP,
                   UNBOUNDVALUE_SXP, MISSINGARG_SXP, BASENAMESPACE_SXP):
            return R_NULL
        if typ == REFSXP:
            idx = flags >> 8
            if idx == 0:
                idx = self._int()
            return self.refs[idx - 1]
        if typ == SYMSXP:
            name = self.read_item()  # CHARSXP
            self.refs.append(name)
            return name
        if typ in (PACKAGESXP, NAMESPACESXP, PERSISTSXP):
            # persistent string vector: int 0, then a STRSXP-like count + chars
            self._int()
            n = self._int()
            strs = [self.read_item() for _ in range(n)]
            obj = RObject(("namespace", strs))
            self.refs.append(obj)
            return obj
        if typ in (LISTSXP, LANGSXP, CLOSXP, PROMSXP, DOTSXP):
            attrs = self._read_attrs() if has_attr else {}
            tag = self.read_item() if has_tag else None
            car = self.read_item()
            cdr = self.read_item()
            return RObject(("pairlist", tag, car, cdr), attrs)
        if typ == CHARSXP:
            n = self._int()
            if n == -1:
                return None
            b = self._bytes(n)
            try:
                return b.decode("utf-8")
            except UnicodeDecodeError:
                return b.decode("latin-1")
        if typ == LGLSXP:
            n = self._int()
            vals = self._ints(n)
            out = [None if v == _NA_INT else bool(v) for v in vals]
            return self._with_attrs(out, has_attr)
        if typ == INTSXP:
            n = self._int()
            vals = self._ints(n)
            return self._with_attrs(vals, has_attr)
        if typ == REALSXP:
            n = self._int()
            bits = np.frombuffer(self.d, dtype=">u8", count=n, offset=self.o)
            out = np.frombuffer(self.d, dtype=">f8", count=n,
                                offset=self.o).astype(np.float64)
            self.o += 8 * n
            out[bits.astype(np.uint64) == _NA_REAL_BITS] = np.nan
            return self._with_attrs(out, has_attr)
        if typ == CPLXSXP:
            n = self._int()
            vals = self._doubles(2 * n)
            return self._with_attrs(vals[0::2] + 1j * vals[1::2], has_attr)
        if typ == STRSXP:
            n = self._int()
            out = [self.read_item() for _ in range(n)]
            return self._with_attrs(out, has_attr)
        if typ in (VECSXP, EXPRSXP):
            n = self._int()
            out = [self.read_item() for _ in range(n)]
            return self._with_attrs(out, has_attr)
        if typ == RAWSXP:
            n = self._int()
            return self._with_attrs(self._bytes(n), has_attr)
        if typ == EXTPTRSXP:
            obj = RObject(("extptr",))
            self.refs.append(obj)
            self.read_item()  # protected
            self.read_item()  # tag
            if has_attr:
                obj.attrs = self._read_attrs()
            return obj
        if typ == WEAKREFSXP:
            obj = RObject(("weakref",))
            self.refs.append(obj)
            return obj
        if typ == S4SXP:
            attrs = self._read_attrs() if has_attr else {}
            return RObject(("s4",), attrs)
        if typ == ENVSXP:
            obj = RObject(("environment",))
            self.refs.append(obj)
            self._int()  # locked
            self.read_item()  # enclosure
            self.read_item()  # frame
            self.read_item()  # hashtab
            self.read_item()  # attributes
            return obj
        if typ in (SPECIALSXP, BUILTINSXP):
            n = self._int()
            self._bytes(n)
            return R_NULL
        raise ValueError(f"unsupported SEXP type {typ} at offset {self.o}")

    def _with_attrs(self, value, has_attr: bool):
        if not has_attr:
            return value
        return RObject(value, self._read_attrs())

    def _read_attrs(self) -> dict:
        """Attributes are a tagged pairlist; flatten to {name: value}."""
        attrs = {}
        item = self.read_item()
        while isinstance(item, RObject) and item.value and \
                item.value[0] == "pairlist":
            _, tag, car, cdr = item.value
            if isinstance(tag, str):
                attrs[tag] = car
            item = cdr
        return attrs


def _plain(v):
    """Strip the RObject wrapper (drop attributes) for leaf access."""
    return v.value if isinstance(v, RObject) else v


def _simplify(obj):
    """Convert a decoded SEXP tree into plain Python / pandas objects."""
    if isinstance(obj, RObject):
        attrs = {k: _plain(_simplify(v)) if not isinstance(v, pd.DataFrame)
                 else v for k, v in obj.attrs.items()}
        val = obj.value
        if isinstance(val, tuple):
            if val[0] == "pairlist":
                return _pairlist_to_dict(obj)
            return None  # extptr / s4 / environment — irrelevant payloads
        inner = _simplify_value(val)
        classes = attrs.get("class") or []
        if isinstance(classes, str):
            classes = [classes]
        names = attrs.get("names")
        if isinstance(val, np.ndarray) and val.dtype == np.int64 and \
                "factor" in classes:
            levels = attrs.get("levels") or []
            return [None if i == _NA_INT else levels[int(i) - 1] for i in val]
        if isinstance(val, list) and ("data.frame" in classes):
            cols = names or [f"V{i+1}" for i in range(len(val))]
            data = {}
            for name, col in zip(cols, val):
                col = _simplify(col)
                if isinstance(col, np.ndarray) and col.dtype == np.int64:
                    col = np.where(col == _NA_INT, np.nan, col.astype(float)) \
                        if (col == _NA_INT).any() else col
                data[name] = col
            return pd.DataFrame(data)
        if isinstance(val, list) and names is not None and \
                not all(n is None for n in names):
            return {n: _simplify(v) for n, v in zip(names, val)}
        return inner
    return _simplify_value(obj)


def _simplify_value(val):
    if isinstance(val, list):
        return [_simplify(v) for v in val]
    if isinstance(val, np.ndarray) and val.dtype == np.int64:
        return val
    return val


def _pairlist_to_dict(obj) -> dict:
    out = {}
    item = obj
    while isinstance(item, RObject) and isinstance(item.value, tuple) and \
            item.value[0] == "pairlist":
        _, tag, car, cdr = item.value
        out[tag if isinstance(tag, str) else len(out)] = _simplify(car)
        item = cdr
    return out


def _decompress(raw: bytes) -> bytes:
    if raw[:2] == b"\x1f\x8b":
        return gzip.decompress(raw)
    if raw[:6] == b"\xfd7zXZ\x00":
        return lzma.decompress(raw)
    if raw[:3] == b"BZh":  # pragma: no cover
        import bz2
        return bz2.decompress(raw)
    return raw


def read_rda(path: str) -> dict:
    """Load an .rda file -> {object_name: python_value}."""
    with open(path, "rb") as fh:
        data = _decompress(fh.read())
    r = _Reader(data)
    r.read_header()
    top = r.read_item()
    if not (isinstance(top, RObject) and isinstance(top.value, tuple)
            and top.value[0] == "pairlist"):
        raise ValueError(".rda top level is not a pairlist of named objects")
    return _pairlist_to_dict(top)
