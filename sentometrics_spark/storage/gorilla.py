"""Gorilla-style compression of finalized measure series (north rule):
delta-of-delta timestamps + XOR-encoded doubles, per the Facebook Gorilla
paper (Pelkonen et al., VLDB 2015). Storage-side feature — no reference
equivalent.

Encoding per series block:
  header: int64 first timestamp (epoch seconds), float64 first value
  timestamps: delta-of-delta D
      D == 0                  -> '0'
      -63  <= D <= 64         -> '10'  + 7  bits
      -255 <= D <= 256        -> '110' + 9  bits
      -2047 <= D <= 2048      -> '1110'+ 12 bits
      else                    -> '1111'+ 64 bits
  values: XOR with previous
      xor == 0                -> '0'
      prev window reusable    -> '10' + meaningful bits in prev window
      else                    -> '11' + 5 bits leading-zero count
                                      + 6 bits meaningful length (64 -> 0)
                                      + meaningful bits

`compress_series_df` packs each (lexicon, feature[, timeweight]) series into
one binary blob row via applyInPandas — the Spark-side shape of the job is
one shuffle on the series key, then a pure-Python pack per group.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        value &= (1 << bits) - 1
        self.cur = (self.cur << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.cur >> self.nbits) & 0xFF)
        self.cur &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append((self.cur << (8 - self.nbits)) & 0xFF)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            out = (out << 1) | bit
            self.pos += 1
        return out


_TS_BUCKETS = ((64, "10", 7), (256, "110", 9), (2048, "1110", 12))


def encode(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    """timestamps: int64 epoch seconds (sorted); values: float64."""
    ts = np.asarray(timestamps, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    if n == 0:
        return struct.pack(">i", 0)
    w = _BitWriter()
    header = struct.pack(">iqd", n, int(ts[0]), float(vals[0]))
    prev_ts = int(ts[0])
    prev_delta = 0
    bits = np.frombuffer(vals.tobytes(), dtype=np.uint64)
    prev_bits = int(bits[0])
    prev_lz, prev_mlen = -1, -1
    for i in range(1, n):
        # --- timestamp ---
        delta = int(ts[i]) - prev_ts
        dod = delta - prev_delta
        prev_ts, prev_delta = int(ts[i]), delta
        if dod == 0:
            w.write(0, 1)
        else:
            for bound, prefix, nbits in _TS_BUCKETS:
                if -bound + 1 <= dod <= bound:
                    w.write(int(prefix, 2), len(prefix))
                    w.write(dod + bound - 1, nbits)
                    break
            else:
                w.write(0b1111, 4)
                w.write(dod & ((1 << 64) - 1), 64)
        # --- value ---
        cur = int(bits[i])
        xor = cur ^ prev_bits
        prev_bits = cur
        if xor == 0:
            w.write(0, 1)
            continue
        lz = min(64 - xor.bit_length(), 31)
        tz = (xor & -xor).bit_length() - 1
        mlen = 64 - lz - tz
        if prev_lz >= 0 and lz >= prev_lz and (64 - prev_lz - prev_mlen) <= tz:
            # reuse previous window
            w.write(0b10, 2)
            shift = 64 - prev_lz - prev_mlen
            w.write(xor >> shift, prev_mlen)
        else:
            w.write(0b11, 2)
            w.write(lz, 5)
            w.write(0 if mlen == 64 else mlen, 6)
            w.write(xor >> tz, mlen)
            prev_lz, prev_mlen = lz, mlen
    return header + w.bytes()


def decode(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    (n,) = struct.unpack(">i", blob[:4])
    if n == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
    first_ts, first_val = struct.unpack(">qd", blob[4:20])
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.float64)
    ts[0] = first_ts
    vals[0] = first_val
    r = _BitReader(blob[20:])
    prev_ts, prev_delta = first_ts, 0
    prev_bits = struct.unpack(">Q", struct.pack(">d", first_val))[0]
    prev_lz, prev_mlen = -1, -1
    for i in range(1, n):
        # --- timestamp ---
        if r.read(1) == 0:
            dod = 0
        else:
            matched = False
            for bound, prefix, nbits in _TS_BUCKETS:
                if r.read(1) == 0:
                    dod = r.read(nbits) - bound + 1
                    matched = True
                    break
            if not matched:
                raw = r.read(64)
                dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        prev_delta += dod
        prev_ts += prev_delta
        ts[i] = prev_ts
        # --- value ---
        if r.read(1) == 0:
            xor = 0
        elif r.read(1) == 0:
            shift = 64 - prev_lz - prev_mlen
            xor = r.read(prev_mlen) << shift
        else:
            lz = r.read(5)
            mlen = r.read(6) or 64
            tz = 64 - lz - mlen
            xor = r.read(mlen) << tz
            prev_lz, prev_mlen = lz, mlen
        prev_bits ^= xor
        vals[i] = struct.unpack(">d", struct.pack(">Q", prev_bits))[0]
    return ts, vals


SERIES_SCHEMA = "lexicon string, feature string, timeweight string, n_points long, blob binary"


def compress_series_df(measures, series_keys: list[str] | None = None):
    """groupBy(series).applyInPandas pack: one Gorilla blob per measure
    series. Input: (bucket_ts, lexicon, feature[, timeweight], value)."""
    keys = series_keys or ["lexicon", "feature", "timeweight"]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        ts = (pdf["bucket_ts"].astype("datetime64[s]").astype("int64")).to_numpy()
        blob = encode(ts, pdf["value"].to_numpy())
        row = {k: [pdf[k].iloc[0]] for k in keys}
        if "timeweight" not in keys:
            row["timeweight"] = [""]
        row["n_points"] = [len(pdf)]
        row["blob"] = [blob]
        return pd.DataFrame(row)

    return measures.groupBy(*keys).applyInPandas(pack, schema=SERIES_SCHEMA)


def decompress_blob_rows(rows) -> pd.DataFrame:
    """Driver-side expansion of compressed series rows back to points."""
    parts = []
    for r in rows:
        ts, vals = decode(bytes(r["blob"]))
        parts.append(
            pd.DataFrame(
                {
                    "bucket_ts": pd.to_datetime(ts, unit="s"),
                    "lexicon": r["lexicon"],
                    "feature": r["feature"],
                    "timeweight": r["timeweight"],
                    "value": vals,
                }
            )
        )
    return pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()
