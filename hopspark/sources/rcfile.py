"""Pure-Python RCFile scan/sink.

Reference parity: Impala's RCFile scanner (be/src/exec/hdfs-rcfile-scanner.cc
1-641) reads the Hive Record-Columnar File format: rows are grouped, and
inside each row group values are stored COLUMN-MAJOR — a key section holds
per-column byte lengths (run-length-encoded Hadoop vints) and the value
section holds each column's cell bytes back to back. The payoff is the same
one the scanner exploits: a projection that needs 2 of 20 columns skips the
other 18 columns' bytes without parsing them. Cells are text-serialized with
the Impala/Hive text-serde conventions (`\\N` for NULL), so the type layer is
the same cast-from-string semantics as the delimited-text scanner.

No Hive jars exist in this image, so the container codec (header, sync
markers, vint RLE key buffers) is implemented here from the public format
(Apache Hive RCFile / the ICDE'11 RCFile paper). Compression follows
Hadoop's DefaultCodec (zlib): the key buffer as a whole and each column's
value bytes individually, so pruned reads seek past unwanted columns'
compressed bytes without inflating them. Spark glue mirrors avro_codec.py: `binaryFile` + `mapInPandas` for the
scan (one task per file), `mapPartitionsWithIndex` for the sink (one file per
partition), so write-side partitioning carries over to read-side parallelism.
"""

from __future__ import annotations

import hashlib
import io
import os
import struct
import zlib
from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"RCF\x01"
_NULL = b"\\N"
# Cells whose literal content could be mistaken for the NULL marker
# (backslashes + 'N', whole cell) gain one extra leading backslash on write
# and lose it after the null check on read — only marker-shaped cells are
# touched, everything else round-trips byte-identical.
_MARKERISH = b"N"
_GROUP_ROWS = 1000
_COLUMN_COUNT_KEY = b"hive.io.rcfile.column.number"

# --------------------------------------------------- hadoop writable vints


def _write_vlong(buf: io.BytesIO, n: int) -> None:
    """Hadoop WritableUtils.writeVLong: one byte for -112..127, else a
    length/sign prefix byte followed by the magnitude big-endian."""
    if -112 <= n <= 127:
        buf.write(struct.pack("b", n))
        return
    neg = n < 0
    if neg:
        n = ~n
    size = (n.bit_length() + 7) // 8
    buf.write(struct.pack("b", (-120 if neg else -112) - size))
    buf.write(n.to_bytes(size, "big"))


def _read_vlong(buf) -> int:
    (first,) = struct.unpack("b", buf.read(1))
    if first >= -112:
        return first
    neg = first < -120
    size = -(first + (120 if neg else 112))
    n = int.from_bytes(buf.read(size), "big")
    return ~n if neg else n


# ------------------------------------------------------------- key buffer


def _rle_lengths(lengths: list[int]) -> bytes:
    """Per-row cell lengths with Hive's run-length scheme: a length is
    written once; a run of k repeats appends ~k (negative vlong)."""
    buf = io.BytesIO()
    i = 0
    while i < len(lengths):
        run = 1
        while i + run < len(lengths) and lengths[i + run] == lengths[i]:
            run += 1
        _write_vlong(buf, lengths[i])
        if run > 1:
            _write_vlong(buf, ~(run - 1))
        i += run
    return buf.getvalue()


def _write_vlong_to(out, n: int) -> None:
    b = io.BytesIO()
    _write_vlong(b, n)
    out.write(b.getvalue())


def _decode_rle_lengths(raw: bytes, nrows: int) -> list[int]:
    buf = io.BytesIO(raw)
    out: list[int] = []
    while len(out) < nrows:
        v = _read_vlong(buf)
        if v < 0:
            out.extend([out[-1]] * ~v)
        else:
            out.append(v)
    return out


# ------------------------------------------------------------------ write


_ZLIB_CODEC = b"org.apache.hadoop.io.compress.DefaultCodec"  # zlib


def write_container(path: str, columns_of_rows, ncols: int,
                    codec: str = "deflate") -> int:
    """Write one RCFile from an iterable of rows of text-serialized cells
    (each row a list of `bytes`, b"\\N" for NULL). Returns row count.
    `codec="deflate"` compresses with zlib (Hadoop's DefaultCodec): the key
    buffer as a whole, each column's value bytes individually — so a pruned
    read still skips unwanted columns without inflating them."""
    compressed = codec == "deflate"
    sync = hashlib.md5(path.encode()).digest()
    total = 0
    with open(path, "wb") as out:
        out.write(MAGIC)
        out.write(b"\x01" if compressed else b"\x00")
        if compressed:
            _write_vlong_to(out, len(_ZLIB_CODEC))
            out.write(_ZLIB_CODEC)
        meta = io.BytesIO()
        meta.write(struct.pack(">i", 1))
        for txt in (_COLUMN_COUNT_KEY, str(ncols).encode()):
            _write_vlong(meta, len(txt))
            meta.write(txt)
        out.write(meta.getvalue())
        out.write(sync)

        group: list[list[bytes]] = []

        def flush() -> None:
            if not group:
                return
            cols = list(zip(*group))
            key = io.BytesIO()
            _write_vlong(key, len(group))
            value = io.BytesIO()
            for col in cols:
                raw = b"".join(col)
                stored = zlib.compress(raw) if compressed else raw
                len_buf = _rle_lengths([len(c) for c in col])
                _write_vlong(key, len(stored))
                _write_vlong(key, len(raw))
                _write_vlong(key, len(len_buf))
                key.write(len_buf)
                value.write(stored)
            kb, vb = key.getvalue(), value.getvalue()
            ckb = zlib.compress(kb) if compressed else kb
            out.write(struct.pack(">i", -1))
            out.write(sync)
            out.write(struct.pack(">iii", len(ckb) + len(vb), len(kb), len(ckb)))
            out.write(ckb)
            out.write(vb)
            group.clear()

        for row in columns_of_rows:
            group.append(row)
            total += 1
            if len(group) >= _GROUP_ROWS:
                flush()
        flush()
    return total


# ------------------------------------------------------------------- read


def decode_container(blob: bytes, select: list[int] | None = None):
    """Yield rows of cell bytes (None where the cell is the NULL marker).
    `select` lists the column indexes to materialize; unselected columns'
    value bytes are skipped without parsing — the RCFile lazy-column read."""
    f = io.BytesIO(blob)
    if f.read(4) != MAGIC:
        raise ValueError("not an RCFile (RCF\\x01 magic missing)")
    compressed = f.read(1) == b"\x01"
    if compressed:
        codec_name = f.read(_read_vlong(f))
        if not codec_name.endswith(b"DefaultCodec"):
            raise NotImplementedError(f"RCFile codec {codec_name!r} unsupported")
    (nmeta,) = struct.unpack(">i", f.read(4))
    meta = {}
    for _ in range(nmeta):
        k = f.read(_read_vlong(f))
        meta[k] = f.read(_read_vlong(f))
    ncols = int(meta[_COLUMN_COUNT_KEY])
    sync = f.read(16)
    wanted = list(range(ncols)) if select is None else select

    while True:
        head = f.read(4)
        if len(head) < 4:
            return
        (rec_len,) = struct.unpack(">i", head)
        if rec_len == -1:
            if f.read(16) != sync:
                raise ValueError("sync marker mismatch — corrupt row group")
            head = f.read(4)
            if len(head) < 4:
                return
            (rec_len,) = struct.unpack(">i", head)
        key_len, ckey_len = struct.unpack(">ii", f.read(8))
        kb = f.read(ckey_len if compressed else key_len)
        key = io.BytesIO(zlib.decompress(kb) if compressed else kb)
        nrows = _read_vlong(key)
        col_lens: list[int] = []  # stored (possibly compressed) byte counts
        row_lens: list[list[int] | None] = []
        for c in range(ncols):
            col_bytes_len = _read_vlong(key)
            _read_vlong(key)  # uncompressed length
            len_buf = key.read(_read_vlong(key))
            col_lens.append(col_bytes_len)
            row_lens.append(
                _decode_rle_lengths(len_buf, nrows) if c in wanted else None
            )
        cols: dict[int, list] = {}
        for c in range(ncols):
            if c in wanted:
                data = f.read(col_lens[c])
                if compressed:
                    data = zlib.decompress(data)
                cells, off = [], 0
                for ln in row_lens[c]:  # type: ignore[union-attr]
                    cell = data[off:off + ln]
                    off += ln
                    if cell == _NULL:
                        cells.append(None)
                    else:
                        # unescape marker-shaped literals (see _MARKERISH)
                        if _is_markerish(cell):
                            cell = cell[1:]
                        cells.append(cell)
                cols[c] = cells
            else:
                f.seek(col_lens[c], 1)  # lazy skip: never parsed
        for i in range(nrows):
            yield tuple(cols[c][i] for c in wanted)


# ------------------------------------------------------------- spark glue


def _is_markerish(cell: bytes) -> bool:
    """True for cells of one-or-more backslashes followed by 'N' (the shape
    that collides with, or escapes, the in-band NULL marker)."""
    if len(cell) < 2 or cell[-1:] != _MARKERISH:
        return False
    body = cell[:-1]
    return body == b"\\" * len(body)


def _serialize_cell(v) -> bytes:
    if v is None:
        return _NULL
    if isinstance(v, bool):
        b = b"true" if v else b"false"
    elif isinstance(v, bytes):
        b = v
    elif isinstance(v, datetime):
        b = v.isoformat(sep=" ").encode()
    elif isinstance(v, (date, Decimal)):
        b = str(v).encode()
    elif isinstance(v, float):
        b = repr(v).encode()
    else:
        b = str(v).encode()
    # a literal '\N' (or '\\N', ...) cell must not read back as NULL
    return b"\\" + b if _is_markerish(b) else b


def write_rcfile(df: DataFrame, path: str, codec: str = "deflate") -> int:
    """RCFile sink: one container per Spark partition, text-serde cells,
    zlib-compressed by default (pass codec="none" for plain)."""
    os.makedirs(path, exist_ok=True)
    ncols = len(df.schema.fields)

    def write_part(idx, it):
        rows = ([_serialize_cell(r[i]) for i in range(ncols)] for r in it)
        fname = os.path.join(path, f"part-{idx:05d}.rc")
        n = write_container(fname, rows, ncols, codec=codec)
        if n == 0:
            os.remove(fname)
        yield n

    return df.rdd.mapPartitionsWithIndex(write_part).sum()


def read_rcfile(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    select: list[str] | None = None,
) -> DataFrame:
    """RCFile scan. `schema` names and types every column in the file (the
    file itself stores only a column COUNT — names live in the catalog,
    as with Hive/Impala tables). `select` projects a subset; unselected
    columns are skipped byte-wise inside each row group, so the projection
    reaches the storage layer like a parquet column prune."""
    names = [f.name for f in schema.fields]
    keep = names if select is None else list(select)
    idx = [names.index(n) for n in keep]
    out_fields = [schema[n] for n in keep]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                rows = [
                    tuple(None if c is None else c.decode("utf-8") for c in r)
                    for r in decode_container(bytes(blob), idx)
                ]
                yield pd.DataFrame(rows, columns=keep, dtype=object)

    raw_schema = T.StructType([T.StructField(n, T.StringType()) for n in keep])
    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.rc").load(path)
    raw = files.select("content").mapInPandas(decode, schema=raw_schema)
    # text-serde typing = cast-from-string, same as the delimited-text scan
    return raw.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in out_fields]
    )
