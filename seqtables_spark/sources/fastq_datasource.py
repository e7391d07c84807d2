"""FASTQ as a first-class Spark data source (Spark 4 Python
DataSource API): ``spark.read.format("fastq").load(path)`` ->
DF(read_id, seq, qual).

Unlike the line-pivot reader (fastq.read_fastq) this source SPLITS
one plain-text FASTQ into byte-range partitions and record-aligns
each split on the executor - the Hadoop-splitter pattern: a split
[start, end) owns every record whose first byte lies in it, so no
record is read twice and none is skipped, and one 100 GB FASTQ scans
with full cluster parallelism instead of one task. Alignment cannot
trust '@' alone (quality lines may start with '@'); a boundary is
accepted only when the 4-line window shape holds: line0 starts '@',
line2 starts '+', len(line1) == len(line3) (the seqan/Hadoop-BAM
heuristic). .gz files are not splittable and become one partition
each.

Reference parity: seqtables/io/read_sequences.py:11-59 (same rows as
read_fastq; pinned by test).
"""

from __future__ import annotations

import glob as _glob
import gzip
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FASTQ_SCHEMA = "read_id string, seq string, qual string"
DEFAULT_SPLIT = 32 << 20  # 32 MB


class FastqPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int, is_gz: bool):
        self.path, self.start, self.end, self.is_gz = path, start, end, is_gz


class FastqDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fastq"

    def schema(self) -> str:
        return FASTQ_SCHEMA

    def reader(self, schema) -> "FastqReader":
        return FastqReader(self.options)


class FastqReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("fastq source needs a path")
        self.split_bytes = int(options.get("partition_bytes", DEFAULT_SPLIT))
        if os.path.isdir(path):
            files = sorted(
                _glob.glob(os.path.join(path, "*.fastq"))
                + _glob.glob(os.path.join(path, "*.fq"))
                + _glob.glob(os.path.join(path, "*.fastq.gz"))
                + _glob.glob(os.path.join(path, "*.fq.gz"))
            )
        else:
            files = sorted(_glob.glob(path)) or [path]
        self.files = files

    def partitions(self):
        parts = []
        for p in self.files:
            if p.endswith(".gz"):
                parts.append(FastqPartition(p, 0, 1 << 62, True))
                continue
            size = os.path.getsize(p)
            step = max(self.split_bytes, 1)
            off = 0
            while off < size or (size == 0 and off == 0):
                parts.append(FastqPartition(p, off, min(off + step, size), False))
                off += step
                if size == 0:
                    break
        return parts

    def read(self, part: FastqPartition):
        if part.is_gz:
            with gzip.open(part.path, "rb") as f:
                yield from _records_from(f, 0, 1 << 62)
        else:
            with open(part.path, "rb") as f:
                yield from _records_from(f, part.start, part.end)


def _records_from(f, start: int, end: int):
    """Yield (read_id, seq, qual) for every record whose first byte
    offset is in [start, end)."""
    # TextInputFormat idiom: read from start-1 so a line (and so a
    # record) beginning EXACTLY at `start` is kept - the readline
    # consumes only the previous line's remainder (just "\n" when
    # start is already a line boundary); an unconditional
    # seek(start)+readline would silently drop that record
    if start > 0:
        f.seek(start - 1)
        f.readline()
    else:
        f.seek(0)
    # buffer 4 lines with their offsets, slide until the window is
    # record-shaped
    window: list[tuple[int, bytes]] = []
    while len(window) < 4:
        off = f.tell()
        line = f.readline()
        if not line:
            return
        window.append((off, line))
    while True:
        (o0, l0), (_, l1), (_, l2), (_, l3) = window
        if o0 >= end:
            return
        if (
            l0.startswith(b"@")
            and l2.startswith(b"+")
            and len(l1.rstrip(b"\r\n")) == len(l3.rstrip(b"\r\n"))
        ):
            yield (
                l0.rstrip(b"\r\n").decode()[1:],
                l1.rstrip(b"\r\n").decode(),
                l3.rstrip(b"\r\n").decode(),
            )
            window = []
            while len(window) < 4:
                off = f.tell()
                line = f.readline()
                if not line:
                    return
                window.append((off, line))
        else:
            # not aligned yet: slide one line forward
            off = f.tell()
            line = f.readline()
            if not line:
                return
            window = window[1:] + [(off, line)]


def register_fastq_source(spark) -> None:
    """Make ``spark.read.format('fastq')`` available on this session."""
    spark.dataSource.register(FastqDataSource)
