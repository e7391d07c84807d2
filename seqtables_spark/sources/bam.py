"""Pure-Python BAM reader/writer (reference S4, from_pysam at
/root/reference/seqtables/core/seqtables.py:226-283 - there the
decode is delegated to pysam; here it is a self-contained codec so
the engine ingests BAM with no native dependency).

BAM = BGZF-compressed binary records. BGZF is a sequence of spec-
conforming gzip members (RFC1952 with a BC extra subfield carrying
the block size), so stdlib gzip/zlib decompresses it directly; the
record layout is fixed-width little-endian (SAM spec section 4.2).

Scale design. Decoding distributes at TWO grains:

* across files (default): binaryFile source -> mapInPandas, one
  stream decode per file, zero shuffle. Saturates executors whenever
  files >> cores.
* within a file (``records_per_chunk``): a cheap indexing stage walks
  each file once — BGZF member boundaries from the BC subfields plus
  a record-length chain over the inflated stream (struct reads only,
  no string materialization) — and emits (comp_off, uoff, n_records)
  virtual-offset chunk specs, exactly the coordinates a .bai stores.
  The expensive decode (nibble->base and qual string building, the
  actual CPU cost) then runs one task per chunk, each task seek()ing
  to its compressed offset and inflating only its own members. With a
  real .bai the indexing stage would be replaced by reading the
  index; without one this is the honest equivalent, and the heavy
  stage parallelizes either way.

The decoded frame feeds the same from_df/align pipeline as SAM text.
"""

from __future__ import annotations

import bisect
import gzip
import os
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

BAM_MAGIC = b"BAM\x01"
CIGAR_OPS = "MIDNSHP=X"
SEQ_NIBBLE = "=ACMGRSVTWYHKDBN"
BAM_SCHEMA = (
    "header string, flag int, rname string, pos long, mapq int, "
    "cigar string, seq string, qual string"
)
_CHUNK_SCHEMA = "path string, comp_off long, uoff long, n_records long"

# the fixed 28-byte BGZF EOF marker block (SAM spec 4.1.2)
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


# ------------------------------------------------------------ BGZF framing

def _validate_member_header(hdr: bytes, off: int = 0) -> None:
    """gzip magic + deflate method + FEXTRA flag, or ValueError."""
    if hdr[off : off + 2] != b"\x1f\x8b" or hdr[off + 2] != 8:
        raise ValueError(f"not a gzip member at offset {off}")
    if not hdr[off + 3] & 4:  # FEXTRA
        raise ValueError(f"gzip member at {off} lacks the BGZF BC subfield")


def _bc_bsize(extra: bytes, off: int, xlen: int) -> int:
    """Walk the FEXTRA subfields at extra[off:off+xlen] for BGZF's BC
    (total member size - 1). BGZF requires BC but not that it come
    first."""
    p, end = off, off + xlen
    while p + 4 <= end:
        si1, si2, slen = (
            extra[p], extra[p + 1], struct.unpack_from("<H", extra, p + 2)[0]
        )
        if si1 == 0x42 and si2 == 0x43 and slen == 2:  # 'B','C'
            return struct.unpack_from("<H", extra, p + 4)[0] + 1
        p += 4 + slen
    raise ValueError("BGZF member lacks the BC subfield")


def _member_size(buf: bytes, off: int) -> int:
    """Length of the gzip member starting at `off`, from its BC extra
    subfield."""
    _validate_member_header(buf, off)
    (xlen,) = struct.unpack_from("<H", buf, off + 10)
    try:
        return _bc_bsize(buf, off + 12, xlen)
    except ValueError:
        raise ValueError(f"gzip member at {off} lacks the BGZF BC subfield")


def scan_bgzf_blocks(data: bytes) -> list[tuple[int, int, int]]:
    """Walk the compressed bytes via BC subfields (no inflation):
    [(comp_off, comp_len, isize)] per member. isize = uncompressed
    length (RFC1952 trailer)."""
    out = []
    off = 0
    n = len(data)
    while off < n:
        size = _member_size(data, off)
        (isize,) = struct.unpack_from("<I", data, off + size - 4)
        out.append((off, size, isize))
        off += size
    return out


# ------------------------------------------------------------ BAM parsing

def _parse_header(raw: bytes) -> tuple[list[str], int]:
    """(reference names, offset of first alignment record)."""
    if raw[:4] != BAM_MAGIC:
        raise ValueError("not a BAM stream (bad magic)")
    off = 4
    (l_text,) = struct.unpack_from("<i", raw, off)
    off += 4 + l_text
    (n_ref,) = struct.unpack_from("<i", raw, off)
    off += 4
    refs: list[str] = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", raw, off)
        off += 4
        if off + l_name + 4 > len(raw):  # truncated mid-header: the
            raise struct.error("truncated BAM header")  # caller reads more
        refs.append(raw[off : off + l_name - 1].decode())  # NUL-terminated
        off += l_name + 4  # skip l_ref
    return refs, off


def _parse_record(raw: bytes, o: int, refs: list[str]) -> tuple[tuple, int]:
    """Decode one alignment record at offset o -> (row, next offset)."""
    (block_size,) = struct.unpack_from("<i", raw, o)
    o += 4
    end = o + block_size
    (
        ref_id, pos0, l_read_name, mapq, _bin, n_cigar, flag, l_seq,
        _next_ref, _next_pos, _tlen,
    ) = struct.unpack_from("<iiBBHHHiiii", raw, o)
    p = o + 32
    name = raw[p : p + l_read_name - 1].decode()
    p += l_read_name
    cigar_ops = struct.unpack_from(f"<{n_cigar}I", raw, p)
    p += 4 * n_cigar
    cigar = (
        "".join(f"{op >> 4}{CIGAR_OPS[op & 0xF]}" for op in cigar_ops)
        or "*"
    )
    n_seq_bytes = (l_seq + 1) // 2
    seq_bytes = raw[p : p + n_seq_bytes]
    p += n_seq_bytes
    seq = (
        "".join(
            SEQ_NIBBLE[(seq_bytes[i // 2] >> (4 if i % 2 == 0 else 0)) & 0xF]
            for i in range(l_seq)
        )
        or "*"
    )
    qual_bytes = raw[p : p + l_seq]
    qual = (
        ""
        if l_seq == 0 or (l_seq > 0 and qual_bytes[0] == 0xFF)
        else "".join(chr(q + 33) for q in qual_bytes)
    )
    rname = refs[ref_id] if 0 <= ref_id < len(refs) else "*"
    return (name, flag, rname, pos0 + 1, mapq, cigar, seq, qual), end


def decode_bam(data: bytes) -> tuple[list[str], Iterator[tuple]]:
    """Decode one BAM file's bytes -> (reference names, record iter).
    Records are (header, flag, rname, pos_1based, mapq, cigar, seq,
    qual) matching BAM_SCHEMA.

    Fails LOUDLY on truncation (round 12): a cut mid-member raises in
    gzip.decompress (CRC/length check), and a cut at a member
    boundary — invisible to inflation — is caught by the trailing
    BGZF EOF magic (the same 28-byte sentinel samtools checks) plus a
    per-record bound check, so a partial stream can never return a
    silently shorter result."""
    if not data.endswith(BGZF_EOF):
        raise ValueError(
            "truncated BAM: BGZF EOF marker absent (stream cut at a "
            "member boundary, or not a finished BAM)"
        )
    raw = gzip.decompress(data)  # multi-member aware
    refs, off = _parse_header(raw)

    def records() -> Iterator[tuple]:
        o = off
        n = len(raw)
        while o + 4 <= n:
            (block_size,) = struct.unpack_from("<i", raw, o)
            if block_size < 32 or o + 4 + block_size > n:
                raise ValueError(
                    "truncated BAM: record body incomplete at "
                    f"uncompressed offset {o}"
                )
            row, o = _parse_record(raw, o, refs)
            yield row
        if o != n:
            raise ValueError(
                "truncated BAM: trailing partial record length at "
                f"uncompressed offset {o}"
            )

    return refs, records()


# --------------------------------------------------- sub-file splitting

class _BgzfIndexStream:
    """Shared streaming machinery of the two chunk-index passes
    (round-7 review fix: this logic used to exist twice): member-by-
    member BGZF inflate with the (ustart, comp_off) member table,
    header-completion loop, virtual-offset lookup, and the rolling
    4 MB buffer trim that keeps a 50 GB BAM indexable in constant
    memory. The index passes differ only in what they read per record
    and when they close a chunk."""

    TRIM_AT = 4 << 20

    def __init__(self, data):
        if isinstance(data, (bytes, bytearray)):
            import io

            self.f = io.BytesIO(data)
        else:
            self.f = data
            self.f.seek(0)
        self.members: list[tuple[int, int]] = []  # (ustart, comp_off)
        self.buf = bytearray()
        self.base_u = 0    # uncompressed offset of buf[0]
        self.comp_off = 0  # compressed offset of next unread member
        self.total_u = 0   # uncompressed bytes inflated so far

    def more(self) -> bool:
        hdr = self.f.read(12)
        if len(hdr) < 12:
            return False
        _validate_member_header(hdr)
        (xlen,) = struct.unpack_from("<H", hdr, 10)
        extra = self.f.read(xlen)
        bsize = _bc_bsize(extra, 0, xlen)
        rest = self.f.read(bsize - 12 - xlen)
        inflated = zlib.decompress(hdr + extra + rest, 31)
        self.members.append((self.total_u, self.comp_off))
        self.comp_off += bsize
        self.total_u += len(inflated)
        self.buf.extend(inflated)
        return True

    def voffset(self, u: int) -> tuple[int, int]:
        j = bisect.bisect_right(self.members, (u, 1 << 62)) - 1
        return (self.members[j][1], u - self.members[j][0])

    def read_header(self) -> tuple[list[str], int]:
        """Inflate until the BAM header parses -> (refs, record_off)."""
        while True:
            if len(self.buf) >= 4:
                try:
                    return _parse_header(bytes(self.buf))
                except (IndexError, struct.error):
                    pass  # truncated mid-header: inflate more
            if not self.more():
                raise ValueError("truncated BAM: header never completed")

    def trim(self, keep_from: int) -> None:
        """Drop buffered bytes before `keep_from` (absolute offset)
        once the buffer passes TRIM_AT — nothing before the current
        chunk start is needed again."""
        if len(self.buf) > self.TRIM_AT and keep_from > self.base_u:
            del self.buf[: keep_from - self.base_u]
            self.base_u = keep_from


def index_bam_chunks(
    data, records_per_chunk: int
) -> list[tuple[int, int, int]]:
    """One light pass over a BAM file (bytes or a seekable binary
    file) -> virtual-offset chunk specs [(comp_off, uoff, n_records)]:
    every chunk starts at a BGZF member boundary (comp_off) plus an
    uncompressed skip (uoff) to its first record, i.e. the same
    (coffset, uoffset) pair a .bai virtual offset encodes.

    Streams member-by-member with a ROLLING inflate buffer
    (_BgzfIndexStream): peak memory is O(max member + spanned
    record), never the whole uncompressed stream — a 50 GB BAM
    indexes in constant memory. Records are touched only with 4-byte
    length reads — none of the per-base string work the decode stage
    pays."""
    st = _BgzfIndexStream(data)
    _, off = st.read_header()

    specs: list[tuple[int, int, int]] = []
    o = off  # absolute uncompressed offset
    count = 0
    chunk_start = o
    while True:
        while st.total_u < o + 4:
            if not st.more():
                break
        if st.total_u < o + 4:
            break
        if count == records_per_chunk:
            specs.append((*st.voffset(chunk_start), count))
            chunk_start, count = o, 0
        (block_size,) = struct.unpack_from("<i", st.buf, o - st.base_u)
        o += 4 + block_size
        count += 1
        st.trim(chunk_start)
    if count:
        specs.append((*st.voffset(chunk_start), count))
    return specs


# the CIGAR ops that consume reference positions: M, D, N, =, X
_REF_CONSUMING = frozenset((0, 2, 3, 7, 8))
_REGION_CHUNK_SCHEMA = (
    "path string, comp_off long, uoff long, n_records long, "
    "rname string, min_pos long, max_end long"
)


def index_bam_region_chunks(
    data, records_per_chunk: int
) -> list[tuple[int, int, int, str, int | None, int | None]]:
    """index_bam_chunks + per-chunk COORDINATE BOUNDS — the engine's
    .bai analog (reference from_pysam fetch_args,
    /root/reference/seqtables/core/seqtables.py:226-283): one light
    pass emits [(comp_off, uoff, n_records, rname, min_pos0,
    max_end0)], where min/max bound the reference span of every
    record in the chunk (pos .. pos + CIGAR-ref-consumed length,
    0-based half-open; M/D/N/=/X consume reference). A region fetch
    then decodes ONLY chunks whose bounds intersect the query window
    — the same pruning a .bai's binning index drives, stored as a
    relational manifest instead of the binary bin tree so Spark can
    partition-prune it like any other table.

    Chunks additionally SPLIT on contig change, so each spec covers
    one rname and bounds stay tight; unmapped records (ref_id -1)
    land in rname='*' chunks with NULL bounds (a region fetch never
    touches them, matching pysam fetch(contig,...) semantics).

    Same rolling-buffer memory contract as index_bam_chunks (shared
    _BgzfIndexStream); this pass additionally reads each record's
    fixed fields + CIGAR ops (struct reads — still none of the
    per-base string work)."""
    st = _BgzfIndexStream(data)
    refs, off = st.read_header()

    def _name(ref_id: int) -> str:
        return refs[ref_id] if 0 <= ref_id < len(refs) else "*"

    specs: list[tuple] = []
    o = off
    count = 0
    chunk_start = o
    cur_ref: int | None = None
    lo: int | None = None
    hi: int | None = None

    def _close() -> None:
        nonlocal count, lo, hi
        c, uo = st.voffset(chunk_start)
        specs.append((c, uo, count, _name(cur_ref), lo, hi))
        count, lo, hi = 0, None, None

    while True:
        while st.total_u < o + 4:
            if not st.more():
                break
        if st.total_u < o + 4:
            break
        (block_size,) = struct.unpack_from("<i", st.buf, o - st.base_u)
        # bounds need the fixed fields + cigar ops: inflate the record
        while st.total_u < o + 4 + block_size:
            if not st.more():
                raise ValueError("truncated BAM: record body incomplete")
        r = o - st.base_u + 4
        ref_id, pos0 = struct.unpack_from("<ii", st.buf, r)
        l_read_name = st.buf[r + 8]
        (n_cigar,) = struct.unpack_from("<H", st.buf, r + 12)
        if cur_ref is not None and (
            ref_id != cur_ref or count == records_per_chunk
        ):
            _close()
            chunk_start = o
        cur_ref = ref_id
        if ref_id >= 0:
            co = r + 32 + l_read_name
            ops = struct.unpack_from(f"<{n_cigar}I", st.buf, co)
            ref_len = sum(
                op >> 4 for op in ops if (op & 0xF) in _REF_CONSUMING
            )
            end0 = pos0 + max(ref_len, 1)  # zero-span reads occupy pos
            lo = pos0 if lo is None else min(lo, pos0)
            hi = end0 if hi is None else max(hi, end0)
        o += 4 + block_size
        count += 1
        st.trim(chunk_start)
    if count:
        _close()
    return specs



def decode_bam_range(
    f, comp_off: int, uoff: int, n_records: int, refs: list[str]
) -> list[tuple]:
    """Decode `n_records` records starting at virtual offset
    (comp_off, uoff) from the seekable binary file `f`, inflating only
    the members the records span (reads forward past the chunk's last
    member boundary only when its final record straddles it)."""
    f.seek(comp_off)
    buf = bytearray()
    rows: list[tuple] = []
    o = uoff

    def _more() -> bool:
        hdr = f.read(12)
        if len(hdr) < 12:
            return False
        _validate_member_header(hdr)  # shared magic/FEXTRA checks
        (xlen,) = struct.unpack_from("<H", hdr, 10)
        extra = f.read(xlen)
        bsize = _bc_bsize(extra, 0, xlen)
        rest = f.read(bsize - 12 - xlen)
        buf.extend(zlib.decompress(hdr + extra + rest, 31))
        return True

    while len(rows) < n_records:
        while len(buf) < o + 4:
            if not _more():
                return rows
        (block_size,) = struct.unpack_from("<i", buf, o)
        while len(buf) < o + 4 + block_size:
            if not _more():
                return rows
        # parse straight from the bytearray: a bytes(buf) copy here is
        # O(records x chunk_bytes) of memcpy (struct.unpack_from and
        # slicing both read bytearrays directly)
        row, o = _parse_record(buf, o, refs)
        rows.append(row)
    return rows


def _local_path(uri: str) -> str:
    if uri.startswith("file:"):
        from urllib.parse import unquote, urlparse

        return unquote(urlparse(uri).path)
    if "://" in uri:
        raise NotImplementedError(
            f"records_per_chunk BAM splitting needs a seekable LOCAL file, "
            f"got {uri!r}; on distributed storage use records_per_chunk=None "
            "(binaryFile decode, one stream per file) or localize the file "
            "first"
        )
    return uri


def read_bam(
    spark: SparkSession,
    path: str,
    min_mapping_quality: int | None = None,
    records_per_chunk: int | None = None,
) -> DataFrame:
    """Distributed BAM ingest. Returns the SAM-shaped frame
    (pos 1-based, qual phred+33 chars) that from_df/align consume.

    Default: binaryFile source, one stream decode per file (zero
    shuffle; right when files >> cores). With ``records_per_chunk``:
    a per-file indexing task emits BGZF virtual-offset chunk specs,
    then the decode fans out one task per chunk — one large BAM no
    longer serializes on a single core.

    When `path` is a directory (a sharded write_bam output), only
    `*.bam` entries are scanned — an indexed sharded directory also
    holds per-shard `.bai`/`.csi` files, which are not BGZF streams
    (round 11)."""
    import pandas as pd

    reader = spark.read.format("binaryFile")
    try:
        if os.path.isdir(_local_path(path)):
            reader = reader.option("pathGlobFilter", "*.bam")
    except NotImplementedError:
        pass  # non-local URI: caller controls the glob in `path`

    if records_per_chunk is None:
        files = reader.load(path)

        def _decode(batches):
            for pdf in batches:
                for content in pdf["content"]:
                    _, recs = decode_bam(bytes(content))
                    rows = [
                        r
                        for r in recs
                        if min_mapping_quality is None or r[4] >= min_mapping_quality
                    ]
                    yield pd.DataFrame(rows, columns=BAM_COLUMNS)

        return files.select("content").mapInPandas(_decode, BAM_SCHEMA)

    # sub-file path: index (per file) -> decode (per chunk)
    files = reader.load(path).select("path")

    def _index(batches):
        for pdf in batches:
            rows = []
            for uri in pdf["path"]:
                # stream the index pass: constant memory even for one
                # huge BAM (see index_bam_chunks)
                with open(_local_path(uri), "rb") as f:
                    for comp_off, uoff, n in index_bam_chunks(
                        f, records_per_chunk
                    ):
                        rows.append((uri, comp_off, uoff, n))
            yield pd.DataFrame(
                rows, columns=["path", "comp_off", "uoff", "n_records"]
            )

    chunks = files.mapInPandas(_index, _CHUNK_SCHEMA)
    # one task per chunk: the decode stage is the CPU cost, spread it
    chunks = chunks.repartition(spark.sparkContext.defaultParallelism)

    def _decode_chunks(batches):
        refs_cache: dict[str, list[str]] = {}
        for pdf in batches:
            for uri, comp_off, uoff, n in zip(
                pdf["path"], pdf["comp_off"], pdf["uoff"], pdf["n_records"]
            ):
                p = _local_path(uri)
                refs = refs_cache.get(p)
                with open(p, "rb") as f:
                    if refs is None:
                        # header lives in the leading members; inflate
                        # until it parses (one member in practice)
                        head = bytearray()
                        off = 0
                        while True:
                            probe = _read_at(f, off, 65536)  # >= max member
                            size = _member_size(probe, 0)
                            head.extend(zlib.decompress(probe[:size], 31))
                            off += size
                            try:
                                refs, _ = _parse_header(bytes(head))
                                break
                            except (IndexError, struct.error):
                                continue
                        refs_cache[p] = refs
                    rows = decode_bam_range(
                        f, int(comp_off), int(uoff), int(n), refs
                    )
                if min_mapping_quality is not None:
                    rows = [r for r in rows if r[4] >= min_mapping_quality]
                yield pd.DataFrame(rows, columns=BAM_COLUMNS)

    return chunks.mapInPandas(_decode_chunks, BAM_SCHEMA)


BAM_COLUMNS = [
    "header", "flag", "rname", "pos", "mapq", "cigar", "seq", "qual",
]


def bam_region_manifest(
    spark: SparkSession,
    path: str,
    records_per_chunk: int = 4096,
) -> DataFrame:
    """Build the region-chunk manifest for BAM file(s): one indexing
    task per file emits (path, comp_off, uoff, n_records, rname,
    min_pos, max_end) — the relational .bai analog. Build it ONCE at
    write/land time and persist as parquet (partitionBy('rname') for
    partition-pruned probes); every later region fetch is then a
    manifest filter + targeted chunk decode with no indexing pass."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path")

    def _index(batches):
        for pdf in batches:
            rows = []
            for uri in pdf["path"]:
                with open(_local_path(uri), "rb") as f:
                    for spec in index_bam_region_chunks(
                        f, records_per_chunk
                    ):
                        rows.append((uri, *spec))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "comp_off", "uoff", "n_records",
                    "rname", "min_pos", "max_end",
                ],
            )

    return files.mapInPandas(_index, _REGION_CHUNK_SCHEMA)


def read_bam_region(
    spark: SparkSession,
    path: str,
    contig: str,
    start: int,
    end: int,
    records_per_chunk: int = 4096,
    manifest: DataFrame | str | None = None,
    min_mapping_quality: int | None = None,
) -> DataFrame:
    """Indexed region fetch — pysam ``fetch(contig, start, end)``
    semantics (reference from_pysam fetch_args,
    /root/reference/seqtables/core/seqtables.py:226-283): mapped
    reads whose reference span [pos0, pos0 + ref_len) overlaps the
    0-based half-open window [start, end) on `contig`. Zero-span
    reads count as occupying their position (ref_len floored to 1).

    "Give me reads overlapping this window" must NOT scan the file:
    the chunk manifest (coordinate-bounded virtual offsets, the .bai
    analog) is filtered to intersecting chunks BEFORE any decode, so
    the decode stage seeks straight to the few BGZF members the
    window touches. On a coordinate-sorted BAM — the shape every
    indexed BAM has — chunk bounds are tight and disjoint, so the
    pruning ratio is window/file. The exact per-read overlap
    predicate then trims chunk-boundary stragglers.

    `manifest`: pass the persisted manifest (DataFrame or parquet
    path) from bam_region_manifest to skip the indexing pass
    entirely; default builds it inline (one light pass per file)."""
    import pandas as pd

    if manifest is None:
        chunks = bam_region_manifest(spark, path, records_per_chunk)
    elif isinstance(manifest, str):
        chunks = spark.read.parquet(manifest)
    else:
        chunks = manifest

    from pyspark.sql import functions as F

    hit = (
        (F.col("rname") == contig)
        & (F.col("min_pos") < int(end))
        & (F.col("max_end") > int(start))
    )
    pruned = chunks.filter(hit).select(
        "path", "comp_off", "uoff", "n_records"
    )
    pruned = pruned.repartition(spark.sparkContext.defaultParallelism)

    def _decode_chunks(batches):
        refs_cache: dict[str, list[str]] = {}
        for pdf in batches:
            for uri, comp_off, uoff, n in zip(
                pdf["path"], pdf["comp_off"], pdf["uoff"], pdf["n_records"]
            ):
                p = _local_path(uri)
                refs = refs_cache.get(p)
                with open(p, "rb") as f:
                    if refs is None:
                        head = bytearray()
                        off = 0
                        while True:
                            probe = _read_at(f, off, 65536)
                            size = _member_size(probe, 0)
                            head.extend(zlib.decompress(probe[:size], 31))
                            off += size
                            try:
                                refs, _ = _parse_header(bytes(head))
                                break
                            except (IndexError, struct.error):
                                continue
                        refs_cache[p] = refs
                    rows = decode_bam_range(
                        f, int(comp_off), int(uoff), int(n), refs
                    )
                if min_mapping_quality is not None:
                    rows = [r for r in rows if r[4] >= min_mapping_quality]
                yield pd.DataFrame(rows, columns=BAM_COLUMNS)

    decoded = pruned.mapInPandas(_decode_chunks, BAM_SCHEMA)
    # exact overlap trim, all built-ins: ref-consumed length from the
    # CIGAR string (M/D/N/=/X), 1-based pos -> 0-based half-open span
    ref_len = F.expr(
        r"aggregate(regexp_extract_all(cigar, '(\\d+)([MDN=X])', 1), "
        r"0L, (acc, x) -> acc + cast(x as long))"
    )
    pos0 = F.col("pos") - 1
    end0 = pos0 + F.greatest(ref_len, F.lit(1))
    return decoded.filter(
        (F.col("rname") == contig)
        & (pos0 < int(end))
        & (end0 > int(start))
    )


def _read_at(f, off: int, n: int) -> bytes:
    f.seek(off)
    return f.read(n)


def _bgzf_block(payload: bytes) -> bytes:
    """One spec-conforming BGZF block: gzip member with the BC extra
    subfield holding (total block length - 1)."""
    deflated = zlib.compress(payload, 6)[2:-4]  # raw deflate
    bsize = 12 + 6 + len(deflated) + 8  # header+extra+data+crc/isize
    return (
        struct.pack(
            "<BBBBIBBH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6
        )  # gzip hdr, FEXTRA, XLEN=6
        + b"BC" + struct.pack("<HH", 2, bsize - 1)
        + deflated
        + struct.pack("<II", zlib.crc32(payload), len(payload) & 0xFFFFFFFF)
    )


def _encode_bam_header(refs: list[tuple[str, int]]) -> bytes:
    """The uncompressed BAM header payload: magic, SAM-text (empty),
    reference dictionary."""
    hdr = bytearray(BAM_MAGIC)
    text = b""
    hdr += struct.pack("<i", len(text)) + text
    hdr += struct.pack("<i", len(refs))
    for name, length in refs:
        nm = name.encode() + b"\x00"
        hdr += struct.pack("<i", len(nm)) + nm + struct.pack("<i", length)
    return bytes(hdr)


def _encode_bam_record(
    name, flag, rname, pos, mapq, cigar, seq, qual,
    ref_index: dict[str, int],
) -> bytes:
    """One length-framed BAM alignment record (uncompressed payload
    bytes). pos is 1-based (the spec stores 0-based)."""
    nm = str(name).encode() + b"\x00"
    ops = []
    if cigar and cigar != "*":
        num = ""
        for ch in cigar:
            if ch.isdigit():
                num += ch
            else:
                ops.append((int(num) << 4) | CIGAR_OPS.index(ch))
                num = ""
    seq_s = "" if seq in ("*", None) else seq
    l_seq = len(seq_s)
    packed = bytearray()
    for i in range(0, l_seq, 2):
        hi = SEQ_NIBBLE.index(seq_s[i]) << 4
        lo = SEQ_NIBBLE.index(seq_s[i + 1]) if i + 1 < l_seq else 0
        packed.append(hi | lo)
    qual_b = (
        bytes([0xFF] * l_seq)
        if not qual
        else bytes(ord(c) - 33 for c in qual)
    )
    ref_id = ref_index.get(rname, -1)
    rec = (
        struct.pack(
            "<iiBBHHHiiii",
            ref_id, int(pos) - 1, len(nm), int(mapq), 0,
            len(ops), int(flag), l_seq, -1, -1, 0,
        )
        + nm
        + struct.pack(f"<{len(ops)}I", *ops)
        + bytes(packed)
        + qual_b
    )
    return struct.pack("<i", len(rec)) + rec


def _bgzf_compress(payload: bytes) -> bytes:
    """Chunk an uncompressed payload stream into <=64K BGZF blocks
    (the format's hard block limit). NO EOF marker - BGZF streams
    concatenate, so the caller appends BGZF_EOF exactly once."""
    out = bytearray()
    for i in range(0, len(payload), 60000):
        out += _bgzf_block(payload[i : i + 60000])
    return bytes(out)


def encode_bam(
    records: list[tuple],
    refs: list[tuple[str, int]],
    block_records: int = 1000,
) -> bytes:
    """Encode (header, flag, rname, pos_1based, mapq, cigar, seq,
    qual) records into BGZF BAM bytes (the seqs_to_fastq-style sink,
    binary flavor). In-memory, driver/test grade - the distributed
    sink is `write_bam` below, which shares these codec helpers."""
    ref_index = {name: i for i, (name, _) in enumerate(refs)}
    body = bytearray()
    for rec in records:
        body += _encode_bam_record(*rec, ref_index=ref_index)
    payload = _encode_bam_header(refs) + bytes(body)
    out = _bgzf_compress(payload)
    if not payload:
        out += _bgzf_block(b"")
    return out + BGZF_EOF


def write_bam(
    df,
    path: str,
    refs: list[tuple[str, int]],
    cols: tuple[str, ...] = (
        "header", "flag", "rname", "pos", "mapq", "cigar", "seq", "qual"
    ),
    index: str | None = None,
    single_file: bool = True,
):
    """Distributed BAM sink.

    Reference parity: the reference writes BAM through pysam's
    in-process writer (one thread, one file); this is the
    cluster-shaped equivalent. BGZF is concatenation-friendly (a BGZF
    stream is any sequence of <=64K gzip members, SAM spec 4.1;
    blocks may split the record stream at ANY byte), so the expensive
    work parallelizes perfectly: every partition compresses ITS OWN
    records into BGZF blocks and writes a part file (mapInPandas, no
    shuffle, no driver data movement - same shape as write_warc).

    single_file=True (default, the interop contract): the driver then
    assembles header-block + parts (streamed copyfileobj, constant
    memory, never holds record data) + the 28-byte EOF marker into
    ONE .bam at `path`. That assembly is O(total bytes) single-writer
    IO - the unavoidable cost of "one .bam file" on a filesystem; on
    an object store the same part layout maps to multipart-upload
    compose. REQUIRES a filesystem shared between executors and the
    driver (the driver opens the executor-written part paths) - true
    in local mode and on NFS/object-store mounts; on a shuffle-local
    cluster use single_file=False.

    single_file=False (the scale path): `path` becomes a DIRECTORY of
    `shard-NNNNN.bam` files, each an INDEPENDENT, complete, valid BAM
    (own header block, own EOF marker) written entirely by its
    partition's task - no driver byte movement AT ALL, the only
    driver work is the manifest metadata. read_bam(spark, path)
    reads the directory back (binaryFile source takes a directory),
    and any htslib tool can consume each shard standalone. A
    `_manifest.json` (shards, records, bytes) is written alongside
    (underscore-prefixed so Spark's hidden-file filter skips it on
    read, like _SUCCESS).

    Task-retry safety (both modes): each task writes
    `<name>.attempt-<taskAttemptId>` and atomically os.rename()s into
    place on success, so a speculative twin or a zombie attempt can
    never interleave bytes with a committed writer - the last
    complete attempt wins whole-file. Part assembly orders shards
    NUMERICALLY by partition id parsed from the name (robust past
    100000 partitions, where lexicographic part names would
    misorder).

    Row order follows partition index then partition-local order;
    callers wanting a coordinate-sorted BAM (for .bai/.csi indexing)
    sort the DataFrame first (repartitionByRange +
    sortWithinPartitions on (rname, pos)).

    `cols` names the (name, flag, rname, pos_1based, mapq, cigar, seq,
    qual) source columns, matching read_bam's output so
    write_bam(read_bam(...)) roundtrips. Returns the part manifest
    DataFrame (path, n_records, n_bytes) - one row per non-empty
    partition.

    index="bai"/"csi" (round 9) additionally writes `<path>.bai` /
    `<path>.csi` after assembly (one driver-side streaming pass of the
    finished file, constant memory - sources/bai.write_bai /
    csi.write_csi).

    index= with single_file=False (round 11): each shard is an
    independent valid BAM, so per-shard virtual offsets are well-
    defined — the shard's OWN task builds `shard-NNNNN.bam.bai` (or
    `.csi`) right after committing the shard, attempt-safe like the
    shard itself (tmp + os.replace), zero driver byte movement. The
    `_manifest.json` rows additionally carry each shard's coordinate
    extent (`first_ref`/`first_pos` 0-based inclusive,
    `last_ref`/`last_end` 0-based exclusive; refs as ref-list
    ordinals) so read_bam_region_sharded prunes whole shards from the
    manifest alone, before opening any index file.

    The caller owns coordinate order in every indexed mode: sort the
    DataFrame by (rname-id, pos) via repartitionByRange +
    sortWithinPartitions first, as an indexed BAM requires; the
    partition-order-preserving concat (pinned in
    tests/test_round9_ops.py) makes the single-file sorted write
    correct by construction, and range partitioning makes each shard
    a contiguous coordinate slice.
    """
    import pandas as pd  # noqa: F401 - mapInPandas contract
    from pyspark.sql import functions as F

    if index not in (None, "bai", "csi"):
        raise ValueError(f"index must be 'bai', 'csi' or None, got {index!r}")

    ref_index = {name: i for i, (name, _) in enumerate(refs)}
    sharded = not single_file
    parts_dir = path if sharded else path + ".parts"
    os.makedirs(parts_dir, exist_ok=True)
    if sharded:
        # overwrite semantics: stale shards from a previous (wider)
        # write would otherwise survive and corrupt a directory read
        for old in os.listdir(parts_dir):
            if old.startswith(("shard-", "_manifest")):
                os.remove(os.path.join(parts_dir, old))
    src = df.select(*[F.col(c) for c in cols])
    header_blob = _bgzf_compress(_encode_bam_header(refs)) if sharded else None

    shard_index = index if sharded else None

    def _write(batches):
        import re

        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        base = f"shard-{pid:05d}.bam" if sharded else f"part-{pid:05d}"
        fname = os.path.join(parts_dir, base)
        tmp = f"{fname}.attempt-{ctx.taskAttemptId()}"
        out = None
        buf = bytearray()
        n = 0
        nbytes = 0
        # shard coordinate extent (only when a per-shard index is
        # requested - the CIGAR ref-length walk costs a regex per
        # record, so the unindexed roundtrip path stays untouched)
        lo = hi = None
        ref_consuming = re.compile(r"(\d+)([MDN=X])").findall
        try:
            for b in batches:
                if out is None:
                    out = open(tmp, "wb")
                    if sharded:
                        out.write(header_blob)
                        nbytes += len(header_blob)
                for t in b.itertuples(index=False):
                    buf += _encode_bam_record(*t, ref_index=ref_index)
                    n += 1
                    if shard_index is not None:
                        # unmapped/unknown-ref records ('*' rname) get
                        # the -1 sentinel, same as _encode_bam_record;
                        # they carry no coordinate so they can't extend
                        # the shard extent (manifest pruning for a
                        # shard holding ONLY such records is disabled
                        # by the lo=None -> first_ref=-1 path below)
                        rid = ref_index.get(t[2], -1)
                        if rid >= 0:
                            pos0 = int(t[3]) - 1
                            rlen = sum(
                                int(d)
                                for d, _ in ref_consuming(t[5] or "")
                            )
                            beg = (rid, pos0)
                            end_ = (rid, pos0 + max(rlen, 1))
                            if lo is None or beg < lo:
                                lo = beg
                            if hi is None or end_ > hi:
                                hi = end_
                    while len(buf) >= 60000:
                        blk = _bgzf_block(bytes(buf[:60000]))
                        out.write(blk)
                        nbytes += len(blk)
                        del buf[:60000]
        finally:
            if out is not None:
                if buf:
                    blk = _bgzf_block(bytes(buf))
                    out.write(blk)
                    nbytes += len(blk)
                if sharded:
                    out.write(BGZF_EOF)
                    nbytes += len(BGZF_EOF)
                out.close()
        if out is not None:  # empty partitions write no file, no row
            # atomic commit: a failed/zombie attempt leaves only its
            # .attempt-* temp; the rename is whole-file or nothing
            os.replace(tmp, fname)
            if shard_index is not None:
                # the shard's own task indexes it: the shard is an
                # independent valid BAM, so its virtual offsets are
                # self-contained. Same attempt-tmp + whole-file
                # rename commit as the shard bytes.
                if shard_index == "bai":
                    from .bai import build_bai
                    with open(fname, "rb") as sf:
                        idx_bytes = build_bai(sf)
                else:
                    from .csi import build_csi
                    with open(fname, "rb") as sf:
                        idx_bytes = build_csi(sf)
                idx_name = f"{fname}.{shard_index}"
                idx_tmp = f"{idx_name}.attempt-{ctx.taskAttemptId()}"
                with open(idx_tmp, "wb") as xf:
                    xf.write(idx_bytes)
                os.replace(idx_tmp, idx_name)
            fr, fp = lo if lo is not None else (-1, -1)
            lr, le = hi if hi is not None else (-1, -1)
            yield pd.DataFrame(
                [{
                    "path": fname, "n_records": n, "n_bytes": nbytes,
                    "first_ref": fr, "first_pos": fp,
                    "last_ref": lr, "last_end": le,
                }]
            )

    manifest = src.mapInPandas(
        _write,
        "path string, n_records long, n_bytes long, first_ref long, "
        "first_pos long, last_ref long, last_end long",
    ).collect()

    def _pid_of(m):
        # numeric partition id from shard-NNNNN.bam / part-NNNNN
        import re

        return int(re.search(r"(?:shard|part)-(\d+)", os.path.basename(m["path"])).group(1))

    manifest = sorted(manifest, key=_pid_of)

    if sharded:
        import json

        entries = []
        for m in manifest:
            e = {"path": os.path.basename(m["path"]),
                 "n_records": int(m["n_records"]),
                 "n_bytes": int(m["n_bytes"])}
            if index is not None:
                e["index"] = os.path.basename(m["path"]) + "." + index
                e["first_ref"] = int(m["first_ref"])
                e["first_pos"] = int(m["first_pos"])
                e["last_ref"] = int(m["last_ref"])
                e["last_end"] = int(m["last_end"])
            entries.append(e)
        with open(os.path.join(path, "_manifest.json"), "w") as mf:
            json.dump(entries, mf, indent=1)
    else:
        import shutil

        with open(path, "wb") as out:
            out.write(_bgzf_compress(_encode_bam_header(refs)))
            for m in manifest:
                with open(m["path"], "rb") as part:
                    shutil.copyfileobj(part, out, 1 << 20)
            out.write(BGZF_EOF)
        shutil.rmtree(parts_dir)

    if index == "bai" and not sharded:
        from .bai import write_bai

        write_bai(path)
    elif index == "csi" and not sharded:
        from .csi import write_csi

        write_csi(path)

    spark = df.sparkSession
    schema = "path string, n_records long, n_bytes long"
    if not manifest:
        return spark.createDataFrame([], schema)
    rows = ", ".join(
        "('{}', CAST({} AS BIGINT), CAST({} AS BIGINT))".format(
            m["path"].replace("'", "''"), m["n_records"], m["n_bytes"]
        )
        for m in manifest
    )
    return spark.sql(
        f"SELECT * FROM VALUES {rows} AS t(path, n_records, n_bytes)"
    )


# --------------------------------------------- sharded region dispatch

def _sharded_region_plan(
    path: str,
    contig: str,
    start: int,
    end: int,
    index: str | None = None,
) -> tuple[list[tuple[str, int, int]], list[str], dict]:
    """Pure (no-Spark) planning half of read_bam_region_sharded:
    manifest -> (fetch triples, refs, stats). Two-level pruning:

    1. MANIFEST prune: a shard whose recorded coordinate extent
       [(first_ref, first_pos), (last_ref, last_end)) does not
       overlap (ref_id, [start, end)) is dropped WITHOUT opening its
       index file (lexicographic interval test - valid because an
       indexed shard is coordinate-sorted, the same precondition
       .bai itself has, SAM spec 5.2).
    2. INDEX prune: each surviving shard's own .bai/.csi yields its
       candidate virtual-offset ranges (bai_candidate_ranges /
       csi_candidate_ranges); a shard whose index has no candidates
       contributes nothing.

    The returned triples are the ONLY byte ranges the fetch stage
    will open - the task-level "untouched shards are never read" pin
    in tests/test_round11_ops.py asserts pruned shard paths never
    appear here (and stays true even when the pruned shards' index
    files are DELETED, proving step 1 never opens them).

    stats = {"shards_total", "shards_after_manifest",
    "shards_scanned"} for observability.
    """
    import json

    from .bai import bai_candidate_ranges, parse_bai, read_bam_refs
    from .csi import csi_candidate_ranges, parse_csi

    mpath = os.path.join(_local_path(path), "_manifest.json")
    with open(mpath) as mf:
        entries = json.load(mf)
    if not entries:
        return [], [], {"shards_total": 0, "shards_after_manifest": 0,
                        "shards_scanned": 0}
    base_dir = _local_path(path)
    refs = read_bam_refs(os.path.join(base_dir, entries[0]["path"]))
    try:
        ref_id = refs.index(contig)
    except ValueError:
        return [], refs, {"shards_total": len(entries),
                          "shards_after_manifest": 0, "shards_scanned": 0}

    start, end = int(start), int(end)
    survivors = []
    for e in entries:
        if "first_ref" in e and e["first_ref"] >= 0:
            beg = (e["first_ref"], e["first_pos"])
            fin = (e["last_ref"], e["last_end"])
            if not (beg < (ref_id, end) and fin > (ref_id, start)):
                continue
        survivors.append(e)

    triples: list[tuple[str, int, int]] = []
    scanned = 0
    for e in survivors:
        shard = os.path.join(base_dir, e["path"])
        idx_kind = index
        idx_path = None
        if "index" in e:
            man_kind = e["index"].rsplit(".", 1)[-1]
            if index is not None and man_kind != index:
                # the caller asked for a specific index kind but the
                # manifest points at the other: prefer a sibling file
                # of the requested kind; never parse CSI bytes with
                # the BAI parser (or vice versa)
                cand = shard + "." + index
                if os.path.exists(cand):
                    idx_path = cand
                else:
                    raise FileNotFoundError(
                        f"index={index!r} requested but shard "
                        f"{shard!r} only has a {man_kind!r} index "
                        f"({e['index']!r}); pass index={man_kind!r} "
                        "or index=None to use it"
                    )
            else:
                cand = os.path.join(base_dir, e["index"])
                if os.path.exists(cand):
                    idx_path = cand
                    idx_kind = man_kind
        if idx_path is None:
            for kind in ([index] if index else ["bai", "csi"]):
                cand = shard + "." + kind
                if os.path.exists(cand):
                    idx_path, idx_kind = cand, kind
                    break
        if idx_path is None:
            raise FileNotFoundError(
                f"no .bai/.csi index next to shard {shard!r}; write with "
                "write_bam(..., single_file=False, index='bai'|'csi')"
            )
        with open(idx_path, "rb") as fh:
            raw = fh.read()
        if idx_kind == "bai":
            per_ref, _ = parse_bai(raw)
            ranges = bai_candidate_ranges(per_ref, ref_id, start, end)
        else:
            per_ref, min_shift, depth, _ = parse_csi(raw)
            ranges = csi_candidate_ranges(
                per_ref, min_shift, depth, ref_id, start, end
            )
        if ranges:
            scanned += 1
            triples.extend((shard, cb, ce) for cb, ce in ranges)
    return triples, refs, {
        "shards_total": len(entries),
        "shards_after_manifest": len(survivors),
        "shards_scanned": scanned,
    }


def read_bam_region_sharded(
    spark: SparkSession,
    path: str,
    contig: str,
    start: int,
    end: int,
    index: str | None = None,
) -> DataFrame:
    """Region fetch over a SHARDED write_bam output directory (the
    scale path's answer to pysam fetch, reference from_pysam at
    /root/reference/seqtables/core/seqtables.py:226-283): manifest-
    level shard pruning, then per-shard .bai/.csi candidate ranges,
    unioned into ONE fetch relation (one task per candidate range,
    fetch_voffset_triples). Untouched shards are never opened; driver
    work is the manifest read plus the surviving shards' tiny index
    files. Same result contract as read_bam_region /
    read_bam_region_bai / read_bam_region_csi on the assembled
    equivalent (pinned in tests/test_round11_ops.py)."""
    from .bai import fetch_voffset_triples

    triples, refs, _ = _sharded_region_plan(
        path, contig, int(start), int(end), index
    )
    return fetch_voffset_triples(
        spark, triples, refs, contig, int(start), int(end)
    )
