"""S10: bowtie2 external-aligner wrappers.

Parity target: the reference's shell-orchestration module
(/root/reference/external_algn_tools/bowtie_tools.py:24-52
build_reference, :55-165 bowtie2, :168-199 remove_phix_sequences).
Behavior re-expressed, not translated:

  - `build_reference` stages a fasta and runs `bowtie2-build`;
  - `bowtie2_align` writes the reference fasta (list of (name, seq)
    tuples or an existing fasta path), builds the index, assembles
    the bowtie2 command line (threads, paired -1/-2 vs unpaired -U,
    passthrough options as (flag, value) tuples or bare flags), runs
    it, and - the Spark-first difference - hands the resulting SAM
    straight to `read_sam`, so alignments land as a DISTRIBUTED
    DataFrame instead of a file path the caller must re-ingest;
  - `remove_contaminant_reads` is the reference's phix-filter
    workflow re-expressed relationally: instead of bowtie's
    `--un-conc` file shuffling + renames, align against the
    contaminant reference and LEFT-ANTI-JOIN the mapped read ids out
    of the read table - no file juggling, and the filter composes
    with any downstream plan.

Deliberate scope differences, documented: the reference BUNDLES
bowtie binaries and a phix fasta; this engine discovers `bowtie2` /
`bowtie2-build` on PATH (or an explicit `bowtie_path`) and takes the
contaminant reference as input - shipping third-party executables
inside an analytics library is not this engine's job. When the
binary is absent the wrappers raise FileNotFoundError at call time
with guidance; the test suite exercises the full orchestration with
a stub aligner on PATH, so everything except the aligner binary
itself is covered in CI.

Scale note: in `bowtie2_align`, index build + alignment run ONCE on
the driver host (bowtie2 is a single-node tool); the expensive part -
consuming the alignments - is distributed from the first touch via
read_sam. For cluster-scale alignment fan-out use
`bowtie2_align_distributed`: one task per fastq split, each running
the aligner in-task and emitting parsed alignment rows directly (the
same per-file parallelism pattern the BAM source uses).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sam import SAM_STD_COLS, read_sam

__all__ = [
    "build_reference",
    "bowtie2_align",
    "bowtie2_align_distributed",
    "remove_contaminant_reads",
    "write_fasta",
]


_STUB_BUILD = """\
#!/usr/bin/env python3
import sys, shutil
args = [a for a in sys.argv[1:] if a != "--quiet"]
fasta, prefix = args
shutil.copy(fasta, prefix + ".fasta.copy")
open(prefix + ".1.bt2", "w").write("stub-index\\n")
"""

_STUB_ALIGN = """\
#!/usr/bin/env python3
import sys
argv = sys.argv[1:]
open("/".join([__file__.rsplit("/", 1)[0], "last_argv.txt"]), "w").write(
    "\\t".join(argv)
)
def take(flag):
    vals = []
    i = 0
    while i < len(argv):
        if argv[i] == flag:
            vals.append(argv[i + 1]); i += 2
        else:
            i += 1
    return vals
prefix = take("-x")[0]
out = take("-S")[0]
inputs = take("-U") or (take("-1") + take("-2"))
refs = []
name = None; buf = []
for line in open(prefix + ".fasta.copy"):
    line = line.strip()
    if line.startswith(">"):
        if name is not None:
            refs.append((name, "".join(buf)))
        name = line[1:]; buf = []
    else:
        buf.append(line)
if name is not None:
    refs.append((name, "".join(buf)))
with open(out, "w") as o:
    o.write("@HD\\tVN:1.6\\n")
    for path in inputs:
        lines = [l.rstrip("\\n") for l in open(path)]
        for i in range(0, len(lines), 4):
            rid, seq, qual = lines[i][1:], lines[i + 1], lines[i + 3]
            hit = None
            for rname, rseq in refs:
                p = rseq.find(seq)
                if p >= 0:
                    hit = (rname, p + 1)
                    break
            if hit:
                o.write(f"{rid}\\t0\\t{hit[0]}\\t{hit[1]}\\t42\\t"
                        f"{len(seq)}M\\t*\\t0\\t0\\t{seq}\\t{qual}\\tXM:i:0\\n")
            else:
                o.write(f"{rid}\\t4\\t*\\t0\\t0\\t*\\t*\\t0\\t0\\t"
                        f"{seq}\\t{qual}\\tXM:i:1\\n")
"""


def install_stub_aligner(directory: str) -> str:
    """Write a deterministic STAND-IN `bowtie2`/`bowtie2-build` pair
    into `directory` and return it (pass as `bowtie_path`).

    Same honest-stub policy as pipeline/multimodal's fake codecs: the
    third-party binary is absent from this environment, so the stub
    replaces ONLY the alignment algorithm - with exact first-
    occurrence substring search (`ref.find(seq)`, flag 0/4, pos =
    1-based hit, full-M cigar, XM:i:0/1) - while every piece of real
    machinery around it (fasta staging, index build invocation,
    command-line assembly, SAM emission and distributed ingestion)
    runs for real and is oracle-checkable. Swap in the real binaries
    via PATH/bowtie_path and nothing else changes."""
    import stat

    os.makedirs(directory, exist_ok=True)
    for name, body in (("bowtie2-build", _STUB_BUILD), ("bowtie2", _STUB_ALIGN)):
        p = os.path.join(directory, name)
        with open(p, "w") as fh:
            fh.write(body)
        os.chmod(p, os.stat(p).st_mode | stat.S_IEXEC)
    return directory


def _find_binary(name: str, bowtie_path: str | None = None) -> str:
    """Resolve a bowtie executable: explicit directory first, then
    PATH. Raises FileNotFoundError with install guidance (the binary
    is third-party and never bundled)."""
    if bowtie_path is not None:
        cand = os.path.join(bowtie_path, name)
        if os.path.isfile(cand) and os.access(cand, os.X_OK):
            return cand
        raise FileNotFoundError(
            f"{name} not found/executable under bowtie_path={bowtie_path!r}"
        )
    found = shutil.which(name)
    if found is None:
        raise FileNotFoundError(
            f"{name} not on PATH - install bowtie2 (e.g. from "
            "https://bowtie-bio.sourceforge.net/bowtie2/) or pass "
            "bowtie_path=<dir containing the executables>"
        )
    return found


def write_fasta(references: Sequence[tuple[str, str]], path: str) -> str:
    """Stage (name, sequence) pairs as a fasta file (the reference
    writes its barcode list the same way before indexing)."""
    with open(path, "w") as out:
        for name, seq in references:
            out.write(f">{name}\n{seq}\n")
    return path


def _run(cmd: list[str], what: str) -> None:
    proc = subprocess.run(
        [str(c) for c in cmd],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"{what} failed (exit {proc.returncode}): "
            f"{proc.stderr.decode(errors='replace')[:2000]}"
        )


def build_reference(
    input_fasta: str,
    ref_name: str,
    ref_path: str | None = None,
    bowtie_path: str | None = None,
) -> str:
    """Run `bowtie2-build input_fasta <prefix>`; returns the index
    prefix path (ref bowtie_tools.py:24-52)."""
    input_fasta = os.path.abspath(input_fasta)
    if not os.path.isfile(input_fasta):
        raise FileNotFoundError(f"input fasta does not exist: {input_fasta}")
    if ref_path is None:
        prefix = os.path.join(
            os.path.dirname(input_fasta), os.path.basename(ref_name)
        )
    else:
        os.makedirs(ref_path, exist_ok=True)
        prefix = os.path.join(ref_path, os.path.basename(ref_name))
    exe = _find_binary("bowtie2-build", bowtie_path)
    _run([exe, "--quiet", input_fasta, prefix], "bowtie2-build")
    return prefix


def bowtie2_align(
    spark: SparkSession,
    fastq_files: Sequence[str],
    references: Sequence[tuple[str, str]] | str,
    paired: bool = False,
    sam_file: str | None = None,
    working_directory: str | None = None,
    bowtie_ref_name: str | None = None,
    threads: int = 2,
    options: Sequence = (),
    bowtie_path: str | None = None,
    opt_fields_keep: Sequence[str] = ("XN", "XM", "MD"),
) -> DataFrame:
    """Align fastq files with bowtie2 and return the alignments as a
    DataFrame (read_sam schema: 11 std columns + requested tags).

    `references` is [(name, seq), ...] (staged to a fasta and
    indexed, ref bowtie_tools.py:104-123) or a path to an existing
    fasta (indexed as-is). `options` entries are bare flags
    ('--local') or (flag, value) tuples (('--np', 10)), appended
    verbatim (ref :129-134). Unpaired inputs go through -U, paired
    through -1/-2 (ref :137-141).
    """
    fastq_files = [os.path.abspath(f) for f in fastq_files]
    if paired and len(fastq_files) != 2:
        raise ValueError("paired=True requires exactly two fastq files")
    if working_directory is None:
        working_directory = os.path.dirname(fastq_files[0])
    os.makedirs(working_directory, exist_ok=True)
    if bowtie_ref_name is None:
        bowtie_ref_name = f"btref_{int(time.time() * 1000)}_{os.getpid()}"
    if sam_file is None:
        sam_file = bowtie_ref_name + ".sam"
    sam_file = os.path.join(working_directory, os.path.basename(sam_file))

    if isinstance(references, str):
        fasta = os.path.abspath(references)
        if not os.path.isfile(fasta):
            raise FileNotFoundError(f"reference fasta not found: {fasta}")
    else:
        fasta = os.path.join(working_directory, bowtie_ref_name + ".fasta")
        write_fasta(list(references), fasta)
    prefix = build_reference(
        fasta, bowtie_ref_name, working_directory, bowtie_path
    )

    cmd: list = [_find_binary("bowtie2", bowtie_path)]
    if threads:
        cmd += ["--threads", threads]
    cmd += _normalize_options(options)
    cmd += ["-x", prefix]
    if paired:
        cmd += ["-1", fastq_files[0], "-2", fastq_files[1]]
    else:
        for f in fastq_files:
            cmd += ["-U", f]
    cmd += ["-S", sam_file]
    _run(cmd, "bowtie2")
    if not os.path.isfile(sam_file):
        raise RuntimeError(
            "bowtie2 exited 0 but produced no SAM file - check options"
        )
    return read_sam(spark, sam_file, opt_fields_keep=opt_fields_keep)


def _normalize_options(options: Sequence) -> list[str]:
    """Flatten the options spec (bare flags / (flag, value) tuples)
    into the verbatim argv fragment both align entry points share."""
    out: list[str] = []
    for o in options:
        if isinstance(o, (tuple, list)):
            if len(o) > 1 and o[1] != "":
                out += [str(o[0]), str(o[1])]
            else:
                out.append(str(o[0]))
        else:
            out.append(str(o))
    return out


def _parse_sam_lines(
    lines, keep: Sequence[str], batch_rows: int = 50_000
):
    """Streaming SAM parser: fold body lines into read_sam's column
    layout (11 std columns, flag/mapq int + pos long, plus the
    requested optional tags as strings), yielding a column dict every
    `batch_rows` rows - so a task holding a multi-GB aligner shard
    keeps O(batch) rows in memory, never the whole shard (the
    cluster-scale contract of bowtie2_align_distributed). `lines` is
    any line iterable - a file handle streams straight through."""

    def _new() -> dict:
        cols: dict[str, list] = {c: [] for c in SAM_STD_COLS}
        for t in keep:
            cols[t] = []
        return cols

    def _done(cols: dict) -> dict:
        cols["flag"] = [int(x) for x in cols["flag"]]
        cols["pos"] = [int(x) for x in cols["pos"]]
        cols["mapq"] = [int(x) for x in cols["mapq"]]
        return cols

    cols = _new()
    n = 0
    for line in lines:
        line = line.rstrip("\r\n")
        if not line or line.startswith("@"):
            continue
        f = line.split("\t")
        if len(f) < 11:
            continue
        for i, c in enumerate(SAM_STD_COLS):
            cols[c].append(f[i])
        tags = {}
        for opt in f[11:]:
            parts = opt.split(":", 2)
            if len(parts) == 3:
                tags[parts[0]] = parts[2]
        for t in keep:
            cols[t].append(tags.get(t))
        n += 1
        if n >= batch_rows:
            yield _done(cols)
            cols = _new()
            n = 0
    if n:
        yield _done(cols)


def _parse_sam_text(text: str, keep: Sequence[str]) -> dict:
    """One-shot wrapper over _parse_sam_lines for in-memory SAM text
    (tests / small shards): parse everything into a single column
    dict."""
    out = None
    for cols in _parse_sam_lines(iter(text.splitlines()), keep, 1 << 62):
        out = cols
    if out is None:
        out = {c: [] for c in (*SAM_STD_COLS, *keep)}
    return out


def bowtie2_align_distributed(
    spark: SparkSession,
    fastq_files: Sequence | DataFrame,
    references: Sequence[tuple[str, str]] | str,
    paired: bool = False,
    working_directory: str | None = None,
    bowtie_ref_name: str | None = None,
    threads: int = 1,
    options: Sequence = (),
    bowtie_path: str | None = None,
    opt_fields_keep: Sequence[str] = ("XN", "XM", "MD"),
) -> DataFrame:
    """Cluster-scale alignment fan-out (the pattern the module
    docstring promises): ONE task per fastq split, each running
    bowtie2 on its split and emitting the parsed alignments directly.

    `fastq_files` is a list of split paths (or, with paired=True, a
    list of (r1, r2) path pairs), or an already-partitioned DataFrame
    with a `path` column (+ `path2` when paired) when the split list
    itself is too big to sit on the driver. The index is built ONCE
    on the driver host; `working_directory` (index + fasta staging)
    must be visible to every executor - on a real cluster that means
    shared storage (NFS/fuse mount) or `spark.files`-shipped index
    shards, the same contract every distributed-aligner pipeline has.

    Spark-first shape: each task writes its SAM shard into a
    task-local tempdir and parses it inline into Arrow batches
    (`_parse_sam_text`, read_sam's exact column layout) - alignments
    land as a distributed DataFrame with NO intermediate shard files
    on shared storage and no driver-side re-ingest, and the result
    unions, filters, and joins like any other relation (e.g. straight
    into remove_contaminant_reads). Reference parity: the single-node
    workflow at bowtie_tools.py:55-165 run once per split.
    """
    import pandas as pd

    exe = _find_binary("bowtie2", bowtie_path)
    if working_directory is None:
        working_directory = os.path.join(
            os.getcwd(), f"btwork_{int(time.time() * 1000)}_{os.getpid()}"
        )
    os.makedirs(working_directory, exist_ok=True)
    if bowtie_ref_name is None:
        bowtie_ref_name = f"btref_{int(time.time() * 1000)}_{os.getpid()}"
    if isinstance(references, str):
        fasta = os.path.abspath(references)
        if not os.path.isfile(fasta):
            raise FileNotFoundError(f"reference fasta not found: {fasta}")
    else:
        fasta = os.path.join(working_directory, bowtie_ref_name + ".fasta")
        write_fasta(list(references), fasta)
    prefix = build_reference(
        fasta, bowtie_ref_name, working_directory, bowtie_path
    )

    if isinstance(fastq_files, DataFrame):
        paths_df = fastq_files
    elif paired:
        rows = [(os.path.abspath(a), os.path.abspath(b)) for a, b in fastq_files]
        paths_df = spark.createDataFrame(
            rows, "path string, path2 string"
        ).repartition(max(len(rows), 1))
    else:
        rows = [(os.path.abspath(p),) for p in fastq_files]
        paths_df = spark.createDataFrame(rows, "path string").repartition(
            max(len(rows), 1)
        )

    opts = _normalize_options(options)
    keep = tuple(opt_fields_keep)
    n_threads = int(threads)
    is_paired = bool(paired)

    def _align(batches):
        import tempfile

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                with tempfile.TemporaryDirectory() as td:
                    shard = os.path.join(td, "shard.sam")
                    cmd = [exe]
                    if n_threads:
                        cmd += ["--threads", str(n_threads)]
                    cmd += opts + ["-x", prefix]
                    if is_paired:
                        cmd += ["-1", row.path, "-2", row.path2]
                    else:
                        cmd += ["-U", row.path]
                    cmd += ["-S", shard]
                    _run(cmd, f"bowtie2 ({row.path})")
                    # stream the shard: fixed-size pandas batches off
                    # the open file handle, never the whole shard as
                    # one string + one DataFrame (per-task memory is
                    # O(batch_rows), the ADVICE r5 fix)
                    with open(shard) as fh:
                        for cols in _parse_sam_lines(fh, keep):
                            if cols["header"]:
                                yield pd.DataFrame(cols)

    schema = (
        "header string, flag int, rname string, pos long, mapq int, "
        "cigar string, rnext string, pnext string, tlen string, "
        "seq string, qual string"
        + "".join(f", {t} string" for t in keep)
    )
    return paths_df.mapInPandas(_align, schema)


def remove_contaminant_reads(
    reads: DataFrame,
    contaminant_alignments: DataFrame,
    id_col: str = "header",
) -> DataFrame:
    """The phix-filter workflow (ref bowtie_tools.py:168-199),
    relational: drop every read whose id MAPPED against the
    contaminant reference (SAM flag bit 0x4 = unmapped, so mapped =
    flag & 4 == 0). The reference reshuffles fastq files with
    --un-conc + renames; here the hit list anti-joins out of the read
    table and composes with any downstream plan - at scale the hit
    list is a fraction of the corpus and AQE broadcasts it."""
    hits = contaminant_alignments.filter(
        (F.col("flag").cast("int").bitwiseAND(4)) == 0
    ).select(F.col("header").alias(id_col)).distinct()
    return reads.join(hits, id_col, "left_anti")
