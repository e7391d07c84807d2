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

Scale note: index build + alignment run ONCE on the driver host
(bowtie2 is a single-node tool); the expensive part - consuming the
alignments - is distributed from the first touch via read_sam. For
cluster-scale alignment fan-out, split the fastq and run this
wrapper per split under `mapInPandas` over a paths DataFrame, each
task writing its own SAM shard (the same pattern the BAM source uses
for per-file parallelism).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sam import read_sam

__all__ = [
    "build_reference",
    "bowtie2_align",
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
    for o in options:
        if isinstance(o, (tuple, list)):
            cmd += [o[0], o[1]] if len(o) > 1 and o[1] != "" else [o[0]]
        else:
            cmd.append(o)
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
