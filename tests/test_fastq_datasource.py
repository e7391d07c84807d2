"""FASTQ Python DataSource (Spark 4 DataSource API): record-aligned
byte-range splitting must read every record exactly once for ANY
split size, including boundaries landing exactly on record starts and
quality lines that start with '@'/'+' (the classic mis-alignment
trap). Cross-checked against the line-pivot reader (sources/fastq)."""

import gzip
import random

import pytest


def _mk_records(n=300, seed=5):
    rng = random.Random(seed)
    recs = []
    for i in range(n):
        L = rng.randint(10, 60)
        seq = "".join(rng.choice("ACGT") for _ in range(L))
        qual = ("@" if i % 3 == 0 else "+" if i % 3 == 1 else "I") + "".join(
            chr(33 + rng.randint(0, 40)) for _ in range(L - 1)
        )
        recs.append((f"r{i} desc", seq, qual))
    return recs


def _write(path, recs):
    with open(path, "w") as fh:
        for h, s, q in recs:
            fh.write(f"@{h}\n{s}\n+\n{q}\n")


@pytest.fixture(scope="module")
def fastq_file(tmp_path_factory):
    recs = _mk_records()
    p = tmp_path_factory.mktemp("fq") / "t.fastq"
    _write(str(p), recs)
    return str(p), sorted(recs)


def test_fastq_source_split_sizes_sweep(spark, fastq_file):
    from seqtables_spark.sources.fastq_datasource import register_fastq_source

    register_fastq_source(spark)
    path, want = fastq_file
    for pb in (53, 97, 256, 997, 5000):
        df = spark.read.format("fastq").option("partition_bytes", pb).load(path)
        got = sorted((r["read_id"], r["seq"], r["qual"]) for r in df.collect())
        assert got == want, f"partition_bytes={pb}"
    assert df.rdd.getNumPartitions() >= 2


def test_fastq_source_boundary_exactly_at_record_start(fastq_file):
    """A split starting exactly at a record's first byte owns that
    record (the seek(start-1) idiom)."""
    from seqtables_spark.sources.fastq_datasource import _records_from

    path, _ = fastq_file
    offs = []
    with open(path, "rb") as f:
        off = 0
        for i, line in enumerate(f):
            if i % 4 == 0:
                offs.append(off)
            off += len(line)
    for o in offs[:25]:
        with open(path, "rb") as f:
            rs = list(_records_from(f, o, o + 1))
        assert len(rs) == 1


def test_fastq_source_gz_single_partition(spark, tmp_path, fastq_file):
    from seqtables_spark.sources.fastq_datasource import register_fastq_source

    register_fastq_source(spark)
    path, want = fastq_file
    gz = str(tmp_path / "t.fastq.gz")
    with open(path, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    df = spark.read.format("fastq").load(gz)
    assert df.rdd.getNumPartitions() == 1  # gz is not splittable
    got = sorted((r["read_id"], r["seq"], r["qual"]) for r in df.collect())
    assert got == want


def test_fastq_source_agrees_with_line_pivot_reader(spark, fastq_file):
    from seqtables_spark.sources.fastq import read_fastq
    from seqtables_spark.sources.fastq_datasource import register_fastq_source

    register_fastq_source(spark)
    path, want = fastq_file
    a = sorted(
        (r["read_id"], r["seq"], r["qual"])
        for r in spark.read.format("fastq").load(path).collect()
    )
    b = sorted(
        (r["read_id"], r["seq"], r["qual"])
        for r in read_fastq(spark, path).collect()
    )
    assert a == b == want


def test_fastq_source_fuzz_random_corpora(spark):
    """Seeded fuzz: random record counts, lengths and adversarial
    quality strings across random split sizes always read exactly
    once."""
    import os
    import random
    import tempfile

    from seqtables_spark.sources.fastq_datasource import register_fastq_source

    register_fastq_source(spark)
    rng = random.Random(123)
    for trial in range(3):
        recs = []
        for i in range(rng.randint(1, 120)):
            L = rng.randint(1, 80)
            seq = "".join(rng.choice("ACGTN") for _ in range(L))
            qual = "".join(
                chr(33 + rng.randint(0, 60)) for _ in range(L)
            )  # includes '@' (31) and '+' (10) and '"' (1) as qual chars
            recs.append((f"t{trial}r{i}", seq, qual))
        path = os.path.join(
            tempfile.gettempdir(), f"fq_fuzz_{os.getpid()}_{trial}.fastq"
        )
        with open(path, "w") as fh:
            for h, s_, q in recs:
                fh.write(f"@{h}\n{s_}\n+\n{q}\n")
        pb = rng.choice([37, 111, 409, 1009])
        df = spark.read.format("fastq").option("partition_bytes", pb).load(path)
        got = sorted((r["read_id"], r["seq"], r["qual"]) for r in df.collect())
        assert got == sorted(recs), f"trial {trial} pb {pb}"
        os.unlink(path)
