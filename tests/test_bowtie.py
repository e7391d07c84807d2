"""S10 bowtie2 wrappers: full orchestration (fasta staging, index
build, command assembly, SAM ingestion, contaminant anti-join) with a
STUB aligner on PATH - only the third-party binary itself is faked,
and the stub derives its SAM output from its actual inputs, so the
wiring is tested end to end."""

import os

import pytest


@pytest.fixture()
def stub_bowtie(tmp_path):
    from seqtables_spark.sources.bowtie import install_stub_aligner

    return install_stub_aligner(str(tmp_path / "bin"))


def _write_fastq(path, reads):
    with open(path, "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")
    return str(path)


def test_bowtie2_align_end_to_end(spark, tmp_path, stub_bowtie):
    from seqtables_spark.sources.bowtie import bowtie2_align

    ref_seq = "AAACCCGGGTTTACGTACGTACGT"
    fq = _write_fastq(
        tmp_path / "in.fastq",
        [("r1", "CCCGGG"), ("r2", "ACGTACGT"), ("r3", "NNNNNN")],
    )
    df = bowtie2_align(
        spark,
        [fq],
        [("ref1", ref_seq)],
        working_directory=str(tmp_path / "wd"),
        bowtie_ref_name="myref",
        options=["--local", ("--np", 10)],
        threads=3,
        bowtie_path=stub_bowtie,
    )
    rows = {r.header: r for r in df.collect()}
    assert rows["r1"].flag == 0 and rows["r1"].pos == 4
    assert rows["r1"].cigar == "6M" and rows["r1"].rname == "ref1"
    assert rows["r2"].flag == 0 and rows["r2"].pos == 13
    assert rows["r3"].flag == 4
    assert rows["r1"].XM == "0" and rows["r3"].XM == "1"
    # command assembly reached the binary verbatim
    argv = open(os.path.join(stub_bowtie, "last_argv.txt")).read().split("\t")
    assert argv[:2] == ["--threads", "3"]
    assert "--local" in argv and ["--np", "10"] == argv[
        argv.index("--np") : argv.index("--np") + 2
    ]
    assert "-U" in argv and "-1" not in argv


def test_bowtie2_paired_wiring(spark, tmp_path, stub_bowtie):
    from seqtables_spark.sources.bowtie import bowtie2_align

    fq1 = _write_fastq(tmp_path / "r1.fastq", [("a", "ACGT")])
    fq2 = _write_fastq(tmp_path / "r2.fastq", [("b", "TTTT")])
    df = bowtie2_align(
        spark,
        [fq1, fq2],
        [("ref", "ACGTTTTT")],
        paired=True,
        working_directory=str(tmp_path / "wd"),
        bowtie_path=stub_bowtie,
    )
    argv = open(os.path.join(stub_bowtie, "last_argv.txt")).read().split("\t")
    assert "-1" in argv and "-2" in argv and "-U" not in argv
    assert {r.header for r in df.collect()} == {"a", "b"}


def test_remove_contaminant_reads(spark, tmp_path, stub_bowtie):
    from seqtables_spark.sources.bowtie import (
        bowtie2_align, remove_contaminant_reads,
    )

    phix_like = "ACGACGACGACGACG"
    fq = _write_fastq(
        tmp_path / "in.fastq",
        [("clean", "TTTTTT"), ("dirty", "ACGACG")],
    )
    hits = bowtie2_align(
        spark, [fq], [("phix", phix_like)],
        working_directory=str(tmp_path / "wd"),
        bowtie_path=stub_bowtie,
    )
    reads = spark.createDataFrame(
        [("clean", "TTTTTT"), ("dirty", "ACGACG")], "header string, seq string"
    )
    kept = remove_contaminant_reads(reads, hits)
    assert [r.header for r in kept.collect()] == ["clean"]


def test_bowtie2_align_distributed_matches_single_node(
    spark, tmp_path, stub_bowtie
):
    """Per-split fan-out (one task per fastq shard, aligner run
    IN-TASK, rows parsed in-task - no shared shard files) produces
    exactly the single-node wrapper's rows, including optional tags."""
    from seqtables_spark.sources.bowtie import (
        bowtie2_align, bowtie2_align_distributed,
    )

    ref_seq = "AAACCCGGGTTTACGTACGTACGT"
    reads = [
        ("r1", "CCCGGG"), ("r2", "ACGTACGT"), ("r3", "NNNNNN"),
        ("r4", "AAACCC"), ("r5", "GGGTTT"), ("r6", "TTTTTT"),
    ]
    splits = [
        _write_fastq(tmp_path / f"split{i}.fastq", reads[i * 2 : i * 2 + 2])
        for i in range(3)
    ]
    whole = _write_fastq(tmp_path / "all.fastq", reads)

    dist = bowtie2_align_distributed(
        spark, splits, [("ref1", ref_seq)],
        working_directory=str(tmp_path / "wd_d"),
        bowtie_path=stub_bowtie,
    )
    single = bowtie2_align(
        spark, [whole], [("ref1", ref_seq)],
        working_directory=str(tmp_path / "wd_s"),
        bowtie_path=stub_bowtie,
    )
    key = lambda r: (
        r.header, r.flag, r.rname, r.pos, r.mapq, r.cigar, r.seq, r.qual,
        r.XM,
    )
    assert sorted(map(key, dist.collect())) == sorted(map(key, single.collect()))
    # genuinely fanned out: one input partition per split
    assert dist.rdd.getNumPartitions() == 3


def test_bowtie2_align_distributed_paired_and_paths_df(
    spark, tmp_path, stub_bowtie
):
    from seqtables_spark.sources.bowtie import bowtie2_align_distributed

    fq1 = _write_fastq(tmp_path / "a1.fastq", [("a", "ACGT")])
    fq2 = _write_fastq(tmp_path / "a2.fastq", [("b", "TTTT")])
    got = bowtie2_align_distributed(
        spark, [(fq1, fq2)], [("ref", "ACGTTTTT")], paired=True,
        working_directory=str(tmp_path / "wd_p"),
        bowtie_path=stub_bowtie,
    )
    assert {r.header for r in got.collect()} == {"a", "b"}
    # pre-partitioned paths DataFrame form (the >driver-memory shape)
    pdf = spark.createDataFrame([(fq1,), (fq2,)], "path string").repartition(2)
    got2 = bowtie2_align_distributed(
        spark, pdf, [("ref", "ACGTTTTT")],
        working_directory=str(tmp_path / "wd_q"),
        bowtie_path=stub_bowtie,
    )
    assert {r.header for r in got2.collect()} == {"a", "b"}


def test_missing_binary_raises(tmp_path):
    from seqtables_spark.sources.bowtie import build_reference

    fasta = tmp_path / "x.fasta"
    fasta.write_text(">a\nACGT\n")
    with pytest.raises(FileNotFoundError, match="bowtie2-build"):
        build_reference(str(fasta), "x", bowtie_path=str(tmp_path))
