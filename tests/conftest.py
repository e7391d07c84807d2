import pytest

from seqtables_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="seqtables_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def golden_seqs():
    """The reference's golden toy set, tests/tests_to_make.txt:1-8."""
    return ["ACGT", "AAAA", "ATGA", "ATCG", "CCCC", "GGGG"]
