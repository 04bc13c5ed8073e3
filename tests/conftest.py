import sys

import pytest

sys.path.insert(0, "/root/repo")

from hypothesis import HealthCheck, settings  # noqa: E402

from text_sentiment_classification_hadoop_spark_spark.session import get_spark  # noqa: E402

# Hypothesis example budget (VERDICT r10 ask #6: property tests are the
# suite's top cost — every @given example that touches Spark pays a
# createDataFrame+collect round-trip, so example counts ARE suite
# seconds). Tests inherit max_examples from the active profile instead
# of pinning it per-test; run `HYPOTHESIS_PROFILE=thorough pytest` for
# deep sweeps. Pure-python property tests (no Spark in the loop) keep
# their own larger explicit @settings — they're microseconds each.
settings.register_profile(
    "suite", max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.too_slow])
settings.register_profile(
    "thorough", max_examples=50, deadline=None,
    suppress_health_check=[HealthCheck.too_slow])
import os  # noqa: E402

settings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "suite"))

SF_SMOKE = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "nightly: opt-in coverage trimmed from the default suite for "
        "wall budget (run with SPARK_GRAFT_NIGHTLY=1; each such test "
        "names the out-of-band gate that replaces it in default runs)")


@pytest.fixture(scope="session")
def spark():
    # core count env-overridable for suite-time experiments (SCALE.md
    # §32: 8 vs 4 measured only ~4% on the heaviest files — the suite
    # is per-job-overhead-bound, not CPU-bound, so the knob stays at a
    # mild 8); shuffle_partitions stays pinned at 4 so plan-shape
    # tests (AQE skew, occupancy, bucket fan-out) see the same
    # partitioning
    cores = os.environ.get("SPARK_GRAFT_TEST_CORES", "8")
    s = get_spark(app_name="pytest", master=f"local[{cores}]",
                  shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
