"""Pure-formula tests against the reference's golden literals
(/root/reference/tests/main.rs — bit-level regression anchors)."""

from __future__ import annotations

from datafusion_functions_extra_spark.functions import _numerics as num


def test_kurtosis_golden():
    # tests/main.rs:390-402
    assert num.kurtosis_py([1.0, 10.0, 100.0, 10.0, 1.0]) == 4.777292927667962


def test_kurtosis_n3_null():
    # tests/main.rs:417-427 — needs n > 3
    assert num.kurtosis_py([1.0, 2.0, 3.0]) is None


def test_kurtosis_all_null():
    assert num.kurtosis_py([None, None]) is None


def test_skewness_golden():
    # tests/main.rs:336-360 — six non-null rows of TEST_TABLE
    assert num.skewness_py([1.0, 2.0, 2.0, 3.0, 3.0, 3.0]) == -0.8573214099741201


def test_skewness_small_n_null():
    # tests/main.rs:363-383
    assert num.skewness_py([1.0]) is None
    assert num.skewness_py([1.0, 2.0]) is None


def test_skewness_zero_variance_null():
    assert num.skewness_py([5.0, 5.0, 5.0]) is None


def test_kurtosis_pop_golden():
    # tests/main.rs:272-296
    assert num.kurtosis_pop_py([1.0, 2.0, 2.0, 3.0, 3.0, 3.0]) == -0.9599999999999755


def test_kurtosis_pop_single_null():
    # tests/main.rs:298-316 — zero variance
    assert num.kurtosis_pop_py([1.0]) is None


def test_mode_tie_max_wins():
    # src/common/mode/native.rs:113-128 — tie -> max value
    assert num.mode_py([1, 1, 2, 2]) == 2
    assert num.mode_py(["a", "a", "b", "b"]) == "b"


def test_mode_nulls_skipped_and_all_null():
    assert num.mode_py([None, 3, 3, None, 1]) == 3
    assert num.mode_py([None, None]) is None
