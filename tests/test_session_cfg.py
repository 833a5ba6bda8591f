"""Session config hygiene — pure-Python units, no SparkSession needed."""

from __future__ import annotations

import pytest

from zelph_spark.session import _jvm_size


def test_jvm_size_passthrough():
    assert _jvm_size("18g") == "18g"
    assert _jvm_size("512m") == "512m"
    assert _jvm_size("1024") == "1024"


def test_jvm_size_spark_suffixes_normalized():
    """ADVICE r4: Spark accepts '18gb'/'2048mb' but -Xms18gb kills the JVM."""
    assert _jvm_size("18gb") == "18g"
    assert _jvm_size("2048MB") == "2048m"
    assert _jvm_size("1T") == "1t"
    assert _jvm_size(" 8G ") == "8g"


def test_jvm_size_rejects_garbage():
    for bad in ("", "abc", "18gig", "1.5g", "-4g"):
        with pytest.raises(ValueError):
            _jvm_size(bad)
