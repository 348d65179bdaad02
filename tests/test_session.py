"""Session-factory profile behavior."""

from __future__ import annotations

import pytest

from feature_generation_benchmark_spark.session import comet_jar, get_spark


def test_comet_profile_noops_without_jar(spark, monkeypatch):
    """profile='comet' must be a clean no-op when no Comet jar exists —
    callers request the accelerated profile unconditionally and get the
    plain engine profile on vanilla machines."""
    import feature_generation_benchmark_spark.session as sess

    monkeypatch.setattr(sess, "comet_jar", lambda: None)
    s = sess.get_spark("comet-noop-test", profile="comet")
    # getOrCreate reuses the test session; no comet confs were applied
    assert s.conf.get("spark.comet.enabled", "false") == "false"


def test_unknown_profile_rejected():
    with pytest.raises(ValueError, match="unknown session profile"):
        get_spark("bad-profile-test", profile="nope")


def test_comet_jar_env_missing_path(monkeypatch):
    """An explicitly configured jar path that doesn't exist must raise —
    silently running the 'comet' profile on vanilla Spark would
    invalidate an A/B measurement without a trace (r6 session-2 review)."""
    import pytest

    monkeypatch.setenv("SPARK_GRAFT_COMET_JAR", "/nonexistent/comet.jar")
    with pytest.raises(FileNotFoundError, match="SPARK_GRAFT_COMET_JAR"):
        comet_jar()
