"""submit_or_local routing logic (session.py) — the decision matrix a
plain-python launch walks before any JVM exists.  The wrong branch here
either OOMs a 240k-page build in an untuned 1 GB JVM (the measured
failure that motivated the resolver) or silently pulls a configured
cluster job onto the driver box, so the pure decision pieces are pinned
without spinning up sessions."""

import os

import pytest

from search_engine_spark.session import configured_master, default_parallelism


@pytest.fixture
def clean_env(monkeypatch):
    for var in ("MASTER", "SPARK_HOME", "PYSPARK_GATEWAY_PORT",
                "SPARK_GRAFT_CPUS"):
        monkeypatch.delenv(var, raising=False)
    return monkeypatch


class TestConfiguredMaster:
    def test_nothing_configured(self, clean_env):
        assert configured_master() is None

    def test_master_env_wins(self, clean_env):
        clean_env.setenv("MASTER", "spark://cluster:7077")
        assert configured_master() == "spark://cluster:7077"

    def test_spark_defaults_file(self, clean_env, tmp_path):
        conf = tmp_path / "conf"
        conf.mkdir()
        (conf / "spark-defaults.conf").write_text(
            "# comment\n"
            "spark.executor.memory   4g\n"
            "spark.master   spark://defaults-host:7077\n"
        )
        clean_env.setenv("SPARK_HOME", str(tmp_path))
        assert configured_master() == "spark://defaults-host:7077"

    def test_spark_home_without_defaults_file(self, clean_env, tmp_path):
        clean_env.setenv("SPARK_HOME", str(tmp_path))
        assert configured_master() is None

    def test_master_env_beats_defaults_file(self, clean_env, tmp_path):
        conf = tmp_path / "conf"
        conf.mkdir()
        (conf / "spark-defaults.conf").write_text("spark.master local[2]\n")
        clean_env.setenv("SPARK_HOME", str(tmp_path))
        clean_env.setenv("MASTER", "yarn")
        assert configured_master() == "yarn"


class TestFallbackSizing:
    def test_default_parallelism_env(self, clean_env):
        clean_env.setenv("SPARK_GRAFT_CPUS", "8")
        assert default_parallelism() == 8

    def test_fallback_master_shape(self, clean_env):
        # the resolver's local fallback is local[default_parallelism()]
        assert f"local[{default_parallelism()}]".startswith("local[")
