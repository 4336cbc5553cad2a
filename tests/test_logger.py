"""Tests for the kv logger: writer formats, mean semantics, profiling."""

import json
import os
import time

import numpy as np
import pytest

from ddpm3d_tpu.utils import logger


@pytest.fixture
def fresh_logger(tmp_path):
    old = logger.Logger.CURRENT
    logger.configure(str(tmp_path), format_strs=["log", "csv", "json"])
    yield str(tmp_path)
    logger.Logger.CURRENT = old


def test_logkv_last_wins_and_mean(fresh_logger):
    logger.logkv("a", 1.0)
    logger.logkv("a", 3.0)
    logger.logkv_mean("b", 2.0)
    logger.logkv_mean("b", 4.0)
    out = logger.dumpkvs()
    assert out["a"] == 3.0
    assert out["b"] == 3.0  # running mean
    # kv store cleared after dump
    assert logger.getkvs() == {}


def test_csv_dynamic_columns(fresh_logger):
    logger.logkv("x", 1)
    logger.dumpkvs()
    logger.logkv("x", 2)
    logger.logkv("y", 5)
    logger.dumpkvs()
    with open(os.path.join(fresh_logger, "progress.csv")) as f:
        lines = [l.strip() for l in f]
    assert lines[0] == "x,y"
    assert lines[1] == "1,"
    assert lines[2] == "2,5"


def test_json_writer(fresh_logger):
    logger.logkv("loss", 0.5)
    logger.dumpkvs()
    with open(os.path.join(fresh_logger, "progress.json")) as f:
        rec = json.loads(f.readline())
    assert rec["loss"] == 0.5


def test_log_text_file(fresh_logger):
    logger.log("hello", "world")
    with open(os.path.join(fresh_logger, "log.txt")) as f:
        assert "hello world" in f.read()


def test_profile_kv_accumulates(fresh_logger):
    with logger.profile_kv("io"):
        time.sleep(0.01)
    with logger.profile_kv("io"):
        time.sleep(0.01)
    assert logger.getkvs()["wait_io"] >= 0.02


def test_profile_decorator(fresh_logger):
    @logger.profile("fn")
    def f():
        time.sleep(0.005)

    f()
    assert logger.getkvs()["wait_fn"] >= 0.005


def test_gather_weighted_means_single_process():
    out = logger.gather_weighted_means({"a": 1.0, "b": 2.0})
    assert out == {"a": 1.0, "b": 2.0}
