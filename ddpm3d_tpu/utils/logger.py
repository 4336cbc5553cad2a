"""KV metrics logger with human/CSV/JSON/TensorBoard writers.

API and on-disk formats follow the reference's OpenAI-baselines logger
(guided_diffusion/logger.py, itself vendored MIT-licensed baselines code):
``logkv`` (last-wins), ``logkv_mean`` (running mean), ``dumpkvs`` flush,
``profile_kv`` wall-time accumulation, multi-format writers selected by
env var, per-rank file suffixes. **Output compatibility is intentional**
— the boxed human table, the dynamically-extended ``progress.csv``, and
the JSON-lines file are byte-format targets so downstream tooling keeps
working — but the implementations here are independent: the human table
renders via ljust over a prepared row list, the CSV writer re-renders
from an in-memory row cache instead of seek/patch, and running means are
kept as (sum, count) pairs. TensorBoard output is gated on a lazy import.

Process-0 semantics: in a multi-process JAX job, only process 0 writes
stdout/CSV/JSON by default (mirror of logger.py:457-467's rank split).
"""

from __future__ import annotations

import contextlib
import datetime
import functools
import json
import os
import os.path as osp
import sys
import tempfile
import time
from collections import defaultdict
from typing import Any, Dict, List, Optional

DEBUG = 10
INFO = 20
WARN = 30
ERROR = 40
DISABLED = 50


class KVWriter:
    def writekvs(self, kvs: Dict[str, Any]) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class SeqWriter:
    def writeseq(self, seq) -> None:
        raise NotImplementedError


class HumanOutputFormat(KVWriter, SeqWriter):
    """Boxed key | value table (reference logger.py:36-95)."""

    def __init__(self, filename_or_file):
        if isinstance(filename_or_file, str):
            self.file = open(filename_or_file, "wt")
            self.own_file = True
        else:
            self.file = filename_or_file
            self.own_file = False

    def writekvs(self, kvs):
        if not kvs:
            print("WARNING: tried to write empty key-value dict")
            return
        # dict keyed on the truncated label: keys colliding after
        # truncation collapse to one row (last wins), matching the
        # reference's key2str-dict behavior (logger.py:66-71)
        row_map = {
            self._truncate(k): self._truncate(
                f"{v:<8.3g}" if hasattr(v, "__float__") else str(v)
            )
            for k, v in kvs.items()
        }
        rows = sorted(row_map.items(), key=lambda r: r[0].lower())
        kw = max(len(k) for k, _ in rows)
        vw = max(len(v) for _, v in rows)
        rule = "-" * (kw + vw + 7)
        body = "".join(
            f"| {k.ljust(kw)} | {v.ljust(vw)} |\n" for k, v in rows
        )
        self.file.write(f"{rule}\n{body}{rule}\n")
        self.file.flush()

    @staticmethod
    def _truncate(s: str, maxlen: int = 30) -> str:
        return s[: maxlen - 3] + "..." if len(s) > maxlen else s

    def writeseq(self, seq):
        seq = list(seq)
        for i, elem in enumerate(seq):
            self.file.write(elem)
            if i < len(seq) - 1:
                self.file.write(" ")
        self.file.write("\n")
        self.file.flush()

    def close(self):
        if self.own_file:
            self.file.close()


class JSONOutputFormat(KVWriter):
    """One JSON object per dump (reference logger.py:98-112)."""

    def __init__(self, filename):
        self.file = open(filename, "wt")

    def writekvs(self, kvs):
        out = {}
        for k, v in sorted(kvs.items()):
            out[k] = float(v) if hasattr(v, "dtype") or hasattr(v, "__float__") else v
        self.file.write(json.dumps(out) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class CSVOutputFormat(KVWriter):
    """CSV whose header grows as new keys appear; earlier rows keep empty
    cells for later columns (format-compatible with the reference's
    progress.csv, logger.py:115-155). Implemented by re-rendering the whole
    file from an in-memory row cache whenever the column set grows — rows
    are bounded by dump count, and wholesale rewrite is simpler and safer
    than in-place patching."""

    def __init__(self, filename):
        self.filename = filename
        self.file = open(filename, "wt")
        self.columns: List[str] = []
        self._rows: List[Dict[str, Any]] = []

    @staticmethod
    def _cell(row: Dict[str, Any], col: str) -> str:
        v = row.get(col)
        return "" if v is None else str(v)

    def writekvs(self, kvs):
        new_cols = sorted(k for k in kvs if k not in self.columns)
        self._rows.append(dict(kvs))
        if new_cols:
            self.columns.extend(new_cols)
            self.file.close()
            self.file = open(self.filename, "wt")
            self.file.write(",".join(self.columns) + "\n")
            for row in self._rows:
                self.file.write(
                    ",".join(self._cell(row, c) for c in self.columns) + "\n"
                )
        else:
            self.file.write(
                ",".join(self._cell(kvs, c) for c in self.columns) + "\n"
            )
        self.file.flush()

    def close(self):
        self.file.close()


class TensorBoardOutputFormat(KVWriter):
    """Scalar summaries via a lazy TF import (reference logger.py:158-204)."""

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        self.step = 1
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self.writer = SummaryWriter(logdir)
        except Exception:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self.writer = SummaryWriter(logdir)
            except Exception:
                self.writer = None

    def writekvs(self, kvs):
        if self.writer is None:
            return
        for k, v in kvs.items():
            try:
                self.writer.add_scalar(k, float(v), self.step)
            except (TypeError, ValueError):
                pass
        self.step += 1

    def close(self):
        if self.writer is not None:
            self.writer.close()


def make_output_format(fmt: str, ev_dir: str, log_suffix: str = "") -> KVWriter:
    """(reference logger.py:187-204)"""
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == "stdout":
        return HumanOutputFormat(sys.stdout)
    if fmt == "log":
        return HumanOutputFormat(osp.join(ev_dir, f"log{log_suffix}.txt"))
    if fmt == "json":
        return JSONOutputFormat(osp.join(ev_dir, f"progress{log_suffix}.json"))
    if fmt == "csv":
        return CSVOutputFormat(osp.join(ev_dir, f"progress{log_suffix}.csv"))
    if fmt == "tensorboard":
        return TensorBoardOutputFormat(osp.join(ev_dir, f"tb{log_suffix}"))
    raise ValueError(f"Unknown format specified: {fmt}")


class Logger:
    DEFAULT: Optional["Logger"] = None
    CURRENT: Optional["Logger"] = None

    def __init__(self, dir: Optional[str], output_formats: List[KVWriter]):
        self.name2val: Dict[str, float] = defaultdict(float)
        self.name2cnt: Dict[str, int] = defaultdict(int)
        self._mean_sum: Dict[str, float] = defaultdict(float)
        self.level = INFO
        self.dir = dir
        self.output_formats = output_formats

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        # running mean kept as (sum, count); name2val always holds the
        # current mean so getkvs()/dumpkvs() see the aggregated value
        self._mean_sum[key] += val
        self.name2cnt[key] += 1
        self.name2val[key] = self._mean_sum[key] / self.name2cnt[key]

    def dumpkvs(self):
        if self.level == DISABLED:
            return {}
        out = self.name2val.copy()
        for fmt in self.output_formats:
            if isinstance(fmt, KVWriter):
                fmt.writekvs(self.name2val)
        self.name2val.clear()
        self.name2cnt.clear()
        self._mean_sum.clear()
        return out

    def log(self, *args, level=INFO):
        if self.level <= level:
            for fmt in self.output_formats:
                if isinstance(fmt, SeqWriter):
                    fmt.writeseq(map(str, args))

    def set_level(self, level):
        self.level = level

    def get_dir(self):
        return self.dir

    def close(self):
        for fmt in self.output_formats:
            fmt.close()


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def configure(
    dir: Optional[str] = None,
    format_strs: Optional[List[str]] = None,
    log_suffix: str = "",
):
    """(reference logger.py:442-471); DDPM_LOG_FORMAT mirrors
    OPENAI_LOG_FORMAT (either env var is honored)."""
    if dir is None:
        dir = os.getenv("DDPM_LOGDIR") or os.getenv("OPENAI_LOGDIR")
    if dir is None:
        dir = osp.join(
            tempfile.gettempdir(),
            datetime.datetime.now().strftime("ddpm3d-%Y-%m-%d-%H-%M-%S-%f"),
        )
    assert isinstance(dir, str)
    os.makedirs(dir, exist_ok=True)

    rank = _process_index()
    if format_strs is None:
        if rank == 0:
            format_strs = (
                os.getenv("DDPM_LOG_FORMAT")
                or os.getenv("OPENAI_LOG_FORMAT")
                or "stdout,log,csv"
            ).split(",")
        else:
            format_strs = (
                os.getenv("DDPM_LOG_FORMAT_MPI")
                or os.getenv("OPENAI_LOG_FORMAT_MPI")
                or "log"
            ).split(",")
            log_suffix = log_suffix or f"-rank{rank:03d}"
    format_strs = [f for f in format_strs if f]
    output_formats = [make_output_format(f, dir, log_suffix) for f in format_strs]

    Logger.CURRENT = Logger(dir=dir, output_formats=output_formats)
    if output_formats:
        log(f"Logging to {dir}")


def _ensure_configured() -> Logger:
    if Logger.CURRENT is None:
        configure(format_strs=["stdout"])
        Logger.DEFAULT = Logger.CURRENT
    return Logger.CURRENT


def logkv(key, val):
    _ensure_configured().logkv(key, val)


def logkv_mean(key, val):
    _ensure_configured().logkv_mean(key, val)


def logkvs(d):
    for k, v in d.items():
        logkv(k, v)


def dumpkvs():
    return _ensure_configured().dumpkvs()


def getkvs():
    return _ensure_configured().name2val


def log(*args, level=INFO):
    _ensure_configured().log(*args, level=level)


def debug(*args):
    log(*args, level=DEBUG)


def info(*args):
    log(*args, level=INFO)


def warn(*args):
    log(*args, level=WARN)


def error(*args):
    log(*args, level=ERROR)


def set_level(level):
    _ensure_configured().set_level(level)


def get_dir():
    return _ensure_configured().get_dir()


record_tabular = logkv
dump_tabular = dumpkvs


@contextlib.contextmanager
def profile_kv(scopename: str):
    """Accumulate wall time under ``wait_<scope>`` (reference
    logger.py:293-305)."""
    logkey = "wait_" + scopename
    tstart = time.time()
    try:
        yield
    finally:
        _ensure_configured().name2val[logkey] += time.time() - tstart


def profile(n: str):
    """Decorator form (reference logger.py:308-317)."""

    def decorator_with_name(func):
        @functools.wraps(func)
        def func_wrapper(*args, **kwargs):
            with profile_kv(n):
                return func(*args, **kwargs)

        return func_wrapper

    return decorator_with_name


def gather_weighted_means(local_kvs: Dict[str, float],
                          local_counts: Optional[Dict[str, int]] = None
                          ) -> Dict[str, float]:
    """Cross-process weighted mean of kv dicts — the reference's
    ``mpi_weighted_mean`` (logger.py:412-439), rebuilt on JAX multihost
    collectives instead of ``comm.gather``.

    Under single-controller JAX most train metrics are already global
    (computed from sharded arrays), so this is only needed for host-local
    quantities (IO timings, per-host counters). Identity when running a
    single process.
    """
    try:
        import jax

        nproc = jax.process_count()
    except Exception:
        nproc = 1
    if nproc == 1:
        return dict(local_kvs)

    import numpy as np
    from jax.experimental import multihost_utils

    keys = sorted(local_kvs)
    counts = local_counts or {k: 1 for k in keys}
    vals = np.array(
        [[local_kvs[k] * counts.get(k, 1) for k in keys],
         [counts.get(k, 1) for k in keys]],
        dtype=np.float64,
    )
    gathered = multihost_utils.process_allgather(vals)  # [P, 2, K]
    sums = gathered[:, 0, :].sum(axis=0)
    cnts = gathered[:, 1, :].sum(axis=0)
    return {k: float(s / max(c, 1e-12)) for k, s, c in zip(keys, sums, cnts)}


def start_trace(logdir: Optional[str] = None):
    """Start a jax.profiler trace (the TPU-native analog of the reference's
    profile_kv wall-time scopes, SURVEY.md §5.1). View in TensorBoard or
    xprof."""
    import jax

    logdir = logdir or osp.join(get_dir() or tempfile.gettempdir(), "trace")
    jax.profiler.start_trace(logdir)
    return logdir


def stop_trace():
    import jax

    jax.profiler.stop_trace()
