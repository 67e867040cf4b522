"""Logging/observability + config-resolution tests (MessageLogger format,
TB routing, SID root detection, trace summarizer)."""

import gzip
import json
import logging
import os

import numpy as np
import pytest

from lowlight_image_enhancement_tpu.training.config import find_sid_root
from lowlight_image_enhancement_tpu.training.logging_utils import (
    MessageLogger,
    get_root_logger,
)
from lowlight_image_enhancement_tpu.utils.profiling import summarize_trace


class _FakeTB:
    def __init__(self):
        self.scalars = []

    def add_scalar(self, tag, value, global_step):
        self.scalars.append((tag, value, global_step))


class TestMessageLogger:
    def _opt(self):
        return {"name": "exp", "logger": {"print_freq": 1},
                "train": {"total_iter": 1000}}

    def test_console_format(self, caplog):
        logger = MessageLogger(self._opt())
        # the framework logger sets propagate=False; open it up for capture
        logging.getLogger("llie_tpu").propagate = True
        try:
            with caplog.at_level(logging.INFO, logger="llie_tpu"):
                logger({"iter": 10, "epoch": 1, "lrs": [1e-3],
                        "time": 0.1, "data_time": 0.01, "l_total": 0.5})
        finally:
            logging.getLogger("llie_tpu").propagate = False
        msg = caplog.records[-1].message
        assert "[exp]" in msg and "iter:" in msg and "l_total" in msg
        assert "eta:" in msg

    def test_tb_namespace_routing(self):
        tb = _FakeTB()
        logger = MessageLogger(self._opt(), tb_logger=tb)
        logger({"iter": 100, "epoch": 0, "lrs": [1e-3],
                "l_pix": 0.1, "m_psnr": 30.0, "grad_norm": 0.5})
        tags = {t for t, _, _ in tb.scalars}
        assert "losses/l_pix" in tags
        assert "metrics/m_psnr" in tags
        assert "grad_norm" in tags
        # normalized global step: 10000 * iter / total
        steps = {s for _, _, s in tb.scalars}
        assert steps == {1000}

    def test_root_logger_file_handler(self, tmp_path):
        # fresh logger name each call isn't supported; ensure idempotent
        lg1 = get_root_logger()
        lg2 = get_root_logger()
        assert lg1 is lg2


class TestSidRoot:
    def test_env_var_wins(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SID_ROOT", str(tmp_path))
        assert find_sid_root() == str(tmp_path)

    def test_marker_detection(self, tmp_path, monkeypatch):
        monkeypatch.delenv("SID_ROOT", raising=False)
        monkeypatch.delenv("LOWLIGHT_ROOT", raising=False)
        (tmp_path / "SID_assets").mkdir()
        (tmp_path / "SID_pack").mkdir()
        sub = tmp_path / "work" / "deep"
        sub.mkdir(parents=True)
        assert find_sid_root(str(sub)) == str(tmp_path)

    def test_no_root_returns_none(self, tmp_path, monkeypatch):
        monkeypatch.delenv("SID_ROOT", raising=False)
        monkeypatch.delenv("LOWLIGHT_ROOT", raising=False)
        assert find_sid_root(str(tmp_path)) is None


class TestTraceSummarizer:
    def test_summarize_synthetic_trace(self, tmp_path):
        trace = {
            "traceEvents": [
                {"ph": "M", "name": "process_name", "pid": 3,
                 "args": {"name": "/device:TPU:0"}},
                {"ph": "M", "name": "process_name", "pid": 7,
                 "args": {"name": "/host:CPU"}},
                {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 1000},
                {"ph": "X", "pid": 3, "name": "fusion.2", "dur": 500},
                {"ph": "X", "pid": 3, "name": "copy.9", "dur": 250},
                {"ph": "X", "pid": 3, "name": "jit_step", "dur": 9999},
                {"ph": "X", "pid": 7, "name": "host_thing", "dur": 7777},
            ]
        }
        d = tmp_path / "plugins" / "profile" / "run1"
        d.mkdir(parents=True)
        with gzip.open(d / "m.trace.json.gz", "wt") as f:
            json.dump(trace, f)
        fam = summarize_trace(str(tmp_path))
        assert fam["fusion"] == pytest.approx(1.5)  # ms
        assert fam["copy"] == pytest.approx(0.25)
        assert "jit_step" not in fam and "host_thing" not in fam

    def test_missing_trace_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            summarize_trace(str(tmp_path))


class TestWandbLogger:
    """wandb tensorboard-sync mode (reference ``logger.py:101-125``),
    exercised with a stub wandb module."""

    def _stub(self, monkeypatch, calls):
        import sys
        import types

        stub = types.ModuleType("wandb")
        stub.util = types.SimpleNamespace(generate_id=lambda: "gen123")
        stub.init = lambda **kw: calls.append(kw)
        monkeypatch.setitem(sys.modules, "wandb", stub)

    def test_sync_tensorboard_mode(self, monkeypatch):
        from lowlight_image_enhancement_tpu.training.logging_utils import (
            init_wandb_logger,
        )

        calls = []
        self._stub(monkeypatch, calls)
        init_wandb_logger({"name": "exp1",
                           "logger": {"wandb": {"project": "proj"}}})
        assert len(calls) == 1
        kw = calls[0]
        assert kw["sync_tensorboard"] is True
        assert kw["project"] == "proj"
        assert kw["id"] == "gen123" and kw["resume"] == "never"

    def test_resume_id(self, monkeypatch):
        from lowlight_image_enhancement_tpu.training.logging_utils import (
            init_wandb_logger,
        )

        calls = []
        self._stub(monkeypatch, calls)
        init_wandb_logger({"name": "exp1", "logger": {"wandb": {
            "project": "proj", "resume_id": "abc"}}})
        assert calls[0]["id"] == "abc" and calls[0]["resume"] == "allow"

    def test_missing_wandb_is_nonfatal(self, monkeypatch):
        import builtins
        import sys

        from lowlight_image_enhancement_tpu.training.logging_utils import (
            init_wandb_logger,
        )

        monkeypatch.delitem(sys.modules, "wandb", raising=False)
        real_import = builtins.__import__

        def deny(name, *a, **k):
            if name == "wandb":
                raise ImportError("no wandb")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", deny)
        init_wandb_logger({"name": "x",
                           "logger": {"wandb": {"project": "p"}}})  # no raise
