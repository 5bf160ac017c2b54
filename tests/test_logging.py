"""ProgressLogger sink wiring: W&B / AzureML (library-gated, reference
progress_bar.py:387-481) and the meters API they consume."""

import sys
import types

import pytest

from s2st_tpu import logging_utils as lu


def test_meters_nested_aggregate():
    lu.reset_meters("train")
    with lu.aggregate("train"):
        lu.log_scalar("loss", 2.0, weight=2.0)
        with lu.aggregate("inner") as agg:
            lu.log_scalar("loss", 4.0, weight=1.0)
        lu.log_derived("twice", lambda m: m["loss"].avg * 2)
    vals = lu.get_smoothed_values("train")
    # (2*2 + 4*1) / 3
    assert abs(vals["loss"] - 8.0 / 3.0) < 1e-9
    assert abs(vals["twice"] - 16.0 / 3.0) < 1e-9
    assert abs(agg.get_smoothed_values()["loss"] - 4.0) < 1e-9


def test_wandb_sink_routes_scalars(monkeypatch):
    calls = []
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls.append(("init", kw))
    fake.log = lambda d, step=None: calls.append(("log", d, step))
    monkeypatch.setitem(sys.modules, "wandb", fake)

    p = lu.ProgressLogger(wandb_project="proj", wandb_run_name="run0")
    p.log({"loss": 1.5, "note": "text"}, tag="train_inner", step=7)
    p.print({"bleu": 30.0}, tag="valid", step=7)

    assert ("init", {"project": "proj", "reinit": False, "name": "run0"}) \
        in calls
    logs = [c for c in calls if c[0] == "log"]
    assert ("log", {"train_inner/loss": 1.5}, 7) in logs  # strings dropped
    assert ("log", {"valid/bleu": 30.0}, 7) in logs


def test_azureml_sink_routes_scalars(monkeypatch):
    rows = []

    class FakeRun:
        @staticmethod
        def get_context():
            return FakeRun()

        def log(self, name, value):
            rows.append((name, value))

    azureml = types.ModuleType("azureml")
    core = types.ModuleType("azureml.core")
    core.Run = FakeRun
    azureml.core = core
    monkeypatch.setitem(sys.modules, "azureml", azureml)
    monkeypatch.setitem(sys.modules, "azureml.core", core)

    p = lu.ProgressLogger(azureml_logging=True)
    p.log({"loss": 0.25}, tag="train_inner", step=3)
    assert rows == [("train_inner/loss", 0.25)]


def test_missing_sink_libs_warn_not_crash(caplog):
    # neither wandb nor azureml-core is installed in this image
    for mod in ("wandb", "azureml", "azureml.core"):
        sys.modules.pop(mod, None)
    p = lu.ProgressLogger(wandb_project="p", azureml_logging=True)
    assert p._wandb is None and p._azureml is None
    p.log({"loss": 1.0})  # sinks disabled; must not raise


def test_tqdm_format_wraps_and_postfixes():
    """--log-format tqdm (reference TqdmProgressBar,
    progress_bar.py:100-130): wrap() attaches a bar, log() drives
    set_postfix (no per-interval lines), print() closes the bar and
    writes one line."""
    p = lu.ProgressLogger(log_format="tqdm")
    wrapped = p.wrap(iter(range(5)), prefix="epoch 001")
    assert p._bar is wrapped
    out = list(wrapped)
    assert out == [0, 1, 2, 3, 4]
    p.log({"loss": 1.25, "num_updates": 3}, tag="train_inner", step=3)
    assert p._bar.postfix and "1.25" in p._bar.postfix
    p.print({"loss": 1.0}, tag="train", step=5)
    assert p._bar is None  # closed at epoch boundary


def test_tqdm_format_falls_back_without_tqdm(monkeypatch):
    import builtins
    real_import = builtins.__import__

    def block_tqdm(name, *a, **kw):
        if name == "tqdm":
            raise ImportError("blocked")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", block_tqdm)
    monkeypatch.delitem(sys.modules, "tqdm", raising=False)
    p = lu.ProgressLogger(log_format="tqdm")
    assert p.log_format == "simple"
    assert p.wrap(iter([1, 2])) is not None  # plain passthrough
