"""Plugin registries (parity: fairseq/registry.py + @register_task/
@register_model/@register_criterion and --user-dir dynamic import,
fairseq/utils.py:462-507).

Tasks, architectures and criteria register themselves by name; recipes keep
working with ``--task s2s_translation --arch s2st_transformer --criterion
s2st_loss``. ``import_user_module`` loads an external package so third-party
extensions can plug in exactly like the reference's user-dir."""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys
from typing import Any, Callable, Dict

TASK_REGISTRY: Dict[str, Any] = {}
ARCH_REGISTRY: Dict[str, Callable] = {}
CRITERION_REGISTRY: Dict[str, Any] = {}


def register_task(name: str):
    def wrap(cls):
        if name in TASK_REGISTRY:
            raise ValueError(f"duplicate task {name}")
        TASK_REGISTRY[name] = cls
        cls.task_name = name
        return cls
    return wrap


def register_arch(name: str):
    """fn(args) mutates argparse defaults (ARCH_CONFIG_REGISTRY parity)."""
    def wrap(fn):
        ARCH_REGISTRY[name] = fn
        return fn
    return wrap


def register_criterion(name: str):
    def wrap(obj):
        CRITERION_REGISTRY[name] = obj
        return obj
    return wrap


def get_task(name: str):
    if name not in TASK_REGISTRY:
        raise KeyError(f"unknown task {name}; available: {list(TASK_REGISTRY)}")
    return TASK_REGISTRY[name]


def import_user_module(module_path: str):
    """Import an external plugin package by filesystem path."""
    module_path = os.path.abspath(module_path)
    module_name = os.path.basename(module_path)
    if module_name in sys.modules:
        return sys.modules[module_name]
    parent, name = os.path.split(module_path)
    sys.path.insert(0, parent)
    try:
        return importlib.import_module(name)
    finally:
        sys.path.pop(0)


def populate_builtin():
    """Import built-in tasks/criteria so their registrations run."""
    import s2st_tpu.tasks.s2s_translation  # noqa: F401
    import s2st_tpu.tasks.audio_pretraining  # noqa: F401
    import s2st_tpu.tasks.hubert_pretraining  # noqa: F401
    import s2st_tpu.tasks.audio_finetuning  # noqa: F401
    import s2st_tpu.tasks.speech_to_text  # noqa: F401
    import s2st_tpu.tasks.translation  # noqa: F401
    import s2st_tpu.tasks.language_modeling  # noqa: F401
    import s2st_tpu.tasks.translation_lev  # noqa: F401
    import s2st_tpu.tasks.translation_multi_epoch  # noqa: F401
    import s2st_tpu.tasks.multilingual_translation  # noqa: F401
    import s2st_tpu.tasks.semisupervised_translation  # noqa: F401
    import s2st_tpu.tasks.online_backtranslation  # noqa: F401
    import s2st_tpu.tasks.masked_lm  # noqa: F401
    import s2st_tpu.tasks.cross_lingual_lm  # noqa: F401
    import s2st_tpu.tasks.legacy_masked_lm  # noqa: F401
    import s2st_tpu.tasks.translation_from_pretrained  # noqa: F401
    import s2st_tpu.tasks.sentence_prediction  # noqa: F401
    import s2st_tpu.tasks.sentence_ranking  # noqa: F401
    import s2st_tpu.tasks.denoising  # noqa: F401
    import s2st_tpu.tasks.multilingual_pretraining  # noqa: F401
    import s2st_tpu.benchmark.dummy_s2st  # noqa: F401
    import s2st_tpu.benchmark.dummy_text  # noqa: F401
