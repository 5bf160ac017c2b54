"""Minimal omegaconf stub — just enough surface to import the reference
fairseq fork (/root/reference) for numerics-parity testing.

The parity tests build reference models through fairseq's *legacy*
argparse.Namespace path (``Model.build_model(args, task)``), so the stub
only needs to satisfy import-time usage (``II``/``MISSING`` as dataclass
field defaults, ``DictConfig`` for isinstance checks, ``ConfigStore``
registration no-ops) plus a handful of trivially-implementable helpers.

This is test infrastructure, not product code: it lives under
tests/ref_stubs and is inserted on sys.path only by the parity tests.
"""

import copy
from contextlib import contextmanager

MISSING = "???"


def II(path):
    """Interpolation marker. Real omegaconf resolves '${path}' lazily; the
    legacy args path never resolves these, so the marker string suffices."""
    return "${" + path + "}"


def SI(s):
    return s


class DictConfig(dict):
    """dict subclass so `isinstance(x, DictConfig)` behaves, with
    attribute-style access like the real thing."""

    def __init__(self, content=None, parent=None, **kw):
        super().__init__()
        if content:
            for k, v in dict(content).items():
                self[k] = _wrap(v)
        self.__dict__["_parent"] = parent

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = _wrap(v)

    def __delattr__(self, k):
        try:
            del self[k]
        except KeyError:
            raise AttributeError(k)

    def __deepcopy__(self, memo):
        out = DictConfig({})
        for k, v in self.items():
            out[k] = copy.deepcopy(v, memo)
        return out


class ListConfig(list):
    pass


def _wrap(v):
    if isinstance(v, DictConfig):
        return v
    if isinstance(v, dict):
        return DictConfig(v)
    return v


class _OmegaConfNS:
    @staticmethod
    def create(obj=None):
        if obj is None:
            return DictConfig({})
        if isinstance(obj, dict):
            return DictConfig(obj)
        if isinstance(obj, list):
            return ListConfig(obj)
        # dataclass instance
        if hasattr(obj, "__dataclass_fields__"):
            return DictConfig(
                {k: getattr(obj, k) for k in obj.__dataclass_fields__}
            )
        return obj

    @staticmethod
    def to_container(cfg, resolve=False, enum_to_str=False):
        def conv(v):
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        return conv(cfg)

    @staticmethod
    def is_config(obj):
        return isinstance(obj, (DictConfig, ListConfig))

    @staticmethod
    def set_struct(cfg, flag):
        pass

    @staticmethod
    def merge(*cfgs):
        out = DictConfig({})
        for c in cfgs:
            c = _OmegaConfNS.create(c) if not isinstance(c, dict) else c
            for k, v in dict(c).items():
                out[k] = v
        return out

    @staticmethod
    def to_yaml(cfg):
        import json

        return json.dumps(_OmegaConfNS.to_container(cfg), indent=2, default=str)


OmegaConf = _OmegaConfNS


@contextmanager
def open_dict(cfg):
    yield cfg


@contextmanager
def read_write(cfg):
    yield cfg
