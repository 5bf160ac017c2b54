"""Config-file-driven training entry — the reference's second config system.

fairseq ships TWO ways to launch training: flat argparse
(``fairseq_cli/train.py``) and a hydra/omegaconf typed config tree
(``fairseq_cli/hydra_train.py:26`` over the ConfigStore groups of
``fairseq/dataclass/configs.py:1030`` — common / task / model / criterion /
optimization / dataset / checkpoint / distributed_training / ema, with
registry entries selected by a ``_name`` key and CLI dotted overrides).

This is the TPU-native equivalent. Instead of a second, parallel config
implementation (the reference's two systems drift — see the
``convert_namespace_to_omegaconf`` bridging layer), the YAML tree COMPILES
ONTO the same two-pass argparse pipeline ``cli.train`` uses: every YAML key
is resolved against the training parser, turned into an explicit flag (so it
wins over ``@register_arch`` defaults, exactly like hydra config values win
over dataclass defaults), and the result is handed to ``cli.train.main``.
One config system backs both entries; drift is impossible by construction.

Usage::

    python -m s2st_tpu.cli.hydra_train --config run.yaml [overrides...]

YAML grammar (groups mirror the reference's ConfigStore groups; flat keys
are also accepted)::

    task:
      _name: s2s_translation          # registry selector, like hydra
      data: /path/to/manifests
      config_yaml: config.yaml
    model:
      _name: s2st_transformer         # -> --arch
      encoder_layers: 12
    optimization:
      max_update: 400000
      lr: 1e-3

Overrides use hydra's dotted syntax (``optimization.max_update=100``,
``model._name=s2st_transformer``) or plain flags (``--max-update 100``);
both take precedence over the YAML.

``--dump-config out.yaml`` writes the fully-resolved grouped config for any
flag combination (round-trippable: flags -> yaml -> identical namespace).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Dict, List, Optional, Tuple

import yaml

# ConfigStore registry groups whose `_name` key selects a registry entry
# (fairseq/dataclass/configs.py: task/model/criterion/optimizer/lr_scheduler
# + registry.py ConfigStore registration per entry). Maps group -> the flat
# argparse dest the selector compiles to.
_NAME_DESTS = {
    "task": "task",
    "model": "arch",
    "criterion": "criterion",
    "optimizer": "optimizer",
    "lr_scheduler": "lr_scheduler",
    "bpe": "bpe",
    "tokenizer": "tokenizer",
}

# argparse group title -> yaml section (reference ConfigStore group names)
_GROUP_SECTIONS = {
    "common": "common",
    "task": "task",
    "model": "model",
    "wav2vec2/hubert model": "model",
    "criterion": "criterion",
    "optimization": "optimization",
    "checkpoint": "checkpoint",
    "distributed": "distributed_training",
    "ema/diagnostics": "ema",
    "generation": "generation",
}


def _parser_index(parser: argparse.ArgumentParser):
    """dest -> (action, yaml_section); includes positionals."""
    index: Dict[str, Tuple[argparse.Action, str]] = {}
    for group in parser._action_groups:
        section = _GROUP_SECTIONS.get(group.title, "common")
        for action in group._group_actions:
            if action.dest in ("help",):
                continue
            # `data` is a positional on the parser but lives under task.*
            # in the reference's config tree (TaskConfig.data)
            sec = "task" if action.dest == "data" else section
            index[action.dest] = (action, sec)
    return index


def flatten_config(tree: Dict) -> Dict[str, object]:
    """Grouped (or flat) YAML -> flat {dest: value}. ``_name`` keys map via
    _NAME_DESTS; unknown groups raise later at argv-build time."""
    flat: Dict[str, object] = {}
    for key, val in (tree or {}).items():
        if isinstance(val, dict) and not key.endswith("_args"):
            for k, v in val.items():
                if k == "_name":
                    dest = _NAME_DESTS.get(key)
                    if dest is None:
                        raise KeyError(
                            f"group '{key}' has no _name registry selector")
                    flat[dest] = v
                else:
                    flat[k.replace("-", "_")] = v
        else:
            flat[key.replace("-", "_")] = val
    return flat


def _fmt(value, action: argparse.Action) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, list) and action.nargs is None:
        # hydra's typed lists (e.g. OptimizationConfig.lr: List[float],
        # update_freq) compile to the argparse comma-string convention
        # (fairseq utils.eval_str_list consumes either form)
        return ",".join(str(v) for v in value)
    if isinstance(value, dict) and action.nargs is None:
        return json.dumps(value)
    return str(value)


def config_to_argv(flat: Dict[str, object],
                   parser: argparse.ArgumentParser) -> List[str]:
    """Compile {dest: value} onto the parser's flag surface. Every emitted
    flag counts as EXPLICIT for the two-pass arch-default logic
    (options._two_pass), i.e. YAML values win over @register_arch defaults —
    hydra's config-beats-dataclass-default precedence."""
    index = _parser_index(parser)
    positionals: Dict[str, str] = {}
    argv: List[str] = []
    for dest, value in flat.items():
        if dest not in index:
            raise KeyError(
                f"unknown config key '{dest}' (no such training flag); "
                f"closest: {[d for d in index if dest[:4] in d][:8]}")
        action, _ = index[dest]
        if not action.option_strings:               # positional (data)
            positionals[dest] = str(value)
            continue
        flag = action.option_strings[0]
        if isinstance(action, argparse._StoreTrueAction):
            if value:
                argv.append(flag)
            # falsy: omitting keeps the False default; an arch fn may still
            # flip it — same limitation as the reference's argparse path
            continue
        if isinstance(action, argparse._StoreFalseAction):
            if not value:
                argv.append(flag)
            continue
        if value is None:
            continue                                 # keep parser default
        if action.nargs in ("*", "+") or isinstance(action.nargs, int):
            argv.append(flag)
            argv.extend(_fmt(v, action) for v in value)
        elif action.nargs == "?":
            argv.append(f"{flag}={_fmt(value, action)}")
        else:
            argv.extend([flag, _fmt(value, action)])
    # positionals go first (argparse intermixed parsing handles it anyway,
    # but keep the canonical `data` first like the recipes)
    return list(positionals.values()) + argv


def dump_config(args: argparse.Namespace,
                parser: Optional[argparse.ArgumentParser] = None) -> Dict:
    """Parsed namespace -> grouped YAML-able dict (round-trippable)."""
    from ..options import get_training_parser
    parser = parser or get_training_parser()
    index = _parser_index(parser)
    inv_name = {v: k for k, v in _NAME_DESTS.items()}
    tree: Dict[str, Dict] = {}
    for dest, value in sorted(vars(args).items()):
        if dest not in index:
            continue  # arch-fn-only attributes have no flag; the _name
            # selector regenerates them on re-parse
        _, section = index[dest]
        group = inv_name.get(dest, None)
        if group is not None:
            tree.setdefault(group, {})["_name"] = value
        else:
            tree.setdefault(section, {})[dest] = value
    return tree


def parse_overrides(tokens: List[str],
                    parser: argparse.ArgumentParser) -> Dict[str, object]:
    """hydra-style ``group.key=value`` / ``key=value`` and plain
    ``--flag [value]`` tokens -> flat {dest: value}."""
    flat: Dict[str, object] = {}
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if tok.startswith("--"):
            body = tok[2:]
            if "=" in body:
                key, val = body.split("=", 1)
                flat[key.replace("-", "_")] = yaml.safe_load(val)
            else:
                key = body.replace("-", "_")
                # flag followed by a value token, or a bare store_true flag
                if i + 1 < len(tokens) and not tokens[i + 1].startswith("--") \
                        and "=" not in tokens[i + 1]:
                    flat[key] = yaml.safe_load(tokens[i + 1])
                    i += 1
                else:
                    flat[key] = True
        elif "=" in tok:
            key, val = tok.split("=", 1)
            parts = key.split(".")
            if parts[-1] == "_name":
                group = ".".join(parts[:-1])
                dest = _NAME_DESTS.get(group)
                if dest is None:
                    raise KeyError(f"unknown _name group '{group}'")
                flat[dest] = yaml.safe_load(val)
            else:
                flat[parts[-1].replace("-", "_")] = yaml.safe_load(val)
        else:
            raise ValueError(f"cannot parse override '{tok}' "
                             "(expected key=value or --flag)")
        i += 1
    return flat


def build_args(config_path: Optional[str], overrides: List[str]):
    """YAML + overrides -> the same Namespace cli.train's argparse yields."""
    from ..options import get_training_parser, parse_training_args
    parser = get_training_parser()
    flat: Dict[str, object] = {}
    if config_path:
        with open(config_path) as f:
            flat.update(flatten_config(yaml.safe_load(f)))
    flat.update(parse_overrides(overrides, parser))
    argv = config_to_argv(flat, parser)
    return parse_training_args(argv), argv


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    pre = argparse.ArgumentParser("s2st_tpu-hydra-train", add_help=False)
    pre.add_argument("--config", default=None,
                     help="YAML run config (grouped or flat keys)")
    pre.add_argument("--dump-config", default=None, metavar="OUT_YAML",
                     help="write the resolved grouped config and exit")
    ns, overrides = pre.parse_known_args(argv)
    if ns.config is None and not overrides:
        pre.error("--config or overrides required")
    args, _ = build_args(ns.config, overrides)
    if ns.dump_config:
        with open(ns.dump_config, "w") as f:
            yaml.safe_dump(dump_config(args), f, sort_keys=True)
        print(f"wrote {ns.dump_config}")
        return 0
    from .train import main as train_main
    return train_main(parsed_args=args)


if __name__ == "__main__":
    sys.exit(main())
