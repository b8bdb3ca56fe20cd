"""Minimal configargparse stand-in for running the reference encoder in
this zero-egress environment (oracle runs only; see README.md).

Supports exactly what /root/reference/cc_encode.py uses: ArgumentParser
with .add()/.add_argument(), is_config_file=True options whose value is a
'key = value' file (';' comments) merged at defaults<cfg<CLI priority,
and parser.format_values() for param.txt provenance.
"""

from __future__ import annotations

import argparse
import sys


def _parse_cfg(path: str) -> dict[str, str]:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.split(";", 1)[0].split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            k, v = line.split("=", 1)
            out[k.strip()] = v.strip()
    return out


class ArgumentParser(argparse.ArgumentParser):
    def __init__(self, *a, **kw):
        kw.pop("default_config_files", None)
        super().__init__(*a, **kw)
        self._cfg_opts: list[str] = []
        self._values_src: dict[str, str] = {}

    def add(self, *a, **kw):
        return self.add_argument(*a, **kw)

    def add_argument(self, *a, **kw):
        if kw.pop("is_config_file", False):
            self._cfg_opts.append(a[0].lstrip("-").replace("-", "_"))
        return super().add_argument(*a, **kw)

    def parse_args(self, args=None, namespace=None):
        args = list(sys.argv[1:] if args is None else args)
        ns = super().parse_args(args, namespace)
        # explicit CLI keys (they out-rank cfg values)
        explicit = set()
        for tok in args:
            if tok.startswith("--"):
                explicit.add(tok[2:].split("=", 1)[0].replace("-", "_"))
        for opt in self._cfg_opts:
            path = getattr(ns, opt, None)
            if not path:
                continue
            for k, v in _parse_cfg(path).items():
                if k in explicit or not hasattr(ns, k):
                    continue
                action = next((ac for ac in self._actions if ac.dest == k), None)
                if action is None:
                    continue
                if isinstance(action, argparse._StoreTrueAction):
                    val = v.lower() in ("1", "true", "yes")
                elif action.type is not None:
                    val = action.type(v)
                else:
                    val = v
                setattr(ns, k, val)
                self._values_src[k] = path
        return ns

    def format_values(self) -> str:
        lines = ["(configargparse shim) value sources:"]
        for k, src in self._values_src.items():
            lines.append(f"  {k}: {src}")
        return "\n".join(lines) + "\n"
