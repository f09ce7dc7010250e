"""data.main-style configuration parser.

TPU-native analog of the reference InputFile (reference:
src/utils/InputFile.h:1-48): files of ``option arg1 arg2 ...`` lines, with
``#`` comments, Required/Optional semantics, and the special ``shell`` escape
(lines starting with ``shell`` are executed through the system shell at parse
time — reference InputFile.h shell option). The generic_md driver (cli/
generic_md.py) consumes these, mirroring examples/generic_md's data.main.
"""

from __future__ import annotations

import shlex
import subprocess


class Required:
    pass


class InputFile:
    def __init__(self, path: str | None = None, text: str | None = None,
                 allow_shell: bool = False):
        self.options: dict[str, list[str]] = {}
        if path is not None:
            with open(path) as fh:
                text = fh.read()
        assert text is not None
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            parts = shlex.split(line)
            key, args = parts[0], parts[1:]
            if key == "shell":
                if allow_shell:
                    subprocess.run(" ".join(args), shell=True, check=True)
                continue
            self.options[key] = args

    def has(self, name: str) -> bool:
        return name in self.options

    def get(self, name: str, *types, default=Required):
        """get("boxSize", float, float, float) -> tuple; single type ->
        scalar; no types -> bool flag presence."""
        if name not in self.options:
            if default is Required:
                raise KeyError(f"required option '{name}' missing")
            return default
        args = self.options[name]
        if not types:
            return True
        vals = []
        for i, t in enumerate(types):
            if i < len(args):
                vals.append(t(args[i]))
            else:
                raise ValueError(f"option '{name}' expects >= {len(types)} args")
        return vals[0] if len(types) == 1 else tuple(vals)
