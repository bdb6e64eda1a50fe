"""Directory scanning and list/set file loaders.

Equivalents of the reference's path_utils.h free functions
(ref: path_utils.h:17-100).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterable


def populate_path_list(dirs: Iterable[str | Path]) -> list[Path]:
    """Collect the regular files from each directory, sorted within each
    directory (ref: path_utils.h:17-43 collects directory entries; entry
    order there is fs-dependent, sorted order is our canonical spec)."""
    out: list[Path] = []
    for d in dirs:
        d = Path(d)
        if d.is_file():
            out.append(d)
            continue
        if not d.is_dir():
            continue
        out.extend(sorted(p for p in d.iterdir() if p.is_file()))
    return out


def load_strings(files: Iterable[str | Path]) -> list[str]:
    """Concatenate the (stripped, non-empty) lines of each file
    (ref: path_utils.h:45-64)."""
    out: list[str] = []
    for f in files:
        with open(f, "r", encoding="latin-1") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line:
                    out.append(line)
    return out


def load_set_from_file(path: str | Path | None) -> set[str]:
    """Load a newline-delimited set; missing/empty path -> empty set
    (ref: path_utils.h:66-84)."""
    if not path:
        return set()
    p = Path(path)
    if not p.is_file():
        return set()
    return set(load_strings([p]))


def ensure_directory(path: str | Path | None) -> None:
    """mkdir -p semantics (ref: path_utils.h:86-100)."""
    if path:
        os.makedirs(path, exist_ok=True)
