"""Native (C++) runtime components, bound via ctypes.

Built on first use with the system toolchain; every consumer falls back
to the pure-Python implementation when a compiler is unavailable.
"""

from __future__ import annotations

import os
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).resolve().parent


def build_extension(name: str) -> pathlib.Path | None:
    """Compile `<name>.cpp` into `<name>.so` (cached by source mtime)."""
    src = _DIR / f"{name}.cpp"
    out = _DIR / f"{name}.so"
    if not src.exists():
        return None
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O2", "-std=c++17", "-shared", "-fPIC",
        str(src), "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None
