"""On-demand build of the native loader shared library.

g++ is part of the baked toolchain; the .so is compiled once into the package
directory and reused (mtime-checked against the source).
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "src", "peppa_loader.cpp")
LIB = os.path.join(_HERE, "libpeppa_loader.so")
_lock = threading.Lock()


def have_toolchain() -> bool:
    return shutil.which("g++") is not None


def build(force: bool = False) -> Optional[str]:
    """Compile (if needed) and return the .so path, or None if unavailable."""
    with _lock:
        if (not force and os.path.exists(LIB)
                and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
            return LIB
        if not have_toolchain():
            logging.warning("g++ not found; native loader unavailable")
            return None
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
               "-o", LIB, SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            logging.error("native loader build failed:\n%s", e.stderr)
            return None
        return LIB
