"""On-demand build of the native shared libraries.

g++ is part of the baked toolchain; each .so is compiled once into the
package directory and reused (mtime-checked against its source).
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
# name -> (source file, output .so)
TARGETS = {
    "loader": (os.path.join(_HERE, "src", "peppa_loader.cpp"),
               os.path.join(_HERE, "libpeppa_loader.so")),
    "ctc_align": (os.path.join(_HERE, "src", "ctc_align.cpp"),
                  os.path.join(_HERE, "libpeppa_ctc_align.so")),
}
SRC, LIB = TARGETS["loader"]  # back-compat aliases
_lock = threading.Lock()


def have_toolchain() -> bool:
    return shutil.which("g++") is not None


def build(force: bool = False, target: str = "loader") -> Optional[str]:
    """Compile (if needed) and return the .so path, or None if unavailable."""
    src, lib = TARGETS[target]
    with _lock:
        if (not force and os.path.exists(lib)
                and os.path.getmtime(lib) >= os.path.getmtime(src)):
            return lib
        if not have_toolchain():
            logging.warning("g++ not found; native %s unavailable", target)
            return None
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
               "-o", lib, src]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            logging.error("native %s build failed:\n%s", target, e.stderr)
            return None
        return lib
