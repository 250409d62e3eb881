"""Lazy build of the native shared library with the system toolchain.

Compiles tilepack.cpp into _maxk_native.so next to this file on first
import. Staleness is keyed on a content hash of the source stored next to
the binary (mtimes are not preserved by git checkouts, and a stale binary
compiled with -march=native on another machine could SIGILL or silently
diverge). The binary is never committed (*.so is gitignored). Failures
are non-fatal: callers fall back to the numpy implementations.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "tilepack.cpp"
_LIB_PATH = _HERE / "_maxk_native.so"
_HASH_PATH = _HERE / "_maxk_native.hash"


def _src_hash() -> str:
    return hashlib.sha256(_SRC.read_bytes()).hexdigest()


def _needs_build() -> bool:
    if not _LIB_PATH.exists() or not _HASH_PATH.exists():
        return True
    try:
        return _HASH_PATH.read_text().strip() != _src_hash()
    except OSError:
        return True


def _compile() -> bool:
    cxx = os.environ.get("CXX", "g++")
    # Build into a temp file then atomically rename, so concurrent imports
    # (e.g. pytest-xdist workers) never load a half-written library.
    with tempfile.NamedTemporaryFile(
            suffix=".so", dir=_HERE, delete=False) as tmp:
        tmp_path = Path(tmp.name)
    cmd = [cxx, "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(tmp_path)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        tmp_path.replace(_LIB_PATH)
        _HASH_PATH.write_text(_src_hash() + "\n")
        return True
    except (subprocess.SubprocessError, OSError) as e:
        tmp_path.unlink(missing_ok=True)
        print(f"maxk_tpu.native: build failed ({e}); "
              f"falling back to numpy tile packer", file=sys.stderr)
        return False


def load_library():
    """Compile if needed and dlopen; None when unavailable."""
    if _needs_build() and not _compile():
        return None
    try:
        return ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        print(f"maxk_tpu.native: load failed ({e})", file=sys.stderr)
        return None
