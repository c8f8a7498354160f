"""Build the native wavecore shared library (g++, no external deps).

Invoked lazily on first import of wave_fenics_tpu.native; cached next to the
source. Falls back silently (callers use the NumPy paths) if no compiler.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "wavecore.cpp")
LIB = os.path.join(_DIR, "libwavecore.so")


def build(force: bool = False) -> str | None:
    """Compile wavecore.cpp -> libwavecore.so; returns the path or None."""
    if not force and os.path.exists(LIB) and (
        os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", SRC, "-o", LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return LIB
    except Exception:
        # retry without OpenMP (minimal toolchains)
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return LIB
        except Exception:
            return None


if __name__ == "__main__":
    path = build(force=True)
    print(path or "build failed")
